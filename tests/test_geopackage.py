"""GeoPackage store: GPB codec, catalog, partitioned read, pushdown."""

import sqlite3

import numpy as np
import pandas as pd

from sis_spark.functions import geometry as geo
from sis_spark.sources.geopackage import (
    create_geopackage, geopackage_table, gpb_to_wkb, list_feature_tables,
    wkb_to_gpb,
)


def test_gpb_codec():
    wkb = geo.wkb_point(3.5, -2.25)
    blob = wkb_to_gpb(wkb, srs_id=4326, envelope=(3.5, 3.5, -2.25, -2.25))
    assert blob[:2] == b"GP" and gpb_to_wkb(blob) == wkb
    assert gpb_to_wkb(wkb_to_gpb(wkb)) == wkb  # no envelope
    assert gpb_to_wkb(None) is None


def _make(tmp_path, n=40):
    path = str(tmp_path / "t.gpkg")
    pdf = pd.DataFrame({
        "geom": [geo.wkb_point(i * 0.5, i * 0.25) for i in range(n)],
        "name": [f"p{i}" for i in range(n)],
        "value": np.arange(n) * 3,
        "score": np.arange(n) * 0.25,
    })
    create_geopackage(path, "pts", pdf, geom_type="POINT")
    return path


def test_catalog_and_read(spark, tmp_path):
    path = _make(tmp_path)
    tabs = list_feature_tables(path)
    assert tabs == [{"table": "pts", "geom_col": "geom",
                     "geom_type": "POINT", "srs_id": 4326}]
    df = geopackage_table(spark, path, "pts")
    rows = sorted(df.collect(), key=lambda r: r["fid"])
    assert len(rows) == 40
    assert geo.wkb_parse(bytes(rows[4]["geom"])) == ("point", (2.0, 1.0))
    assert rows[4]["name"] == "p4" and rows[4]["value"] == 12
    assert rows[4]["score"] == 1.0


def test_pushdown(spark, tmp_path):
    path = _make(tmp_path)
    df = geopackage_table(spark, path, "pts", predicate="value % 2 = 0 AND value >= 30")
    vals = sorted(r["value"] for r in df.collect())
    assert vals == [v for v in range(0, 120, 3) if v % 2 == 0 and v >= 30]


def test_sqlite_is_standard(tmp_path):
    # the container is plain SQLite: an independent connection sees the
    # catalog rows the spec requires
    path = _make(tmp_path)
    con = sqlite3.connect(path)
    assert con.execute("SELECT data_type FROM gpkg_contents").fetchone()[0] == "features"
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns").fetchone()[0] == "POINT"
    blob = con.execute("SELECT geom FROM pts WHERE fid = 1").fetchone()[0]
    assert bytes(blob[:2]) == b"GP"
