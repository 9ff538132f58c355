"""WKB polygon-table adapter: the spatial join must produce identical rows
whether polygons come from synth dicts or from a WKB column."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sis_spark import synth
from sis_spark.functions import geometry as geo
from sis_spark.sources import polygons_from_wkb


def test_adapter_shapes_and_holes():
    vx, vy = synth.polygon_vertices_np(3)
    hole = (vx.mean() + 0.01 * np.array([-1.0, 1, 0]), vy.mean() + 0.01 * np.array([-1.0, 0, 1]))
    wkb = geo.wkb_polygon([(vx, vy), hole])
    out = polygons_from_wkb([(3, wkb)])
    assert len(out) == 1
    p = out[0]
    assert p["key"] == 3 and len(p["holes"]) == 1
    assert np.allclose(p["vx"], vx) and np.allclose(p["vy"], vy)

    # multipolygon -> one part per member, same key
    mp = b"\x01" + (6).to_bytes(4, "little") + (2).to_bytes(4, "little") + wkb + wkb
    out = polygons_from_wkb([(9, mp)])
    assert len(out) == 2 and all(q["key"] == 9 for q in out)


def test_join_equivalence_via_wkb(spark, sf_dir):
    from sis_spark.operators.spatial_join import spatial_join
    from sis_spark.queries import _events_points, _supplier_polygons

    pts = _events_points(spark, sf_dir)
    direct = _supplier_polygons(spark, sf_dir)
    wkb_rows = [(p["key"], geo.wkb_polygon([(p["vx"], p["vy"])])) for p in direct]
    wkb_df = spark.createDataFrame(
        pd.DataFrame(wkb_rows, columns=["key", "wkb"]), schema="key long, wkb binary"
    )
    via_wkb = polygons_from_wkb(wkb_df)

    a = sorted(
        (r["event_id"], r["poly_key"])
        for r in spatial_join(pts, direct, "lon", "lat").select("event_id", "poly_key").collect()
    )
    b = sorted(
        (r["event_id"], r["poly_key"])
        for r in spatial_join(pts, via_wkb, "lon", "lat").select("event_id", "poly_key").collect()
    )
    assert a == b and len(a) > 0
