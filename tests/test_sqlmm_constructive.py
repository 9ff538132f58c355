"""ST_ConvexHull / ST_Boundary / ST_PointOnSurface / ST_IsSimple kernels and
UDFs (unary constructive group of SQLMM.java:111-121,467,87)."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark import synth
from sis_spark.functions import geometry as geo
from sis_spark.functions.sqlmm import convex_hull, is_simple_ring, shoelace_area


def test_convex_hull_known_square():
    vx = np.array([0.0, 2, 2, 0, 1])   # interior point (1,1) must drop
    vy = np.array([0.0, 0, 2, 2, 1])
    hx, hy = convex_hull(vx, vy)
    assert len(hx) == 4
    assert shoelace_area(hx, hy) == pytest.approx(4.0)


@pytest.mark.parametrize("seed", [1, 5, 13, 99])
def test_convex_hull_contains_all_points(seed):
    vx, vy = synth.polygon_vertices_np(seed)
    hx, hy = convex_hull(vx, vy)
    assert shoelace_area(hx, hy) >= shoelace_area(vx, vy) - 1e-12
    # every original vertex inside or on the hull: tiny inward shrink test
    cx, cy = vx.mean(), vy.mean()
    sx = cx + (vx - cx) * (1 - 1e-9)
    sy = cy + (vy - cy) * (1 - 1e-9)
    assert geo.points_in_polygon(sx, sy, hx, hy).all()


def test_is_simple():
    sq = (np.array([0.0, 1, 1, 0]), np.array([0.0, 0, 1, 1]))
    bow = (np.array([0.0, 1, 1, 0]), np.array([0.0, 1, 0, 1]))  # bowtie
    assert is_simple_ring(*sq)
    assert not is_simple_ring(*bow)
    for seed in (2, 3, 7):
        vx, vy = synth.polygon_vertices_np(seed)  # star polygons are simple
        assert is_simple_ring(vx, vy)


def test_wkb_linestring_roundtrip():
    vx = np.array([0.0, 1.5, 3.25])
    vy = np.array([-1.0, 2.5, 0.125])
    typ, (ox, oy) = geo.wkb_parse(geo.wkb_linestring(vx, vy))
    assert typ == "linestring"
    assert np.array_equal(ox, vx) and np.array_equal(oy, vy)
    typ, lines = geo.wkb_parse(geo.wkb_multilinestring([(vx, vy), (vy, vx)]))
    assert typ == "multilinestring" and len(lines) == 2
    assert np.array_equal(lines[1][0], vy)


def test_relate_point_polygon_patterns():
    from sis_spark.functions.sqlmm import (
        RELATE_POINT_IN_POLYGON,
        RELATE_POINT_ON_BOUNDARY,
        RELATE_POINT_OUTSIDE,
        relate_point_polygon,
    )

    vx = np.array([0.0, 4, 4, 0])
    vy = np.array([0.0, 0, 4, 4])
    px = np.array([2.0, 2.0, 0.0, 9.0, 4.0])
    py = np.array([2.0, 0.0, 0.0, 9.0, 2.0])
    got = relate_point_polygon(px, py, vx, vy)
    assert got == [
        RELATE_POINT_IN_POLYGON,      # interior
        RELATE_POINT_ON_BOUNDARY,     # edge midpoint
        RELATE_POINT_ON_BOUNDARY,     # vertex
        RELATE_POINT_OUTSIDE,         # outside
        RELATE_POINT_ON_BOUNDARY,     # right edge
    ]


def test_udfs_on_supplier_polygons(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from sis_spark.functions.sqlmm import (
        st_boundary_udf,
        st_convexhull_udf,
        st_issimple_udf,
        st_pointonsurface_udf,
    )
    from sis_spark.queries import _supplier_polygons

    polys = _supplier_polygons(spark, sf_dir)[:40]  # sf0.001 has 10 suppliers
    n_polys = len(polys)
    pdf = pd.DataFrame({
        "poly_key": [p["key"] for p in polys],
        "wkb": [geo.wkb_polygon([(p["vx"], p["vy"])]) for p in polys],
    })
    df = spark.createDataFrame(pdf, schema="poly_key long, wkb binary")
    pos = st_pointonsurface_udf()(F.col("wkb"))
    rows = df.select(
        "poly_key", "wkb",
        st_convexhull_udf()(F.col("wkb")).alias("hull"),
        st_boundary_udf()(F.col("wkb")).alias("bnd"),
        pos.alias("pos"),
        st_issimple_udf()(F.col("wkb")).alias("simple"),
    ).collect()
    assert len(rows) == n_polys
    for r in rows:
        assert r["simple"] is True
        typ, hull = geo.wkb_parse(bytes(r["hull"]))
        assert typ == "polygon"
        typ, lines = geo.wkb_parse(bytes(r["bnd"]))
        assert typ == "multilinestring" and len(lines) == 1
        # point-on-surface is INSIDE the original ring
        typ, rings = geo.wkb_parse(bytes(r["wkb"]))
        vx, vy = rings[0]
        assert geo.points_in_polygon(
            np.array([r["pos"]["x"]]), np.array([r["pos"]["y"]]), vx, vy
        )[0]
