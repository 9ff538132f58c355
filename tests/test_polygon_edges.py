"""Edge-case polygons (FIXTURES.md §2): anti-meridian wraparound SPLIT,
holes, degenerate slivers, boundary points — through the full spatial-join
operator, checked against a scalar rings-aware reference."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sis_spark.functions import geometry as geo
from sis_spark.operators.spatial_join import normalize_polygons, spatial_join


def _ref_inside(px, py, rings):
    return geo.points_in_polygon_with_holes(px, py, rings)


def test_normalize_split_wraparound():
    # square written in continuous lons 175..185 (crosses the anti-meridian)
    p = {"key": 1, "vx": np.array([175.0, 185.0, 185.0, 175.0]),
         "vy": np.array([-5.0, -5.0, 5.0, 5.0])}
    parts = normalize_polygons([p])
    assert len(parts) == 2
    assert parts[0]["xmax"] <= 180.0 and parts[1]["xmin"] >= -180.0
    assert {q["key"] for q in parts} == {1}
    # areas add up to the original 10x10 square
    from sis_spark.functions.sqlmm import shoelace_area

    total = sum(shoelace_area(*q["rings"][0]) for q in parts)
    assert abs(total - 100.0) < 1e-9


def test_spatial_join_wraparound_hole_sliver(spark):
    wrap = {"key": 1, "vx": np.array([175.0, 185.0, 185.0, 175.0]),
            "vy": np.array([-5.0, -5.0, 5.0, 5.0])}
    holed = {
        "key": 2,
        "vx": np.array([0.0, 10.0, 10.0, 0.0]), "vy": np.array([0.0, 0.0, 10.0, 10.0]),
        "holes": [(np.array([4.0, 6.0, 6.0, 4.0]), np.array([4.0, 4.0, 6.0, 6.0]))],
    }
    sliver = {"key": 3, "vx": np.array([20.0, 21.0, 22.0]),
              "vy": np.array([20.0, 20.0, 20.0])}  # zero-area degenerate
    pts = pd.DataFrame({
        "pid": range(8),
        "lon": [179.0, -179.0, 170.0, 5.0, 5.0, 4.5, 21.0, 0.0],
        "lat": [0.0, 0.0, 0.0, 2.0, 5.0, 5.0, 20.0, -50.0],
    })
    # expected: 179 and -179 in wrap; (5,2) in holed; (5,5) and (4.5,5)
    # inside the hole -> excluded; sliver (zero area) catches nothing
    pdf = spark.createDataFrame(pts)
    got = (
        spatial_join(pdf, [wrap, holed, sliver], "lon", "lat")
        .select("pid", "poly_key").toPandas()
        .sort_values(["pid", "poly_key"]).reset_index(drop=True)
    )
    exp = pd.DataFrame({"pid": [0, 1, 3], "poly_key": [1, 1, 2]})
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_rings_kernel_matches_scalar_reference():
    rng = np.random.default_rng(33)
    outer = (np.array([0.0, 10.0, 10.0, 0.0]), np.array([0.0, 0.0, 10.0, 10.0]))
    hole1 = (np.array([2.0, 4.0, 4.0, 2.0]), np.array([2.0, 2.0, 4.0, 4.0]))
    hole2 = (np.array([6.0, 8.0, 7.0]), np.array([6.0, 6.0, 8.0]))
    tri = (np.array([20.0, 25.0, 20.0]), np.array([0.0, 0.0, 5.0]))
    parts = [
        {"key": 0, "rings": [outer, hole1, hole2]},
        {"key": 1, "rings": [tri]},
    ]
    rings_vx = [r[0] for p in parts for r in p["rings"]]
    rings_vy = [r[1] for p in parts for r in p["rings"]]
    RVX, RVY = geo.pad_polygons(rings_vx, rings_vy)
    ring_start = np.array([0, 3, 4])
    px = rng.uniform(-1, 26, 3000)
    py = rng.uniform(-1, 11, 3000)
    gi = rng.integers(0, 2, 3000)
    got = geo.points_in_padded_rings(px, py, gi, RVX, RVY, ring_start)
    for g, p in enumerate(parts):
        sel = gi == g
        exp = _ref_inside(px[sel], py[sel], p["rings"])
        assert np.array_equal(got[sel], exp), f"part {g}"


def test_clip_polygon_x():
    vx = np.array([0.0, 10.0, 10.0, 0.0])
    vy = np.array([0.0, 0.0, 10.0, 10.0])
    cx, cy = geo.clip_polygon_x(vx, vy, 5.0, keep_leq=True)
    from sis_spark.functions.sqlmm import shoelace_area

    assert abs(shoelace_area(cx, cy) - 50.0) < 1e-12
    assert cx.max() == 5.0
    # clip entirely away
    cx, cy = geo.clip_polygon_x(vx, vy, -1.0, keep_leq=True)
    assert len(cx) == 0
