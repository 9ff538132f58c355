"""SQLMM kernel tests (numpy level; the UDF wrappers are exercised by the
gate queries st_measures / st_accessors / st_contains)."""

import numpy as np
import pytest

from sis_spark import synth
from sis_spark.functions import geometry as geo
from sis_spark.functions import sqlmm


def test_wkt_point_roundtrip():
    for x, y in [(1.5, -2.25), (-180.0, 90.0), (0.1234567890123456, 1e-9)]:
        s = sqlmm.wkt_format_point(x, y)
        assert sqlmm.wkt_parse_point(s) == (x, y)
    assert sqlmm.wkt_parse_point("POINT(3 4)") == (3.0, 4.0)


def test_wkt_polygon_roundtrip():
    vx, vy = synth.polygon_vertices_np(23)
    s = sqlmm.wkt_format_polygon(vx, vy)
    typ, rings = sqlmm.wkt_parse(s)
    assert typ == "polygon"
    np.testing.assert_array_equal(rings[0][0], vx)
    np.testing.assert_array_equal(rings[0][1], vy)


def test_shoelace_known_shapes():
    # unit square
    vx = np.array([0.0, 1.0, 1.0, 0.0])
    vy = np.array([0.0, 0.0, 1.0, 1.0])
    assert sqlmm.shoelace_area(vx, vy) == 1.0
    assert sqlmm.perimeter(vx, vy) == 4.0
    cx, cy = sqlmm.polygon_centroid(vx, vy)
    assert (cx, cy) == (0.5, 0.5)
    # orientation-independent
    assert sqlmm.shoelace_area(vx[::-1], vy[::-1]) == 1.0
    # 3-4-5 triangle
    tx = np.array([0.0, 3.0, 0.0])
    ty = np.array([0.0, 0.0, 4.0])
    assert sqlmm.shoelace_area(tx, ty) == 6.0
    assert sqlmm.perimeter(tx, ty) == 12.0


def test_simplify_dp():
    # near-colinear noise collapses to the endpoints
    vx = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    vy = np.array([0.0, 0.001, -0.002, 0.001, 0.0005, 0.0])
    sx, sy = sqlmm.simplify_dp(vx, vy, tol=0.01)
    assert list(sx) == [0.0, 5.0]
    # a significant kink is always kept
    vy2 = np.array([0.0, 0.001, 2.0, 0.001, 0.0005, 0.0])
    sx2, sy2 = sqlmm.simplify_dp(vx, vy2, tol=0.01)
    assert 2.0 in sx2 and sx2[0] == 0.0 and sx2[-1] == 5.0
    # simplification never increases vertex count; tol=0 keeps every
    # non-colinear vertex (exactly-colinear ones may still collapse)
    assert len(sx2) <= len(vx)
    sx0, _ = sqlmm.simplify_dp(vx, vy2, tol=0.0)
    assert len(sx0) >= len(sx2)


def test_buffer_contains_center_not_far():
    bx, by = sqlmm.buffer_polygon(10.0, -5.0, 2.0, n_seg=32)
    assert geo.points_in_polygon(np.array([10.0]), np.array([-5.0]), bx, by)[0]
    assert not geo.points_in_polygon(np.array([12.5]), np.array([-5.0]), bx, by)[0]
    # area approaches pi*r^2 from below
    a = sqlmm.shoelace_area(bx, by)
    assert 0.97 * np.pi * 4.0 < a < np.pi * 4.0


def test_padded_pip_equals_plain():
    rng = np.random.default_rng(17)
    keys = [3, 9, 27, 81]
    polys_vx = []
    polys_vy = []
    for k in keys:
        vx, vy = synth.polygon_vertices_np(k)
        polys_vx.append(vx)
        polys_vy.append(vy)
    VX, VY = geo.pad_polygons(polys_vx, polys_vy)
    px = rng.uniform(-180, 180, 2000)
    py = rng.uniform(-85, 85, 2000)
    gi = rng.integers(0, len(keys), 2000)
    got = geo.points_in_padded_polygons(px, py, gi, VX, VY)
    for i in range(len(keys)):
        sel = gi == i
        exp = geo.points_in_polygon(px[sel], py[sel], polys_vx[i], polys_vy[i])
        assert np.array_equal(got[sel], exp), f"poly {i}"
