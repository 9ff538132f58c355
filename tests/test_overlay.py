"""Polygon overlay ops: Sutherland–Hodgman vs Greiner–Hormann differentials,
per-edge clip-area kernel vs ring clip, and boolean-algebra invariants.

Mirrors the reference's differential-testing style for SQLMM binary
constructive ops (Ft/filter/sqlmm/RegistryTestCase.java runs the same suite
against JTS / ESRI / Java2D backends; here the backends are two independent
engine algorithms)."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark import synth
from sis_spark.functions import overlay as ov
from sis_spark.functions.sqlmm import shoelace_area


def _pair(seed: int):
    """Deterministic general-position polygon pair: two synth star polygons
    whose centers are nudged by irrational offsets so no vertex/edge
    degeneracies can occur."""
    vx1, vy1 = synth.polygon_vertices_np(seed)
    vx2, vy2 = synth.polygon_vertices_np(seed + 1)
    # overlap them: move B's centroid toward A's, offset irrationally
    dx = float(vx1.mean() - vx2.mean()) + 0.3141592653589793 * ((seed % 7) - 3) / 7.0
    dy = float(vy1.mean() - vy2.mean()) + 0.2718281828459045 * ((seed % 5) - 2) / 5.0
    return (vx1, vy1), (vx2 + dx, vy2 + dy)


SEEDS = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233]


def test_clip_halfplane_matches_clip_polygon_x():
    vx, vy = synth.polygon_vertices_np(7)
    b = float(vx.mean())
    ox1, oy1 = ov.clip_halfplane(vx, vy, 1.0, 0.0, b)
    from sis_spark.functions.geometry import clip_polygon_x

    ox2, oy2 = clip_polygon_x(vx, vy, b, keep_leq=True)
    assert np.allclose(ox1, ox2) and np.allclose(oy1, oy2)


@pytest.mark.parametrize("seed", SEEDS)
def test_clip_area_edge_terms_vs_ring_clip(seed):
    """Per-edge Green's-theorem kernel == shoelace of the S-H clipped ring."""
    vx, vy = synth.polygon_vertices_np(seed)
    b = float(np.median(vx))
    VX = vx[None, :]
    VY = vy[None, :]
    q = ov.clip_area_halfplane_q(VX, VY, np.array([len(vx)]), np.array([b]))
    ox, oy = ov.clip_halfplane(vx, vy, 1.0, 0.0, b)
    ring_2area = 2.0 * shoelace_area(ox, oy) if len(ox) >= 3 else 0.0
    assert q[0] / ov.QUANT == pytest.approx(ring_2area, abs=2e-5 * max(1.0, ring_2area))


@pytest.mark.parametrize("seed", SEEDS)
def test_intersection_convex_box_vs_sutherland_hodgman(seed):
    """G-H intersection with a convex box == S-H composition clip."""
    (avx, avy), _ = _pair(seed)
    x0, x1 = np.percentile(avx, [20, 80])
    y0, y1 = np.percentile(avy, [25, 75])
    # irrational nudges: percentiles can land exactly on a vertex coordinate,
    # which would put the box boundary through a vertex (degenerate for G-H)
    x0 += 1.2345e-7
    x1 -= 2.3456e-7
    y0 += 3.4567e-7
    y1 -= 4.5678e-7
    bvx = np.array([x0, x1, x1, x0])
    bvy = np.array([y0, y0, y1, y1])
    rings = ov.overlay(avx, avy, bvx, bvy, "intersection")
    a_gh = ov.rings_area(rings)
    ox, oy = ov.clip_convex(avx, avy, bvx, bvy)
    a_sh = shoelace_area(ox, oy) if len(ox) >= 3 else 0.0
    assert a_gh == pytest.approx(a_sh, rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("seed", SEEDS)
def test_overlay_boolean_invariants(seed):
    (avx, avy), (bvx, bvy) = _pair(seed)
    area_a = shoelace_area(avx, avy)
    area_b = shoelace_area(bvx, bvy)
    inter = ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "intersection"))
    union = ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "union"))
    diff_ab = ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "difference"))
    diff_ba = ov.rings_area(ov.overlay(bvx, bvy, avx, avy, "difference"))
    sym = ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "symdifference"))
    tol = 1e-9 * max(area_a, area_b, 1.0)
    assert inter >= -tol and inter <= min(area_a, area_b) + tol
    assert union == pytest.approx(area_a + area_b - inter, abs=tol)
    assert diff_ab == pytest.approx(area_a - inter, abs=tol)
    assert diff_ba == pytest.approx(area_b - inter, abs=tol)
    assert sym == pytest.approx(diff_ab + diff_ba, abs=tol)
    # commutativity of intersection
    inter_ba = ov.rings_area(ov.overlay(bvx, bvy, avx, avy, "intersection"))
    assert inter_ba == pytest.approx(inter, abs=tol)


def test_overlay_disjoint_and_containment():
    sq = lambda cx, cy, r: (np.array([cx - r, cx + r, cx + r, cx - r]),
                            np.array([cy - r, cy - r, cy + r, cy + r]))
    avx, avy = sq(0.0, 0.0, 10.0)
    bvx, bvy = sq(0.5, 0.25, 1.0)  # strictly inside A
    dvx, dvy = sq(100.0, 0.0, 1.0)  # disjoint from A

    assert ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "intersection")) == pytest.approx(4.0)
    assert ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "union")) == pytest.approx(400.0)
    # A \ B: hole — even-odd pair of rings
    assert ov.rings_area(ov.overlay(avx, avy, bvx, bvy, "difference")) == pytest.approx(396.0)
    assert ov.rings_area(ov.overlay(bvx, bvy, avx, avy, "difference")) == pytest.approx(0.0)
    assert ov.rings_area(ov.overlay(avx, avy, dvx, dvy, "intersection")) == pytest.approx(0.0)
    assert ov.rings_area(ov.overlay(avx, avy, dvx, dvy, "union")) == pytest.approx(404.0)
    assert ov.rings_area(ov.overlay(avx, avy, dvx, dvy, "difference")) == pytest.approx(400.0)


def test_overlay_monte_carlo_membership():
    """Point-sampling check: a grid point is in the intersection ring set iff
    it is in A and in B (even-odd)."""
    from sis_spark.functions.geometry import points_in_polygon

    (avx, avy), (bvx, bvy) = _pair(3)
    rings = ov.overlay(avx, avy, bvx, bvy, "intersection")
    lo = min(avx.min(), bvx.min()) - 0.1
    hi = max(avx.max(), bvx.max()) + 0.1
    g = np.linspace(lo + 0.0123456, hi - 0.0065432, 40)
    px, py = np.meshgrid(g, np.linspace(min(avy.min(), bvy.min()), max(avy.max(), bvy.max()), 40))
    px, py = px.ravel(), py.ravel()
    in_a = points_in_polygon(px, py, avx, avy)
    in_b = points_in_polygon(px, py, bvx, bvy)
    acc = np.zeros(len(px), dtype=np.int64)
    for rvx, rvy in rings:
        acc += points_in_polygon(px, py, rvx, rvy).astype(np.int64)
    in_rings = (acc % 2).astype(bool)
    assert np.array_equal(in_rings, in_a & in_b)


# ------------------------------------------------- ST_Buffer / union_pieces (r2)

def test_buffer_areas_known_shapes():
    """Buffer area sanity vs closed-form Minkowski sums (inscribed n-gon
    arcs approach the circular value from below)."""
    import numpy as np

    from sis_spark.functions.overlay import buffer_geometry, rings_area
    from sis_spark.functions.sqlmm import wkt_parse

    def area(t, rings):
        rr = rings if t == "polygon" else [r for p in rings for r in p]
        return rings_area(rr)

    cases = [
        ("POINT (5 5)", 3.0, np.pi * 9),
        ("LINESTRING (0 0, 10 0)", 1.0, 20 + np.pi),
        # L-shape: rect union 39 + 1.25 disk (two half caps + outer corner quarter)
        ("LINESTRING (0 0, 10 0, 10 10)", 1.0, 39 + 1.25 * np.pi),
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 1.0, 144 - (4 - np.pi)),
        # hole shrinks by r on each side; hole corners stay square (erosion)
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))",
         0.5, 121 - (4 - np.pi) * 0.25 - 9),
        ("MULTIPOINT ((0 0), (100 0))", 2.0, 8 * np.pi),
    ]
    for wkt, r, exact in cases:
        t, rings = buffer_geometry(*wkt_parse(wkt), r, n_seg=64)
        got = area(t, rings)
        assert exact * 0.995 < got <= exact + 1e-9, (wkt, got, exact)

    # hole survives as a CW ring of the same polygon
    t, rings = buffer_geometry(
        *wkt_parse("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"),
        0.5, n_seg=32)
    assert t == "polygon" and len(rings) == 2


def test_buffer_containment_matches_distance():
    """Differential: point-in-buffer == (distance <= r) for all points
    outside the inscribed-n-gon tolerance band [r*cos(pi/n), r]."""
    import numpy as np

    from sis_spark.functions import geometry as geo
    from sis_spark.functions.overlay import buffer_geometry
    from sis_spark.functions.sqlmm import geom_distance, wkt_parse

    rng = np.random.default_rng(11)
    n_seg = 48
    r = 2.0
    band_lo = r * np.cos(np.pi / n_seg)
    for wkt in [
        "LINESTRING (0 0, 10 0, 12 8, 3 9)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))",
        "GEOMETRYCOLLECTION (POINT (20 0), LINESTRING (0 0, 10 5))",
    ]:
        gtyp, gval = wkt_parse(wkt)
        t, rings = buffer_geometry(gtyp, gval, r, n_seg=n_seg)
        flat = rings if t == "polygon" else [rg for p in rings for rg in p]
        px = rng.uniform(-5, 25, 3000)
        py = rng.uniform(-5, 15, 3000)
        d = np.array([geom_distance((gtyp, gval), ("point", (x, y)))
                      for x, y in zip(px, py)])
        keep = (d < band_lo - 1e-6) | (d > r + 1e-6)
        inside = geo.points_in_polygon_with_holes(px[keep], py[keep], flat)
        assert np.array_equal(inside, d[keep] <= band_lo), wkt


def test_union_geometries_and_agg(spark):
    """N-ary union: area vs closed form, hole formation, containment
    differential (PIP of the union == any member PIP), and the distributed
    aggregate wrapper."""
    import numpy as np
    import pandas as pd

    from sis_spark.functions import geometry as geo
    from sis_spark.functions.overlay import (
        rings_area,
        signed_area,
        st_union_agg,
        union_geometries,
    )
    from sis_spark.functions.sqlmm import wkt_parse

    # overlapping pair + disjoint member
    geoms = [wkt_parse("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
             wkt_parse("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
             wkt_parse("POLYGON ((30 0, 34 0, 34 4, 30 4, 30 0))")]
    t, rings = union_geometries(geoms)
    flat = rings if t == "polygon" else [r for p in rings for r in p]
    assert t == "multipolygon" and abs(rings_area(flat) - 191.0) < 1e-9

    # ring of generically-overlapping squares -> union with a central hole
    ring_geoms = []
    for k in range(8):
        a = 2 * np.pi * k / 8 + 0.1
        cx, cy = 6 * np.cos(a), 6 * np.sin(a)
        s = 2.6
        ring_geoms.append(("polygon", [(np.array([cx - s, cx + s, cx + s, cx - s]),
                                        np.array([cy - s, cy - s, cy + s, cy + s]))]))
    t, rings = union_geometries(ring_geoms)
    flat = rings if t == "polygon" else [r for p in rings for r in p]
    assert t == "polygon" and len(flat) == 2  # shell + hole
    assert min(signed_area(*r) for r in flat) < 0  # the hole is CW

    # containment differential on random probes
    rng = np.random.default_rng(3)
    px = rng.uniform(-10, 10, 4000)
    py = rng.uniform(-10, 10, 4000)
    got = geo.points_in_polygon_with_holes(px, py, flat)
    exp = np.zeros(len(px), dtype=bool)
    for _typ, val in ring_geoms:
        exp |= geo.points_in_polygon_with_holes(px, py, val)
    assert np.array_equal(got, exp)

    # distributed aggregate: two groups
    rows = []
    for gid, (typ, val) in [(0, ring_geoms[0]), (0, ring_geoms[1]),
                            (1, geoms[2])]:
        rows.append({"gid": gid, "wkb": geo.wkb_write(typ, val)})
    df = spark.createDataFrame(pd.DataFrame(rows), schema="gid long, wkb binary")
    out = {r["gid"]: r["wkb"] for r in st_union_agg(df).collect()}
    t0, v0 = geo.wkb_parse(bytes(out[0]))
    assert t0 == "polygon"  # two overlapping squares merge to one shell
    t1, v1 = geo.wkb_parse(bytes(out[1]))
    assert t1 == "polygon" and len(v1) == 1


def test_line_difference_partitions_the_line():
    # intersection and difference pieces are complementary interval sets over
    # the same crossing parameters: their lengths must sum to the input line
    import numpy as np

    from sis_spark.functions.overlay import (
        clip_line_polygon, difference_line_polygon)

    rng = np.random.default_rng(11)
    sq = [(np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4]))]
    hole = sq + [(np.array([1.0, 3, 3, 1]), np.array([1.0, 1, 3, 3]))]
    for rings in (sq, hole):
        for _ in range(25):
            vx = rng.uniform(-3, 7, 6)
            vy = rng.uniform(-3, 7, 6)
            total = float(np.hypot(np.diff(vx), np.diff(vy)).sum())
            pi, _ = clip_line_polygon(vx, vy, rings)
            po, _ = difference_line_polygon(vx, vy, rings)
            li = sum(float(np.hypot(np.diff(x), np.diff(y)).sum()) for x, y in pi)
            lo = sum(float(np.hypot(np.diff(x), np.diff(y)).sum()) for x, y in po)
            assert abs(li + lo - total) < 1e-8


def test_st_difference_line_poly_udf(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sis_spark.functions import geometry as geo
    from sis_spark.functions.overlay import st_difference_line_poly_udf
    from sis_spark.functions.sqlmm import st_length_udf

    poly = geo.wkb_polygon([(np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4]))])
    line = geo.wkb_linestring(np.array([-2.0, 2, 6]), np.array([2.0, 2, 2]))
    df = spark.createDataFrame([(bytes(line), bytes(poly))], "l binary, p binary")
    out = df.select(
        st_length_udf()(st_difference_line_poly_udf()(F.col("l"), F.col("p"))).alias("len")
    ).first()
    assert abs(out["len"] - 4.0) < 1e-9


def test_line_line_intersection_points_kernel():
    import numpy as np

    from sis_spark.functions.overlay import line_line_intersection_points

    # X crossing at (0, 0)
    px, py = line_line_intersection_points(
        np.array([-1.0, 1.0]), np.array([-1.0, 1.0]),
        np.array([-1.0, 1.0]), np.array([1.0, -1.0]))
    assert len(px) == 1 and abs(px[0]) < 1e-15 and abs(py[0]) < 1e-15

    # disjoint parallels
    px, py = line_line_intersection_points(
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        np.array([0.0, 1.0]), np.array([1.0, 1.0]))
    assert len(px) == 0

    # zigzag crossing a horizontal line 3 times
    px, py = line_line_intersection_points(
        np.array([0.0, 1, 2, 3]), np.array([-1.0, 1, -1, 1]),
        np.array([-1.0, 4.0]), np.array([0.0, 0.0]))
    assert len(px) == 3
    assert np.allclose(sorted(py), 0.0)

    # brute differential on random polylines
    rng = np.random.default_rng(5)
    for _ in range(20):
        a = rng.uniform(-5, 5, (4, 2))
        b = rng.uniform(-5, 5, (4, 2))
        px, py = line_line_intersection_points(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
        count = 0
        for i in range(3):
            for j in range(3):
                p, r = a[i], a[i + 1] - a[i]
                q, s = b[j], b[j + 1] - b[j]
                den = r[0] * s[1] - r[1] * s[0]
                if den == 0:
                    continue
                t = ((q - p)[0] * s[1] - (q - p)[1] * s[0]) / den
                u = ((q - p)[0] * r[1] - (q - p)[1] * r[0]) / den
                if 0 < t < 1 and 0 < u < 1:
                    count += 1
        assert len(px) == count


def test_st_intersection_line_line_udf(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sis_spark.functions import geometry as geo
    from sis_spark.functions.overlay import st_intersection_line_line_udf
    from sis_spark.functions.sqlmm import st_numpoints_udf

    a = geo.wkb_linestring(np.array([0.0, 1, 2, 3]), np.array([-1.0, 1, -1, 1]))
    b = geo.wkb_linestring(np.array([-1.0, 4.0]), np.array([0.0, 0.0]))
    df = spark.createDataFrame([(bytes(a), bytes(b))], "a binary, b binary")
    out = df.select(
        st_numpoints_udf()(st_intersection_line_line_udf()(F.col("a"), F.col("b"))).alias("n")
    ).first()
    assert out["n"] == 3
