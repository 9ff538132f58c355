"""Vector-tile cutting: brute differential, plan shape, lonlat wrapper,
polygon cut (area conservation, holes, quantization)."""

import numpy as np

from sis_spark.functions.geometry import wkb_parse, wkb_polygon
from sis_spark.operators.vector_tiles import (
    tile_cut_lonlat,
    tile_cut_polygons,
    tile_cut_segments,
)


def _brute_cut(segs, zoom, extent):
    """Reference Liang–Barsky over every tile cell (float64, same formulas
    but naive full-grid scan)."""
    n = 1 << zoom
    out = {}
    for gid, seg, x0, y0, x1, y1 in segs:
        dx, dy = x1 - x0, y1 - y0
        for tx in range(n):
            for ty in range(n):
                ts = [0.0]
                te = [1.0]
                for p0, d, lo, hi in ((x0, dx, tx, tx + 1.0), (y0, dy, ty, ty + 1.0)):
                    if d > 0:
                        ts.append((lo - p0) / d)
                        te.append((hi - p0) / d)
                    elif d < 0:
                        ts.append((hi - p0) / d)
                        te.append((lo - p0) / d)
                    else:
                        inside = lo <= p0 < hi
                        ts.append(0.0 if inside else 1.0)
                        te.append(1.0 if inside else 0.0)
                t0, t1 = max(ts), min(te)
                if t0 < t1:
                    q = lambda p0, d, t, c: int(
                        max(0, min(np.floor((p0 + d * t - c) * extent), extent - 1))
                    )
                    out[(gid, seg, tx, ty)] = (
                        t0, t1, q(x0, dx, t0, tx), q(y0, dy, t0, ty),
                        q(x0, dx, t1, tx), q(y0, dy, t1, ty),
                    )
    return out


def test_cut_matches_brute(spark):
    rng = np.random.RandomState(7)
    segs = []
    for i in range(120):
        x0, y0 = rng.uniform(-1, 5, 2)
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(0.1, 3.0)
        segs.append((i, 0, float(x0), float(y0),
                     float(x0 + ln * np.cos(ang)), float(y0 + ln * np.sin(ang))))
    # axis-parallel and degenerate cases
    segs += [
        (200, 0, 0.5, 1.25, 3.5, 1.25),   # horizontal across 4 cells
        (201, 0, 2.25, -1.0, 2.25, 5.0),  # vertical, enters from outside
        (202, 0, 1.0, 1.0, 3.0, 3.0),     # through cell corners exactly
        (203, 0, -5.0, -5.0, -1.0, -2.0), # fully outside the grid
    ]
    df = spark.createDataFrame(
        segs, "gid long, seg long, x0 double, y0 double, x1 double, y1 double"
    )
    got = {
        (r["gid"], r["seg"], r["tx"], r["ty"]):
        (r["t0"], r["t1"], r["qx0"], r["qy0"], r["qx1"], r["qy1"])
        for r in tile_cut_segments(df, zoom=2, extent=128).collect()
    }
    exp = _brute_cut(segs, zoom=2, extent=128)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][2:] == exp[k][2:], (k, got[k], exp[k])
        assert abs(got[k][0] - exp[k][0]) == 0 and abs(got[k][1] - exp[k][1]) == 0


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame(
        [(0, 0, 0.1, 0.2, 1.9, 1.7)],
        "gid long, seg long, x0 double, y0 double, x1 double, y1 double",
    )
    plan = tile_cut_segments(df, zoom=4)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python boundary
    assert "Exchange" not in plan    # map-only: no shuffle before aggregation


def _poly_df(spark, polys):
    rows = [(k, wkb_polygon(rings)) for k, rings in polys]
    return spark.createDataFrame(rows, "pkey long, wkb binary")


def test_polygon_cut_square_quarters(spark):
    # unit-ish square centered on the (1,1) tile corner -> 4 equal quarters
    sq = [(np.array([0.5, 1.5, 1.5, 0.5]), np.array([0.5, 0.5, 1.5, 1.5]))]
    out = tile_cut_polygons(_poly_df(spark, [(7, sq)]), zoom=2).collect()
    got = {(r["tx"], r["ty"]): r for r in out}
    assert set(got) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    for r in got.values():
        assert abs(r["area"] - 0.25) < 1e-12
        typ, rings = wkb_parse(bytes(r["q_wkb"]))
        assert typ == "polygon" and len(rings) == 1


def test_polygon_cut_area_conservation_with_hole(spark):
    rng = np.random.RandomState(5)
    # star-ish simple polygon + a square hole, fully inside the zoom-2 grid
    ang = np.sort(rng.uniform(0, 2 * np.pi, 11))
    rad = rng.uniform(0.6, 1.7, 11)
    shell = (2.0 + rad * np.cos(ang), 2.0 + rad * np.sin(ang))
    hole = (np.array([1.8, 2.2, 2.2, 1.8]), np.array([1.8, 1.8, 2.2, 2.2]))
    from sis_spark.functions.overlay import signed_area

    total = abs(signed_area(*shell)) - abs(signed_area(*hole))
    out = tile_cut_polygons(_poly_df(spark, [(1, [shell, hole])]), zoom=2).collect()
    assert abs(sum(r["area"] for r in out) - total) < 1e-9
    # clipped world geometry stays inside its tile
    for r in out:
        _, rings = wkb_parse(bytes(r["clip_wkb"]))
        for vx, vy in rings:
            assert vx.min() >= r["tx"] - 1e-12 and vx.max() <= r["tx"] + 1 + 1e-12
            assert vy.min() >= r["ty"] - 1e-12 and vy.max() <= r["ty"] + 1 + 1e-12


def test_polygon_cut_outside_and_quantization_range(spark):
    outside = [(np.array([-3.0, -2.0, -2.0]), np.array([-3.0, -3.0, -2.0]))]
    inside = [(np.array([0.25, 0.75, 0.75, 0.25]), np.array([0.25, 0.25, 0.75, 0.75]))]
    out = tile_cut_polygons(
        _poly_df(spark, [(1, outside), (2, inside)]), zoom=1, extent=64
    ).collect()
    assert {r["pkey"] for r in out} == {2}
    _, rings = wkb_parse(bytes(out[0]["q_wkb"]))
    vx, vy = rings[0]
    assert vx.min() >= 0 and vx.max() <= 63 and vy.min() >= 0 and vy.max() <= 63
    assert vx.min() == 16.0 and vx.max() == 48.0  # 0.25/0.75 * 64


def test_cut_intervals_partition_each_segment(spark):
    """Across all tiles, a segment's (t0, t1) intervals are non-overlapping
    and their union covers exactly the part of the segment inside the grid
    (coverage invariant — catches both dropped and double-assigned spans)."""
    rng = np.random.RandomState(42)
    segs = []
    for i in range(200):
        x0, y0, x1, y1 = rng.uniform(-0.5, 4.5, 4)
        segs.append((i, 0, float(x0), float(y0), float(x1), float(y1)))
    df = spark.createDataFrame(
        segs, "gid long, seg long, x0 double, y0 double, x1 double, y1 double"
    )
    rows = tile_cut_segments(df, zoom=2).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["gid"], []).append((r["t0"], r["t1"]))
    for gid, x0, y0, x1, y1 in ((s[0], *s[2:]) for s in segs):
        ivs = sorted(by_seg.get(gid, []))
        for (a0, a1), (b0, b1) in zip(ivs, ivs[1:]):
            assert b0 >= a1 - 1e-12  # no overlap
        covered = sum(t1 - t0 for t0, t1 in ivs)
        # reference in-grid length fraction by dense sampling
        ts = np.linspace(0, 1, 2001)
        px = x0 + (x1 - x0) * ts
        py = y0 + (y1 - y0) * ts
        frac = np.mean((px >= 0) & (px < 4) & (py >= 0) & (py < 4))
        assert abs(covered - frac) < 0.01, gid


def test_lonlat_wrapper_covers_expected_tiles(spark):
    # a segment crossing the Greenwich meridian near the equator at zoom 1:
    # world x spans just below/above 1.0 -> tiles (0, y) and (1, y)
    df = spark.createDataFrame(
        [(1, 0, -10.0, 5.0, 10.0, -5.0)],
        "gid long, seg long, lon0 double, lat0 double, lon1 double, lat1 double",
    )
    rows = tile_cut_lonlat(df, zoom=1).collect()
    tiles = {(r["tx"], r["ty"]) for r in rows}
    # the segment crosses the (1,1) world corner; FP fuzz may add sliver
    # intersections with the off-diagonal cells
    assert {(0, 0), (1, 1)} <= tiles <= {(0, 0), (1, 0), (0, 1), (1, 1)}
    # clip params cover the whole segment with no gap
    ts = sorted((r["t0"], r["t1"]) for r in rows)
    assert ts[0][0] == 0.0 and ts[-1][1] == 1.0
