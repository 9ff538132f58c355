"""Marching-squares isolines: kernel invariants, distributed-vs-dense parity
(tile seams must be invisible), and polyline stitching."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.raster import isolines as iso
from sis_spark.raster.grid import GridGeometry
from sis_spark.raster import tiles as rt


def _field(h, w):
    """Smooth radial field, values 0..255."""
    y, x = np.mgrid[0:h, 0:w]
    r = np.hypot(x - w / 2.3, y - h / 2.7)
    return np.clip(255 - r * 3.1, 0, 255).astype(np.uint8)


def test_kernel_endpoints_lie_on_crossing_edges():
    arr = _field(40, 50).astype(np.float64)
    level = 200.3  # the radial field spans ~140..255 on this grid size
    segs = iso.marching_squares(arr, level)
    assert len(segs) > 0
    for x1, y1, x2, y2 in segs[:200]:
        for x, y in ((x1, y1), (x2, y2)):
            # endpoint is on a horizontal or vertical pixel edge
            fx, fy = x - np.floor(x), y - np.floor(y)
            on_v = abs(fx) < 1e-12  # x integer: vertical edge
            on_h = abs(fy) < 1e-12
            assert on_v or on_h
            if on_v and not on_h:
                a = arr[int(np.floor(y)), int(x)]
                b = arr[int(np.floor(y)) + 1, int(x)]
            elif on_h and not on_v:
                a = arr[int(y), int(np.floor(x))]
                b = arr[int(y), int(np.floor(x)) + 1]
            else:
                continue  # exactly on a pixel center: crossing at t in {0,1}
            assert min(a, b) <= level <= max(a, b) or level in (a, b)


def test_kernel_matches_bruteforce_cases():
    """Random small grids: segment multiset equals a scalar per-cell
    re-derivation (independent loop implementation)."""
    rng = np.random.default_rng(4)
    arr = rng.uniform(0, 10, size=(7, 9))
    level = 5.01234
    got = iso.marching_squares(arr, level)

    ref = []
    for cy in range(6):
        for cx in range(8):
            sub = arr[cy : cy + 2, cx : cx + 2]
            s = iso.marching_squares(sub, level)
            for x1, y1, x2, y2 in s:
                ref.append((x1 + cx, y1 + cy, x2 + cx, y2 + cy))
    got_set = {tuple(np.round(r, 9)) for r in got}
    ref_set = {tuple(np.round(r, 9)) for r in np.asarray(ref).reshape(-1, 4)}
    assert got_set == ref_set


@pytest.mark.parametrize("tile", [32, 64])
def test_distributed_equals_dense(spark, tile):
    h, w = 130, 190
    arr = _field(h, w)
    gg = GridGeometry((0, 0, w - 1, h - 1), (0.5, 0.0, 3.0, 0.0, -0.5, 70.0), "EPSG:4326")
    tiles = rt.raster_to_tiles(spark, arr[:, :, None], gg, tile_size=tile)
    levels = [63.5, 127.5, 200.0]

    got = iso.isolines(tiles, gg, levels, tile_size=tile).collect()

    from sis_spark.functions import transforms as tr

    center = tr.grid_to_crs(gg.affine, cell_center=True)
    want = set()
    for lv in levels:
        segs = iso.marching_squares(arr.astype(np.float64), lv)
        if not len(segs):
            continue
        x1, y1 = tr.affine_apply(center, segs[:, 0], segs[:, 1])
        x2, y2 = tr.affine_apply(center, segs[:, 2], segs[:, 3])
        for a, b, c, d in zip(x1, y1, x2, y2):
            want.add((lv, round(a, 9), round(b, 9), round(c, 9), round(d, 9)))
    got_set = {
        (r["level"], round(r["x1"], 9), round(r["y1"], 9), round(r["x2"], 9), round(r["y2"], 9))
        for r in got
    }
    assert got_set == want and len(want) > 100


def test_stitch_circle_closes():
    arr = _field(60, 60).astype(np.float64)
    segs = iso.marching_squares(arr, 200.0)
    lines = iso.stitch_polylines(segs)
    # the 200 contour of the radial field is one closed loop inside the grid
    loops = [l for l in lines if np.allclose(l[0], l[-1])]
    assert len(loops) >= 1
    assert max(len(l) for l in lines) > 20


def test_missing_tiles_emit_no_boundary_segments(spark):
    """A sparse tile set (one tile missing from the grid) must not fabricate
    contour segments along the absent tile's boundary (ADVICE r1 item 4):
    marching cells touching NaN halo corners emit nothing."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.isolines import isolines

    ts = 8
    # 2x2 tile grid, constant value 100 everywhere -> no real contours at 50
    rows = []
    for ty in range(2):
        for tx in range(2):
            if (tx, ty) == (1, 0):
                continue  # missing tile
            data = np.full((ts, ts), 100, dtype=np.uint8).tobytes()
            rows.append((tx, ty, 0, bytearray(data)))
    df = spark.createDataFrame(rows, schema="tx int, ty int, band int, data binary")
    gg = GridGeometry((0, 0, 2 * ts - 1, 2 * ts - 1), (0.1, 0.0, 0.0, 0.0, -0.1, 10.0))
    segs = isolines(df, gg, levels=[50.0], tile_size=ts).collect()
    assert len(segs) == 0


def test_interior_missing_tile_matches_dense_nan(spark):
    """An INTERIOR missing tile in a real gradient field: the distributed
    result must equal dense marching squares over the same field with the
    tile's region set to NaN — genuine contours elsewhere survive, cells
    touching the hole emit nothing (reference no-data exclusion,
    F/image/processing/isoline/)."""
    import numpy as np

    from sis_spark.functions import transforms as tr

    ts = 16
    h = w = 3 * ts
    arr = _field(h, w)
    gg = GridGeometry((0, 0, w - 1, h - 1), (0.25, 0.0, -5.0, 0.0, -0.25, 40.0))
    miss = (1, 1)  # center tile of the 3x3 grid
    rows = []
    for ty in range(3):
        for tx in range(3):
            if (tx, ty) == miss:
                continue
            block = arr[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append((tx, ty, 0, bytearray(block.tobytes())))
    df = spark.createDataFrame(rows, schema="tx int, ty int, band int, data binary")
    levels = [120.0, 200.0]
    got = iso.isolines(df, gg, levels, tile_size=ts).collect()

    dense = arr.astype(np.float64)
    dense[miss[1] * ts:(miss[1] + 1) * ts, miss[0] * ts:(miss[0] + 1) * ts] = np.nan
    center = tr.grid_to_crs(gg.affine, cell_center=True)
    want = set()
    for lv in levels:
        segs = iso.marching_squares(dense, lv)
        if not len(segs):
            continue
        x1, y1 = tr.affine_apply(center, segs[:, 0], segs[:, 1])
        x2, y2 = tr.affine_apply(center, segs[:, 2], segs[:, 3])
        for a, b, c, d in zip(x1, y1, x2, y2):
            want.add((lv, round(a, 9), round(b, 9), round(c, 9), round(d, 9)))
    got_set = {
        (r["level"], round(r["x1"], 9), round(r["y1"], 9), round(r["x2"], 9), round(r["y2"], 9))
        for r in got
    }
    assert got_set == want
    assert len(want) > 30  # the field genuinely has contours outside the hole


def _canon_lines(lines, nd=7):
    """Canonical form of a polyline set: rounded vertex tuples, direction-
    normalized; closed loops rotation-normalized (comparison is up to
    direction + starting point, the only freedoms of the output shape)."""
    out = []
    for pts in lines:
        t = [tuple(np.round(p, nd)) for p in pts]
        if len(t) > 2 and t[0] == t[-1]:
            ring = t[:-1]
            best = None
            for seq in (ring, ring[::-1]):
                for s in range(len(seq)):
                    rot = tuple(seq[s:] + seq[:s])
                    if best is None or rot < best:
                        best = rot
            out.append(("ring", best))
        else:
            out.append(("path", min(tuple(t), tuple(t[::-1]))))
    return sorted(out)


def test_distributed_assembly_equals_driver_stitch(spark):
    """VERDICT r3 item 7: assemble_polylines (endpoint-keyed pointer
    doubling, fully distributed) equals the driver-side stitch on a
    multi-tile contour set — same components, same vertex order up to
    direction/rotation."""
    h, w = 130, 190
    arr = _field(h, w)
    gg = GridGeometry((0, 0, w - 1, h - 1), (0.5, 0.0, 3.0, 0.0, -0.5, 70.0), "EPSG:4326")
    tiles = rt.raster_to_tiles(spark, arr[:, :, None], gg, tile_size=64)
    # levels must avoid the integer sample values: v == level puts contour
    # vertices exactly on pixel centers shared by 4 cells (degree-4 nodes,
    # where assembly breaks by documented contract)
    levels = [63.5, 200.25]
    segs_df = iso.isolines(tiles, gg, levels, tile_size=64).localCheckpoint()

    rows = segs_df.collect()
    want = []
    for lv in levels:
        segs = np.asarray([[r["x1"], r["y1"], r["x2"], r["y2"]]
                           for r in rows if r["level"] == lv])
        want += _canon_lines(iso.stitch_polylines(segs, tol=1e-9))

    got_rows = iso.assemble_polylines(segs_df, tol=1e-9).collect()
    by_line = {}
    for r in got_rows:
        by_line.setdefault((r["level"], r["line_id"]), []).append(
            (r["seq"], r["x"], r["y"]))
    got = []
    for pts in by_line.values():
        pts.sort()
        assert [s for s, _, _ in pts] == list(range(len(pts)))  # dense ranks
        got.append(np.asarray([(x, y) for _, x, y in pts]))
    got = _canon_lines(got)
    assert len(got) == len(want) and got == want
    assert max(len(l[1]) for l in got) > 20  # real multi-tile polylines
