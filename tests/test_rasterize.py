"""Distributed polygon rasterization (tiles.rasterize_polygons): numpy dense
differential, sparsity contract, holes, and plan shape."""

import numpy as np
import pandas as pd
import pytest

from sis_spark.functions.geometry import (
    points_in_polygon_with_holes,
    wkb_polygon,
)
from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.tiles import rasterize_polygons, tiles_to_raster


def _gg(w=256, h=192):
    return GridGeometry((0, 0, w - 1, h - 1),
                        (1.0 / 64.0, 0.0, -10.0, 0.0, -1.0 / 64.0, 5.0))


def _dense_burn(gg, polys, w, h, fill=0):
    """Reference: dense PIP burn over the whole grid, keys ascending."""
    px, py = np.meshgrid(np.arange(w), np.arange(h))
    cx, cy = gg.cell_center_to_crs(px.ravel().astype(float), py.ravel().astype(float))
    out = np.full(w * h, fill, dtype=np.int32)
    for key in sorted(p["key"] for p in polys):
        p = next(q for q in polys if q["key"] == key)
        m = points_in_polygon_with_holes(cx, cy, p["rings"])
        out[m] = key
    return out.reshape(h, w)


@pytest.fixture(scope="module")
def poly_zoo():
    rng = np.random.RandomState(3)
    zoo = []
    for key in range(1, 9):
        n = 5 + key
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(0.3, 1.4, n)
        cx0 = rng.uniform(-9.5, -6.5)
        cy0 = rng.uniform(2.6, 4.4)
        vx, vy = cx0 + r * np.cos(ang), cy0 + r * np.sin(ang)
        zoo.append({"key": key, "rings": [(vx, vy)]})
    # one polygon with a hole
    vx = np.array([-9.0, -7.0, -7.0, -9.0])
    vy = np.array([2.5, 2.5, 4.5, 4.5])
    hx = np.array([-8.5, -7.5, -7.5, -8.5])
    hy = np.array([3.0, 3.0, 4.0, 4.0])
    zoo.append({"key": 9, "rings": [(vx, vy), (hx, hy)]})
    return zoo


def test_rasterize_matches_dense_numpy(spark, poly_zoo):
    w, h = 256, 192
    gg = _gg(w, h)
    pdf = pd.DataFrame({
        "key": [p["key"] for p in poly_zoo],
        "wkb": [wkb_polygon(p["rings"]) for p in poly_zoo],
    })
    polys = spark.createDataFrame(pdf, schema="key long, wkb binary")
    tiles = rasterize_polygons(polys, gg, tile_size=64)
    got = tiles_to_raster(tiles, gg, tile_size=64, dtype=np.int32)[:, :, 0]
    want = _dense_burn(gg, poly_zoo, w, h)
    assert np.array_equal(got, want)
    # hole pixels are NOT key 9 (either fill or an overlapping other key)
    hole = want[(slice(64, 128)), :][:, 96:160]
    assert not np.any(hole == -1)


def test_rasterize_sparse_tiles_only(spark):
    gg = _gg(256, 192)
    # a single tiny polygon inside tile (0, 0)
    vx = np.array([-9.99, -9.95, -9.95, -9.99])
    vy = np.array([4.95, 4.95, 4.99, 4.99])
    polys = spark.createDataFrame(
        pd.DataFrame({"key": [7], "wkb": [wkb_polygon([(vx, vy)])]}),
        schema="key long, wkb binary",
    )
    rows = rasterize_polygons(polys, gg, tile_size=64).collect()
    assert [(r["tx"], r["ty"]) for r in rows] == [(0, 0)]
    lab = np.frombuffer(rows[0]["data"], np.int32)
    assert set(np.unique(lab)) <= {0, 7} and (lab == 7).sum() > 0


def test_rasterize_max_key_wins(spark):
    gg = _gg(64, 64)
    sq = lambda x0, y0, s: (np.array([x0, x0 + s, x0 + s, x0]),
                            np.array([y0, y0, y0 + s, y0 + s]))
    polys = spark.createDataFrame(
        pd.DataFrame({
            "key": [2, 5],
            "wkb": [wkb_polygon([sq(-9.9, 4.1, 0.5)]),
                    wkb_polygon([sq(-9.7, 4.3, 0.5)])],  # overlaps key 2
        }),
        schema="key long, wkb binary",
    )
    gg = GridGeometry((0, 0, 63, 63),
                      (1.0 / 64.0, 0.0, -10.0, 0.0, -1.0 / 64.0, 5.0))
    got = tiles_to_raster(
        rasterize_polygons(polys, gg, tile_size=64), gg, tile_size=64, dtype=np.int32
    )[:, :, 0]
    assert (got == 5).sum() > 0 and (got == 2).sum() > 0
    # overlap region: key 5 won everywhere both cover
    px, py = np.meshgrid(np.arange(64), np.arange(64))
    cx, cy = gg.cell_center_to_crs(px.ravel().astype(float), py.ravel().astype(float))
    in2 = points_in_polygon_with_holes(cx, cy, [sq(-9.9, 4.1, 0.5)]).reshape(64, 64)
    in5 = points_in_polygon_with_holes(cx, cy, [sq(-9.7, 4.3, 0.5)]).reshape(64, 64)
    assert np.all(got[in2 & in5] == 5)


def test_line_cells_matches_brute(spark):
    from sis_spark.operators.tiling import line_cells

    import numpy as np

    rng = np.random.RandomState(19)
    segs = [(i, int(a), int(b), int(c), int(d)) for i, (a, b, c, d) in
            enumerate(rng.randint(-30, 30, size=(25, 4)))]
    df = spark.createDataFrame(
        segs, "seg_id long, x1 long, y1 long, x2 long, y2 long"
    ).repartition(4)
    C = 7
    got = sorted((r["seg_id"], r["ix"], r["iy"])
                 for r in line_cells(df, cell=C).collect())
    want = []
    for sid, x1, y1, x2, y2 in segs:
        for ix in range(min(x1, x2) // C, max(x1, x2) // C + 1):
            for iy in range(min(y1, y2) // C, max(y1, y2) // C + 1):
                ds = [(x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
                      for cx, cy in [(ix * C, iy * C), ((ix + 1) * C, iy * C),
                                     (ix * C, (iy + 1) * C),
                                     ((ix + 1) * C, (iy + 1) * C)]]
                if not all(d > 0 for d in ds) and not all(d < 0 for d in ds):
                    want.append((sid, ix, iy))
    assert got == sorted(want)


def test_line_cells_axis_aligned(spark):
    from sis_spark.operators.tiling import line_cells

    # horizontal segment across 3 cells of side 10
    df = spark.createDataFrame([(1, 0, 5, 25, 5)],
                               "seg_id long, x1 long, y1 long, x2 long, y2 long")
    got = sorted((r["ix"], r["iy"]) for r in line_cells(df, cell=10).collect())
    assert got == [(0, 0), (1, 0), (2, 0)]
