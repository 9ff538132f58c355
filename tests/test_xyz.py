"""XYZ slippy-tree sink/source: pixel-exact round trip, zoom pruning."""

import glob
import os

import numpy as np

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.tiles import TILE_SCHEMA, build_overviews
from sis_spark.raster.xyz import read_xyz_tiles, write_xyz_tiles

W, H, TS = 128, 128, 64


def _base_array():
    x = np.arange(W)[None, :]
    y = np.arange(H)[:, None]
    return np.stack(
        [(x * 7 + y * 13) % 256, (x * 3 + y * 5 + 17) % 256,
         (x * 11 + y * 3 + 29) % 256],
        axis=2,
    ).astype(np.uint8)


def _tiles_df(spark, arr):
    rows = []
    for ty in range(H // TS):
        for tx in range(W // TS):
            for b in range(3):
                block = arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS, b]
                rows.append((tx, ty, b, block.tobytes()))
    return spark.createDataFrame(rows, TILE_SCHEMA)


def test_write_read_pixel_exact(spark, tmp_path):
    arr = _base_array()
    gg = GridGeometry((0, 0, W - 1, H - 1), (1.0, 0.0, 0.0, 0.0, -1.0, float(H)))
    tiles = _tiles_df(spark, arr)
    levels = [(0, tiles, gg)] + build_overviews(tiles, gg, 1)
    out = str(tmp_path / "xyz")
    man = write_xyz_tiles(levels, out).collect()
    assert {(m["z"], m["x"], m["y"]) for m in man} == {
        (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1), (0, 0, 0)
    }
    assert sorted(glob.glob(os.path.join(out, "*"))) == [
        os.path.join(out, "0"), os.path.join(out, "1")
    ]
    back = read_xyz_tiles(spark, out).collect()
    for r in back:
        got = np.frombuffer(bytes(r["data"]), np.uint8).reshape(TS, TS)
        st = 1 << (1 - r["z"])
        lvl = arr[::st, ::st, r["band"]]
        exp = lvl[r["ty"] * TS:(r["ty"] + 1) * TS, r["tx"] * TS:(r["tx"] + 1) * TS]
        assert np.array_equal(got, exp), (r["z"], r["tx"], r["ty"], r["band"])


def test_zoom_pruned_read(spark, tmp_path):
    arr = _base_array()
    gg = GridGeometry((0, 0, W - 1, H - 1), (1.0, 0.0, 0.0, 0.0, -1.0, float(H)))
    tiles = _tiles_df(spark, arr)
    levels = [(0, tiles, gg)] + build_overviews(tiles, gg, 1)
    out = str(tmp_path / "xyz")
    write_xyz_tiles(levels, out).collect()
    only = read_xyz_tiles(spark, out, zooms=[0]).collect()
    assert {r["z"] for r in only} == {0}
    assert len(only) == 3  # one 64x64 tile x 3 bands at the top zoom
