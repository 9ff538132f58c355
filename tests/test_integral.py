"""Distributed integral image: SAT == dense cumsum, box sums exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.integral import box_sum, integral_dense, integral_tiles
from sis_spark.raster.tiles import TILE_SCHEMA

TS = 16


def _tiles_from(spark, arr):
    h, w = arr.shape
    ntx, nty = (w + TS - 1) // TS, (h + TS - 1) // TS
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            block = np.zeros((TS, TS), arr.dtype)
            sub = arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
            block[: sub.shape[0], : sub.shape[1]] = sub
            rows.append((tx, ty, 0, block.tobytes()))
    gg = GridGeometry((0, 0, w - 1, h - 1), (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    return spark.createDataFrame(rows, TILE_SCHEMA), gg


@pytest.fixture(scope="module")
def raster(spark):
    rng = np.random.RandomState(47)
    arr = rng.randint(0, 255, size=(40, 56)).astype(np.uint8)
    tiles, gg = _tiles_from(spark, arr)
    return arr, tiles, gg


def test_integral_matches_dense(spark, raster):
    arr, tiles, gg = raster
    sat = integral_tiles(tiles, gg, tile_size=TS)
    got = np.full(arr.shape, -1, np.int64)
    for r in sat.collect():
        a = np.frombuffer(bytes(r["data"]), np.int64).reshape(TS, TS)
        y0, x0 = r["ty"] * TS, r["tx"] * TS
        vh, vw = min(TS, 40 - y0), min(TS, 56 - x0)
        got[y0:y0 + vh, x0:x0 + vw] = a[:vh, :vw]
    assert np.array_equal(got, integral_dense(arr))


def test_box_sum_exact(spark, raster):
    arr, tiles, gg = raster
    sat = integral_tiles(tiles, gg, tile_size=TS)
    rng = np.random.RandomState(3)
    boxes = []
    for i in range(25):
        x0, x1 = sorted(rng.randint(0, 56, 2))
        y0, y1 = sorted(rng.randint(0, 40, 2))
        boxes.append((i, int(x0), int(y0), int(x1), int(y1)))
    bdf = spark.createDataFrame(boxes, "id long, x0 long, y0 long, x1 long, y1 long")
    got = {r["id"]: r["box_sum"] for r in box_sum(sat, gg, bdf, TS).collect()}
    for i, x0, y0, x1, y1 in boxes:
        assert got[i] == int(arr[y0:y1 + 1, x0:x1 + 1].astype(np.int64).sum()), i
