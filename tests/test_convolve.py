"""Generic focal convolution (terrain.convolve_tiles): distributed == dense
differential, kernel identities, extent masking."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.terrain import convolve_dense, convolve_tiles


def _tiles_df(spark, arr, ts):
    import pandas as pd

    h, w = arr.shape
    rows = []
    for ty in range((h + ts - 1) // ts):
        for tx in range((w + ts - 1) // ts):
            blk = np.zeros((ts, ts), arr.dtype)
            src = arr[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            blk[: src.shape[0], : src.shape[1]] = src
            rows.append((tx, ty, 0, blk.tobytes()))
    return spark.createDataFrame(rows, "tx long, ty long, band long, data binary")


def _collect_dense(df, w, h, ts):
    out = np.zeros((((h + ts - 1) // ts) * ts, ((w + ts - 1) // ts) * ts), np.int64)
    for r in df.collect():
        blk = np.frombuffer(r["data"], np.int64).reshape(ts, ts)
        out[r["ty"] * ts:(r["ty"] + 1) * ts, r["tx"] * ts:(r["tx"] + 1) * ts] = blk
    return out[:h, :w]


@pytest.mark.parametrize("kernel", [
    [[0, 0, 0], [0, 1, 0], [0, 0, 0]],                      # identity
    [[1, 2, 1], [2, 4, 2], [1, 2, 1]],                      # gaussian-ish
    [[0, -1, 0], [-1, 5, -1], [0, -1, 0]],                  # sharpen
    np.arange(25).reshape(5, 5) - 12,                       # 5x5 mixed sign
])
def test_distributed_matches_dense(spark, kernel):
    rng = np.random.default_rng(5)
    h, w, ts = 70, 90, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1), (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    got = _collect_dense(
        convolve_tiles(_tiles_df(spark, arr, ts), gg, kernel, tile_size=ts,
                       dtype=np.uint8),
        w, h, ts,
    )
    assert (got == convolve_dense(arr, kernel)).all()


def test_identity_kernel_is_identity(spark):
    rng = np.random.default_rng(9)
    h, w, ts = 64, 64, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1), (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    got = _collect_dense(
        convolve_tiles(_tiles_df(spark, arr, ts), gg,
                       [[0, 0, 0], [0, 1, 0], [0, 0, 0]], tile_size=ts,
                       dtype=np.uint8),
        w, h, ts,
    )
    assert (got == arr.astype(np.int64)).all()


def test_kernel_validation(spark):
    gg = GridGeometry((0, 0, 63, 63), (1.0, 0.0, 0.0, 0.0, -1.0, 64.0))
    df = _tiles_df(spark, np.zeros((64, 64), np.uint8), 64)
    with pytest.raises(ValueError):
        convolve_tiles(df, gg, [[1, 2], [3, 4]])  # even size
    with pytest.raises(ValueError):
        convolve_tiles(df, gg, np.ones((5, 5)), tile_size=1)  # radius > tile
