"""Second-wave exact raster analytics: image moments (and later texture
operators) — distributed tile partials vs dense numpy differentials."""

import numpy as np


def _tiles_df(spark, arr, ts):
    h, w = arr.shape
    rows = []
    for ty in range((h + ts - 1) // ts):
        for tx in range((w + ts - 1) // ts):
            blk = np.zeros((ts, ts), arr.dtype)
            src = arr[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            blk[: src.shape[0], : src.shape[1]] = src
            rows.append((tx, ty, 0, blk.tobytes()))
    return spark.createDataFrame(rows, "tx long, ty long, band long, data binary")


def test_moments_tiles_match_dense(spark):
    from sis_spark.raster.tiles import moments_tiles

    rng = np.random.default_rng(3)
    h, w, ts = 64, 128, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    rows = moments_tiles(_tiles_df(spark, arr, ts), tile_size=ts).collect()
    # tile partials ADD to the whole-image raw moments
    X, Y = np.meshgrid(np.arange(w, dtype=np.int64),
                       np.arange(h, dtype=np.int64))
    v = arr.astype(np.int64)
    want = {
        "m00": int(v.sum()), "m10": int((X * v).sum()),
        "m01": int((Y * v).sum()), "m11": int((X * Y * v).sum()),
        "m20": int((X * X * v).sum()), "m02": int((Y * Y * v).sum()),
    }
    for k, expect in want.items():
        assert sum(r[k] for r in rows) == expect
    # per-tile m00 is the plain block sum
    for r in rows:
        blk = arr[r["ty"] * ts:(r["ty"] + 1) * ts,
                  r["tx"] * ts:(r["tx"] + 1) * ts].astype(np.int64)
        assert r["m00"] == int(blk.sum())
