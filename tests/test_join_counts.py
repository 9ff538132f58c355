"""join_counts_tiles vs a dense numpy replica (random multi-tile raster)."""

import numpy as np
import pandas as pd


def _dense_counts(img, th):
    b = (img >= th).astype(np.int64)
    bb = ww = bw = 0
    for x, y in ((b[:, :-1], b[:, 1:]), (b[:-1, :], b[1:, :])):
        bb += int((x & y).sum())
        ww += int(((1 - x) & (1 - y)).sum())
        bw += int((x != y).sum())
    return int(b.sum()), int(b.size - b.sum()), bb, ww, bw


def test_join_counts_matches_dense(spark):
    from sis_spark.raster.tiles import join_counts_tiles

    rng = np.random.default_rng(17)
    ts, ntx, nty = 16, 3, 2
    img = rng.integers(0, 256, (nty * ts, ntx * ts)).astype(np.uint8)
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            blk = img[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({"tx": tx, "ty": ty, "band": 0,
                         "data": blk.tobytes()})
    tiles = spark.createDataFrame(pd.DataFrame(rows),
                                  schema="tx long, ty long, band int, data binary")
    r = join_counts_tiles(tiles, thresh=128, tile_size=ts).collect()[0]
    n1, n0, bb, ww, bw = _dense_counts(img, 128)
    assert (r.n1, r.n0, r.bb, r.ww, r.bw) == (n1, n0, bb, ww, bw)
    assert r.m == bb + ww + bw
    # rook adjacency count sanity: m == 2*w*h - w - h
    h, w = img.shape
    assert r.m == 2 * w * h - w - h
