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


def test_census_tiles_matches_dense(spark):
    import pandas as pd

    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import census_tiles

    rng = np.random.default_rng(4)
    ts, W, H = 16, 40, 30  # partial tiles on both axes
    img = rng.integers(0, 256, (H, W)).astype(np.uint8)
    ntx, nty = (W + ts - 1) // ts, (H + ts - 1) // ts
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            blk = np.zeros((ts, ts), np.uint8)
            sub = img[ty * ts:min((ty + 1) * ts, H),
                      tx * ts:min((tx + 1) * ts, W)]
            blk[:sub.shape[0], :sub.shape[1]] = sub
            rows.append({"tx": tx, "ty": ty, "band": 0, "data": blk.tobytes()})
    tiles = spark.createDataFrame(
        pd.DataFrame(rows), schema="tx long, ty long, band int, data binary")
    gg = GridGeometry((0, 0, W - 1, H - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(H)))
    got = {}
    for r in census_tiles(tiles, gg, tile_size=ts).collect():
        got[(r.tx, r.ty)] = np.frombuffer(r.data, np.int64).reshape(ts, ts)

    pad = np.zeros((H + 2, W + 2), np.int64)
    pad[1:-1, 1:-1] = img
    exp = np.zeros((H, W), np.int64)
    bit = 0
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            exp |= (pad[dy:dy + H, dx:dx + W] > img).astype(np.int64) << bit
            bit += 1
    for (tx, ty), blk in got.items():
        sub = exp[ty * ts:min((ty + 1) * ts, H), tx * ts:min((tx + 1) * ts, W)]
        assert (blk[:sub.shape[0], :sub.shape[1]] == sub).all()
        assert blk[sub.shape[0]:, :].sum() == 0 and blk[:, sub.shape[1]:].sum() == 0


def test_hamming_join_bands_equals_brute(spark):
    from sis_spark.operators.imageops import hamming_join_bands

    rng = np.random.default_rng(6)
    a = [(i, int(c)) for i, c in enumerate(rng.integers(0, 1 << 48, 80))]
    # b: half perturbed copies of a (few bit flips), half fresh
    b = []
    for i, c in a[:40]:
        flips = rng.integers(0, 48, rng.integers(0, 5))
        c2 = c
        for f in flips:
            c2 ^= 1 << int(f)
        b.append((1000 + i, int(c2)))
    b += [(2000 + i, int(c)) for i, c in
          enumerate(rng.integers(0, 1 << 48, 40))]
    da = spark.createDataFrame(a, ["id", "desc"])
    db = spark.createDataFrame(b, ["id", "desc"])
    got = {(r.a_id, r.b_id, r.d)
           for r in hamming_join_bands(da, db, bits=48, band_bits=8,
                                       max_d=5).collect()}
    exp = set()
    for i, c in a:
        for j, c2 in b:
            d = bin(c ^ c2).count("1")
            if d <= 5:
                exp.add((i, j, d))
    assert got == exp and exp


def test_brief_descriptors_margin_and_determinism(spark):
    import pandas as pd

    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import brief_descriptors_tiles

    rng = np.random.default_rng(2)
    ts, W, H = 32, 96, 64
    img = rng.integers(0, 256, (H, W)).astype(np.uint8)
    rows = []
    for ty in range(H // ts):
        for tx in range(W // ts):
            blk = img[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({"tx": tx, "ty": ty, "band": 0,
                         "data": blk.tobytes()})
    tiles = spark.createDataFrame(
        pd.DataFrame(rows), schema="tx long, ty long, band int, data binary")
    gg = GridGeometry((0, 0, W - 1, H - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(H)))
    got = {(r.kx, r.ky): r.desc
           for r in brief_descriptors_tiles(
               tiles, gg, step=16, margin=8, tile_size=ts).collect()}
    # keypoints: multiples of 16 with margin 8 from every edge
    assert set(got) == {(kx, ky) for kx in (16, 32, 48, 64, 80)
                        for ky in (16, 32, 48) if kx < 88 and ky < 56}
    from sis_spark.raster.terrain import BRIEF_PAIRS

    for (kx, ky), desc in got.items():
        exp = 0
        for bi, (dx1, dy1, dx2, dy2) in enumerate(BRIEF_PAIRS):
            if int(img[ky + dy1, kx + dx1]) > int(img[ky + dy2, kx + dx2]):
                exp |= 1 << bi
        assert desc == exp
