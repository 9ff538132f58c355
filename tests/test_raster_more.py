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


def test_hog_octant_ladder_matches_atan2():
    import math

    from sis_spark.raster.terrain import _hog_octants

    gx, gy = np.meshgrid(np.arange(-25, 26), np.arange(-25, 26))
    got = _hog_octants(gx.astype(np.int64), gy.astype(np.int64))
    for a, b, k in zip(gx.ravel(), gy.ravel(), got.ravel()):
        if a == 0 and b == 0:
            assert k == 0
            continue
        ang = math.degrees(math.atan2(b, a)) % 360.0
        assert k == int(ang // 45) % 8, (a, b)


def test_lbp_tiles_match_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import lbp_tiles

    rng = np.random.default_rng(9)
    h, w, ts = 70, 90, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = lbp_tiles(_tiles_df(spark, arr, ts), gg, tile_size=ts).collect()
    got = {}
    for r in rows:
        got[(r["tx"], r["ty"], r["code"])] = r["n"]
    # the op's fixed raster-scan neighbor order, as (dy, dx)
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 1), (1, -1), (1, 0), (1, 1)]
    want = {}
    a = arr.astype(np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            code = sum(
                (1 << i)
                for i, (dy, dx) in enumerate(offs)
                if a[y + dy, x + dx] >= a[y, x]
            )
            k = (x // ts, y // ts, code)
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_mode_filter_matches_brute(spark):
    from collections import Counter

    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import mode_filter_tiles

    rng = np.random.default_rng(17)
    h, w, ts = 40, 70, 32
    arr = rng.integers(0, 5, (h, w)).astype(np.uint8)  # few values -> ties
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = mode_filter_tiles(_tiles_df(spark, arr, ts), gg,
                             tile_size=ts).collect()
    got = {(r["tx"], r["ty"], r["v"]): r["cnt"] for r in rows}
    want = {}
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            win = arr[y - 1:y + 2, x - 1:x + 2].ravel()
            c = Counter(int(v) for v in win)
            top = max(c.values())
            mode = min(v for v, n in c.items() if n == top)
            k = (x // ts, y // ts, mode)
            want[k] = want.get(k, 0) + 1
    assert got == want


def test_range_filter_matches_brute(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import range_filter_tiles

    rng = np.random.default_rng(6)
    h, w, ts, T = 40, 66, 32, 20
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = range_filter_tiles(_tiles_df(spark, arr, ts), gg, thresh=T,
                              tile_size=ts).collect()
    got = {(r["tx"], r["ty"]): (r["n_px"], r["n_in"], r["v_in_sum"])
           for r in rows}
    a = arr.astype(np.int64)
    want = {}
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            win = a[y - 1:y + 2, x - 1:x + 2].ravel()
            inr = np.abs(win - a[y, x]) <= T
            k = (x // ts, y // ts)
            npx, nin, vin = want.get(k, (0, 0, 0))
            want[k] = (npx + 1, nin + int(inr.sum()),
                       vin + int(win[inr].sum()))
    assert got == want


def test_row_profile_matches_dense(spark):
    from sis_spark.raster.tiles import row_profile

    rng = np.random.default_rng(4)
    h, w, ts = 64, 96, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    rows = row_profile(_tiles_df(spark, arr, ts), tile_size=ts).collect()
    got = {r["y"]: r["vsum"] for r in rows}
    want = arr.astype(np.int64).sum(axis=1)
    assert all(got[y] == int(want[y]) for y in range(h))


def test_clahe_tiles_match_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.tiles import clahe_tiles

    rng = np.random.default_rng(11)
    h, w, ts = 70, 90, 16          # partial edge tiles exercised
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    # bias a corner so clipping actually fires
    arr[:20, :20] = 7
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    L = 4
    rows = clahe_tiles(_tiles_df(spark, arr, ts), gg, clip_limit=L,
                       tile_size=ts).collect()
    got = np.zeros((h, w), np.int64)
    for r in rows:
        blk = np.frombuffer(bytes(r["data"]), np.uint8).reshape(ts, ts)
        y0, x0 = r["ty"] * ts, r["tx"] * ts
        vh, vw = min(ts, h - y0), min(ts, w - x0)
        got[y0:y0 + vh, x0:x0 + vw] = blk[:vh, :vw]

    # dense replay of the spec
    ntx, nty = (w + ts - 1) // ts, (h + ts - 1) // ts
    luts = {}
    for j in range(nty):
        for i in range(ntx):
            blk = arr[j * ts:(j + 1) * ts, i * ts:(i + 1) * ts]
            cnt = np.bincount(blk.ravel(), minlength=256).astype(np.int64)
            exc = int(np.maximum(cnt - L, 0).sum())
            h2 = np.minimum(cnt, L) + exc // 256
            h2[: exc % 256] += 1
            cdf = np.cumsum(h2)
            luts[(i, j)] = cdf * 255 // int(cdf[-1])
    want = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            i0f = (x + ts // 2) // ts - 1
            j0f = (y + ts // 2) // ts - 1
            wx, wy = (x + ts // 2) % ts, (y + ts // 2) % ts
            i0, i1 = max(0, min(ntx - 1, i0f)), max(0, min(ntx - 1, i0f + 1))
            j0, j1 = max(0, min(nty - 1, j0f)), max(0, min(nty - 1, j0f + 1))
            v = int(arr[y, x])
            want[y, x] = (
                (ts - wx) * (ts - wy) * luts[(i0, j0)][v]
                + wx * (ts - wy) * luts[(i1, j0)][v]
                + (ts - wx) * wy * luts[(i0, j1)][v]
                + wx * wy * luts[(i1, j1)][v]
            ) // (ts * ts)
    assert (got == want).all()
    # clipping must have fired somewhere for this to be a CLAHE test
    assert any(int(np.maximum(np.bincount(
        arr[j * ts:(j + 1) * ts, i * ts:(i + 1) * ts].ravel(),
        minlength=256) - L, 0).sum()) > 0
        for i in range(ntx) for j in range(nty))


def test_haar_energy_matches_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.tiles import haar_energy_tiles

    rng = np.random.default_rng(5)
    h, w, ts = 64, 96, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = haar_energy_tiles(_tiles_df(spark, arr, ts), gg,
                             tile_size=ts).collect()
    a = arr.astype(np.int64)
    A, B = a[0::2, 0::2], a[0::2, 1::2]
    C, D = a[1::2, 0::2], a[1::2, 1::2]
    bands = {"e_ll": A + B + C + D, "e_hl": A - B + C - D,
             "e_lh": A + B - C - D, "e_hh": A - B - C + D}
    nb = ts // 2
    for r in rows:
        sy, sx = r["ty"] * nb, r["tx"] * nb
        for k, plane in bands.items():
            want = int((plane[sy:sy + nb, sx:sx + nb].astype(np.int64)
                        ** 2).sum())
            assert r[k] == want
    # Parseval-ish sanity: 4 * sum(x^2 over 2x2) == sum of the 4 band sq
    tot = sum(r["e_ll"] + r["e_hl"] + r["e_lh"] + r["e_hh"] for r in rows)
    assert tot == 4 * int((a * a).sum())


def test_laplacian_energy_matches_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.tiles import laplacian_energy_tiles

    rng = np.random.default_rng(23)
    h, w, ts = 64, 96, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = laplacian_energy_tiles(_tiles_df(spark, arr, ts), gg,
                                  tile_size=ts).collect()
    a = arr.astype(np.int64)
    up = np.repeat(np.repeat(a[0::2, 0::2], 2, 0), 2, 1)
    L = a - up
    for r in rows:
        sy, sx = r["ty"] * ts, r["tx"] * ts
        blk = L[sy:sy + ts, sx:sx + ts]
        assert r["sum_abs"] == int(np.abs(blk).sum())
        assert r["sum_sq"] == int((blk * blk).sum())
    # a constant image has zero detail energy
    flat = np.full((32, 32), 77, np.uint8)
    gg2 = GridGeometry((0, 0, 31, 31), (1.0, 0.0, 0.0, 0.0, -1.0, 32.0))
    (r2,) = laplacian_energy_tiles(_tiles_df(spark, flat, 32), gg2,
                                   tile_size=32).collect()
    assert r2["sum_abs"] == 0 and r2["sum_sq"] == 0


def test_brovey_matches_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.tiles import brovey_tiles

    rng = np.random.default_rng(29)
    h, w, ts = 32, 64, 32
    bands = [rng.integers(0, 256, (h, w)).astype(np.uint8)
             for _ in range(3)]
    pan = rng.integers(0, 256, (h, w)).astype(np.uint8)
    rows = []
    for ty in range(h // ts):
        for tx in range(w // ts):
            for b in range(3):
                rows.append((tx, ty, b,
                             bands[b][ty * ts:(ty + 1) * ts,
                                      tx * ts:(tx + 1) * ts].tobytes()))
    ms = spark.createDataFrame(rows, "tx long, ty long, band int, data binary")
    ptiles = spark.createDataFrame(
        [(tx, ty, 0, pan[ty * ts:(ty + 1) * ts,
                         tx * ts:(tx + 1) * ts].tobytes())
         for ty in range(h // ts) for tx in range(w // ts)],
        "tx long, ty long, band int, data binary")
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    out = brovey_tiles(ms, ptiles, gg, tile_size=ts).collect()
    tot = np.maximum(sum(b.astype(np.int64) for b in bands), 1)
    for r in out:
        sy, sx = r["ty"] * ts, r["tx"] * ts
        want = np.minimum(
            pan[sy:sy + ts, sx:sx + ts].astype(np.int64)
            * bands[r["band"]][sy:sy + ts, sx:sx + ts] * 3
            // tot[sy:sy + ts, sx:sx + ts], 255)
        got = np.frombuffer(bytes(r["data"]), np.uint8).reshape(ts, ts)
        assert (got == want).all()


def test_demosaic_matches_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import demosaic_tiles

    rng = np.random.default_rng(31)
    h, w, ts = 48, 64, 16
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = demosaic_tiles(_tiles_df(spark, arr, ts), gg,
                          tile_size=ts).collect()
    planes = {b: np.zeros((h, w), np.int64) for b in range(3)}
    for r in rows:
        blk = np.frombuffer(bytes(r["data"]), "<u2").reshape(ts, ts)
        planes[r["band"]][r["ty"] * ts:(r["ty"] + 1) * ts,
                          r["tx"] * ts:(r["tx"] + 1) * ts] = blk
    a = arr.astype(np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            m = a[y, x]
            edges = a[y - 1, x] + a[y + 1, x] + a[y, x - 1] + a[y, x + 1]
            diags = (a[y - 1, x - 1] + a[y - 1, x + 1]
                     + a[y + 1, x - 1] + a[y + 1, x + 1])
            ns = a[y - 1, x] + a[y + 1, x]
            ew = a[y, x - 1] + a[y, x + 1]
            ex, ey = x % 2 == 0, y % 2 == 0
            if ex and ey:
                want = (4 * m, edges, diags)
            elif not ex and ey:
                want = (2 * ew, 4 * m, 2 * ns)
            elif ex and not ey:
                want = (2 * ns, 4 * m, 2 * ew)
            else:
                want = (diags, edges, 4 * m)
            got = (planes[0][y, x], planes[1][y, x], planes[2][y, x])
            assert got == want, (x, y, got, want)
    # border pixels are zeroed
    assert planes[0][0, :].sum() == 0 and planes[2][:, -1].sum() == 0


def test_bilateral_tiles_match_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import bilateral_tiles

    rng = np.random.default_rng(9)
    h, w, ts = 70, 95, 32
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = bilateral_tiles(_tiles_df(spark, arr, ts), gg,
                           tile_size=ts).collect()
    got = np.zeros(((h + ts - 1) // ts * ts, (w + ts - 1) // ts * ts),
                   np.int64)
    for r in rows:
        got[r["ty"] * ts:(r["ty"] + 1) * ts,
            r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
                r["data"], np.int64).reshape(ts, ts)

    pad = np.zeros((h + 4, w + 4), np.int64)
    pad[2:-2, 2:-2] = arr
    num = np.zeros((h, w), np.int64)
    den = np.zeros((h, w), np.int64)
    v0 = pad[2:-2, 2:-2]
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nb = pad[2 + dy:2 + dy + h, 2 + dx:2 + dx + w]
            sw = (3 - abs(dx)) * (3 - abs(dy))
            rw = np.maximum(0, 32 - np.abs(nb - v0) // 4)
            num += sw * rw * nb
            den += sw * rw
    want = num // den
    assert (got[:h, :w] == want).all()
    # edge preservation sanity: a hard step stays a hard step
    step = np.zeros((20, 40), np.uint8)
    step[:, 20:] = 200
    gg2 = GridGeometry((0, 0, 39, 19), (1.0, 0.0, 0.0, 0.0, -1.0, 20.0))
    rows2 = bilateral_tiles(_tiles_df(spark, step, 64), gg2,
                            tile_size=64).collect()
    out2 = np.frombuffer(rows2[0]["data"], np.int64).reshape(64, 64)
    assert out2[10, 10] < 10 and out2[10, 30] > 190


def test_adaptive_threshold_matches_dense(spark):
    from sis_spark.raster.grid import GridGeometry
    from sis_spark.raster.terrain import adaptive_threshold_tiles

    rng = np.random.default_rng(17)
    h, w, ts, r = 50, 90, 32, 4
    arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    gg = GridGeometry((0, 0, w - 1, h - 1),
                      (1.0, 0.0, 0.0, 0.0, -1.0, float(h)))
    rows = adaptive_threshold_tiles(_tiles_df(spark, arr, ts), gg,
                                    radius=r, t_pct=15,
                                    tile_size=ts).collect()
    got = np.zeros(((h + ts - 1) // ts * ts, (w + ts - 1) // ts * ts),
                   np.int64)
    for row in rows:
        got[row["ty"] * ts:(row["ty"] + 1) * ts,
            row["tx"] * ts:(row["tx"] + 1) * ts] = np.frombuffer(
                row["data"], np.int64).reshape(ts, ts)
    v = arr.astype(np.int64)
    for y in range(h):
        for x in range(w):
            y0, y1 = max(y - r, 0), min(y + r, h - 1)
            x0, x1 = max(x - r, 0), min(x + r, w - 1)
            s = int(v[y0:y1 + 1, x0:x1 + 1].sum())
            cnt = (y1 - y0 + 1) * (x1 - x0 + 1)
            want = 255 if v[y, x] * cnt * 100 >= s * 85 else 0
            assert got[y, x] == want, (x, y)
