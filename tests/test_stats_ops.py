"""Chaikin smoothing, radius of gyration, ANOVA F, BH FDR, AMS F2:
independent Python replicas."""

import hashlib

import numpy as np
from pyspark.sql import functions as F


def _chaikin_once(pts):
    if len(pts) == 1:
        return [(p[0] * 4, p[1] * 4) for p in pts]
    out = [(pts[0][0] * 4, pts[0][1] * 4)]
    for (x, y), (nx, ny) in zip(pts, pts[1:]):
        out.append((3 * x + nx, 3 * y + ny))
        out.append((x + 3 * nx, y + 3 * ny))
    out.append((pts[-1][0] * 4, pts[-1][1] * 4))
    # positions 0, 1..2m-2, 2m-1 — Q/R pairs already interleave correctly
    return out


def test_chaikin_matches_replica(spark):
    from sis_spark.operators.trajectory import chaikin_smooth

    rng = np.random.default_rng(3)
    rows = []
    paths = {}
    for k in range(4):
        m = int(rng.integers(1, 9))
        pts = [(int(a), int(b)) for a, b in rng.integers(-50, 50, (m, 2))]
        paths[k] = pts
        rows += [(k, i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["k", "o", "x", "y"])
    got = {}
    for r in chaikin_smooth(df, rounds=2).collect():
        got.setdefault(r.k, {})[r.pos] = (r.x, r.y)
    for k, pts in paths.items():
        exp = _chaikin_once(_chaikin_once(pts))
        assert [got[k][i] for i in range(len(exp))] == exp
        assert len(got[k]) == len(exp)


def test_radius_gyration_matches_numpy(spark):
    from sis_spark.operators.trajectory import radius_gyration

    rng = np.random.default_rng(9)
    rows = [
        (int(k), int(x), int(y))
        for k, x, y in zip(
            rng.integers(0, 5, 200),
            rng.integers(-1000, 1000, 200),
            rng.integers(-1000, 1000, 200),
        )
    ]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    got = {r.k: (r.n, r.rg2_num) for r in radius_gyration(df).collect()}
    for k in set(r[0] for r in rows):
        p = np.array([(x, y) for kk, x, y in rows if kk == k], dtype=float)
        rg2 = ((p - p.mean(axis=0)) ** 2).sum(axis=1).mean()
        n, num = got[k]
        assert n == len(p)
        assert abs(num / n**2 - rg2) < 1e-6


def test_anova_f_matches_numpy(spark):
    from sis_spark.operators.analytics import anova_f

    rng = np.random.default_rng(11)
    rows = [
        (f"g{int(g)}", int(v + 30 * g))  # real group effect
        for g, v in zip(rng.integers(0, 4, 400), rng.integers(0, 100, 400))
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = anova_f(df, "g", "v").collect()[0]
    vals = {}
    for g, v in rows:
        vals.setdefault(g, []).append(v)
    allv = np.array([v for g, v in rows], dtype=float)
    ssb = sum(len(v) * (np.mean(v) - allv.mean()) ** 2 for v in vals.values())
    ssw = sum(((np.array(v) - np.mean(v)) ** 2).sum() for v in vals.values())
    q = 1024
    assert r.k == len(vals) and r.n == len(rows)
    assert abs(r.ssb_q / q - ssb) < 1.0 and abs(r.ssw_q / q - ssw) < 1.0
    f_exact = (ssb / (r.k - 1)) / (ssw / (r.n - r.k))
    assert abs(r.f_num / r.f_den - f_exact) < 1e-3
    assert f_exact > 10  # the planted effect is detected


def test_fdr_bh_matches_brute(spark):
    from sis_spark.operators.analytics import fdr_bh

    rng = np.random.default_rng(21)
    ps = [int(p) for p in rng.integers(0, 1 << 20, 300)]
    ps[:20] = [int(p) for p in rng.integers(0, 2000, 20)]  # planted signal
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, ["id", "p"])
    got = {r.id: r.reject for r in fdr_bh(df, "id", "p").collect()}

    order = sorted(rows, key=lambda t: (t[1], t[0]))
    n, scale, anum, aden = len(rows), 1 << 20, 5, 100
    kmax = 0
    for i, (_id, p) in enumerate(order, 1):
        if p * n * aden <= anum * i * scale:
            kmax = i
    exp = {t[0]: (i + 1) <= kmax for i, t in enumerate(order)}
    assert got == exp
    assert 0 < sum(got.values()) < n  # rejects some, not all


def test_ams_f2_replay_and_merge(spark):
    from sis_spark.operators.sketches import ams_f2

    rng = np.random.default_rng(5)
    keys = [int(k) for k in rng.integers(0, 40, 500)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r.rep: (r.z, r.z2) for r in ams_f2(df, "key", reps=8).collect()}

    def sign(x, j):
        h = int(hashlib.md5(f"{x}:ams".encode()).hexdigest()[:15], 16)
        return 1 - 2 * ((h >> j) & 1)

    from collections import Counter

    freq = Counter(keys)
    f2 = sum(c * c for c in freq.values())
    for j in range(8):
        z = sum(c * sign(x, j) for x, c in freq.items())
        assert got[j] == (z, z * z)
    est = sum(z2 for _z, z2 in got.values()) / 8
    assert 0.2 * f2 < est < 5 * f2  # unbiased estimator sanity


def test_average_precision_matches_sklearn_style_brute(spark):
    from sis_spark.operators.analytics import average_precision

    rng = np.random.default_rng(31)
    rows = [
        (i, int(s), int(s + rng.integers(0, 800) > 900))
        for i, s in enumerate(rng.integers(0, 1000, 400))
    ]
    df = spark.createDataFrame(rows, ["id", "score", "y"])
    r = average_precision(df, "id", "score", "y").collect()[0]
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    tp, apq, q = 0, 0, 1 << 20
    for k, (_i, _s, y) in enumerate(order, 1):
        tp += y
        if y:
            apq += (q * tp) // k
    npos = sum(y for _i, _s, y in rows)
    assert (r.n, r.npos, r.ap_q) == (len(rows), npos, apq)
    # AP of this correlated labeling beats the positive rate baseline
    assert r.ap_q / (q * npos) > npos / len(rows)


def test_quadrat_vmr_clustered_vs_regular(spark):
    from sis_spark.operators.density import quadrat_vmr

    # regular: one point per cell -> VMR ~ (nq*s - s^2)/(s*(nq-1)) < 1
    reg = [(i, i) for i in range(50)]
    df = spark.createDataFrame(reg, ["qx", "qy"])
    r = quadrat_vmr(df, n_quadrats=100).collect()[0]
    assert r.s == 50 and r.s2 == 50 and r.occupied == 50
    assert r.vmr_num / r.vmr_den < 1.0
    # clustered: all points in one cell -> VMR >> 1
    clu = [(0, 0)] * 50
    df2 = spark.createDataFrame(clu, ["qx", "qy"])
    r2 = quadrat_vmr(df2, n_quadrats=100).collect()[0]
    assert r2.occupied == 1 and r2.vmr_num / r2.vmr_den > 10.0


def test_dict_match_counts_hand_truth(spark):
    from sis_spark.operators.textops import dict_match_counts

    docs = spark.createDataFrame(
        [("aaa bbb aaa",), ("bbb",), ("xyz",), ("aaaa",)], ["text"]
    )
    got = {r.pattern: (r.docs_hit, r.total_occ)
           for r in dict_match_counts(docs, "text", ["aaa", "bbb", "q"]).collect()}
    # 'aaaa' contains ONE non-overlapping 'aaa' (replace semantics)
    assert got == {"aaa": (2, 3), "bbb": (2, 2), "q": (0, 0)}
