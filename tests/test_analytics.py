"""Product analytics: skyline vs brute dominance, funnel ordering edges,
retention bucket law."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.analytics import funnel, retention, skyline2d


def test_skyline_matches_brute(spark):
    rng = np.random.RandomState(13)
    pts = [(i, int(x), int(y)) for i, (x, y) in
           enumerate(rng.randint(0, 50, size=(300, 2)))]
    df = spark.createDataFrame(pts, "id long, x long, y long").repartition(7)
    got = sorted(r["id"] for r in skyline2d(df, "x", "y").collect())
    want = sorted(
        i for i, x, y in pts
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y) for _, qx, qy in pts
        )
    )
    assert got == want


def test_skyline_keeps_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 10, 10), (2, 10, 10), (3, 5, 5)], "id long, x long, y long"
    )
    got = sorted(r["id"] for r in skyline2d(df, "x", "y").collect())
    assert got == [1, 2]


def test_funnel_strictly_after(spark):
    rows = [
        # user 1 completes in order; user 2 has B BEFORE A (no conversion);
        # user 3 ties A and B at the same ts (strict > excludes the tie)
        (1, 0, 100), (1, 1, 200), (1, 2, 300),
        (2, 1, 50), (2, 0, 100), (2, 2, 200),
        (3, 0, 100), (3, 1, 100),
    ]
    df = spark.createDataFrame(rows, "user_id long, stage long, ts_us long")
    got = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
           for r in funnel(df, "stage", (0, 1, 2)).collect()}
    assert got[1] == (100, 200, 300)
    assert got[2] == (100, None, 200) or got[2][1] is None  # B never after A
    assert got[3] == (100, None, None)


def test_retention_counts(spark):
    rows = [
        (1, 0), (1, 7), (1, 14),     # cohort wk0, active wk 0,1,2
        (2, 3), (2, 10),             # cohort wk0, active wk 0,1
        (3, 8), (3, 22),             # cohort wk1, active wk 1,3
    ]
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention(df).collect()}
    assert got == {(0, 0): 2, (0, 1): 2, (0, 2): 1, (1, 0): 1, (1, 2): 1}


def test_robust_outliers_matches_python(spark):
    import numpy as np

    from sis_spark.operators.analytics import robust_outliers

    rng = np.random.RandomState(61)
    rows = []
    for g in ("a", "b"):
        base = rng.randint(100, 200, size=40).tolist()
        rows += [(g, int(v)) for v in base]
        rows += [(g, 10_000), (g, -5_000)]  # planted outliers
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in robust_outliers(df, "g", "x").collect()}
    for g in ("a", "b"):
        xs = sorted(x for gg, x in rows if gg == g)
        med = xs[(len(xs) - 1) // 2]
        dvs = sorted(abs(x - med) for x in xs)
        mad = dvs[(len(dvs) - 1) // 2]
        outs = [x for x in xs if 2 * abs(x - med) > 7 * mad]
        assert got[g]["med"] == med and got[g]["mad"] == mad
        assert got[g]["n_outliers"] == len(outs)
        assert got[g]["outlier_sum"] == sum(outs)
        assert got[g]["n_outliers"] >= 2  # the planted ones are caught


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    import numpy as np

    from sis_spark.operators.analytics import theil_sen

    rng = np.random.default_rng(8)
    rows, series = [], {}
    for k in range(4):
        ys = (7 * np.arange(15) + rng.integers(-30, 30, 15)).tolist()
        series[k] = ys
        rows += [(k, t, int(y)) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    got = {r.k: r for r in theil_sen(df, "k", "t", "y", cap=25).collect()}
    for k, ys in series.items():
        slopes = sorted(
            ((ys[j] - ys[i]) / (j - i), ys[j] - ys[i], j - i, i + 1)
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        q, dy, dx, _ = slopes[(len(slopes) - 1) // 2]
        r = got[k]
        assert (r.dy, r.dx) == (dy, dx)
        assert r.n_pairs == len(slopes)
        # a noisy slope-7 line: the robust estimate is near 7
        assert 5.0 < r.slope_q / 1e6 < 9.0


def test_ols_trend_exact_rational(spark):
    import numpy as np

    from sis_spark.operators.analytics import ols_trend

    rng = np.random.default_rng(12)
    rows, series = [], {}
    for k in range(3):
        ys = (5 * np.arange(1, 13) + rng.integers(-9, 9, 12)).tolist()
        series[k] = ys
        rows += [(k, t, int(y)) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    got = {r.k: r for r in ols_trend(df, "k", "t", "y").collect()}
    for k, ys in series.items():
        t = np.arange(1, len(ys) + 1, dtype=np.int64)
        y = np.asarray(ys, np.int64)
        n = len(ys)
        num = n * int((t * y).sum()) - int(t.sum()) * int(y.sum())
        den = n * int((t * t).sum()) - int(t.sum()) ** 2
        r = got[k]
        assert (r.slope_num, r.slope_den) == (num, den)
        # against numpy lstsq
        m, b = np.polyfit(t.astype(float), y.astype(float), 1)
        assert abs(num / den - m) < 1e-9
        assert abs(r.icept_num / r.icept_den - b) < 1e-9


def test_rank_sum_u_matches_scipy_formula(spark):
    import numpy as np

    from sis_spark.operators.analytics import rank_sum_u

    rng = np.random.default_rng(14)
    g1 = rng.integers(0, 20, 15)  # small range forces ties
    g2 = rng.integers(5, 25, 12)
    rows = [(0, 1, int(v)) for v in g1] + [(0, 0, int(v)) for v in g2]
    df = spark.createDataFrame(rows, ["k", "g", "y"])
    (r,) = rank_sum_u(df, "k", "g", "y").collect()
    # brute: average ranks over the combined sample
    allv = sorted(list(g1) + list(g2))
    import collections
    first = {}
    cnt = collections.Counter(allv)
    pos = 1
    for v in sorted(cnt):
        first[v] = pos
        pos += cnt[v]
    avg2 = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}  # 2 * average rank
    r1_2 = sum(avg2[v] for v in g1)
    u1_2 = r1_2 - len(g1) * (len(g1) + 1)
    assert (r.n1, r.n2, r.r1_2, r.u1_2) == (len(g1), len(g2), r1_2, u1_2)
    # U1 + U2 = n1*n2 (tie-corrected identity, doubled)
    r2_2 = sum(avg2[v] for v in g2)
    u2_2 = r2_2 - len(g2) * (len(g2) + 1)
    assert u1_2 + u2_2 == 2 * len(g1) * len(g2)


def test_group_mode_tie_breaks_smallest(spark):
    from sis_spark.operators.analytics import group_mode

    rows = [(0, 5), (0, 5), (0, 3), (0, 3), (0, 9)]
    df = spark.createDataFrame(rows, ["k", "v"])
    (r,) = group_mode(df, "k", "v").collect()
    assert (r.mode, r.n_mode) == (3, 2)


def test_weighted_median_reference(spark):
    from sis_spark.operators.analytics import weighted_median

    rows = [(0, 10, 1), (0, 20, 5), (0, 30, 1),  # weight mass at 20
            (1, 1, 1), (1, 2, 1), (1, 3, 1), (1, 4, 1)]  # even: lower median
    df = spark.createDataFrame(rows, ["k", "v", "w"])
    got = {r.k: (r.wmed, r.w_total) for r in weighted_median(df, "k", "v", "w").collect()}
    assert got[0] == (20, 7)
    assert got[1] == (2, 4)  # 2*cumw(2)=4 >= 4: lower median


def test_rle_and_scd2_consistency(spark):
    from sis_spark.operators.analytics import rle_segments, scd2_intervals

    seq = ["a", "a", "b", "b", "b", "a", "c", "c"]
    rows = [(1, t, s) for t, s in enumerate(seq)]
    df = spark.createDataFrame(rows, ["k", "t", "st"])
    segs = sorted(
        (r.seg, r.state, r.o_start, r.o_end, r.run_len)
        for r in rle_segments(df, "k", "t", "st").collect()
    )
    assert segs == [(1, "a", 0, 1, 2), (2, "b", 2, 4, 3),
                    (3, "a", 5, 5, 1), (4, "c", 6, 7, 2)]
    vers = sorted(
        (r.valid_from, r.valid_to, r.event_type if hasattr(r, "event_type") else r.st, r.is_current)
        for r in scd2_intervals(df, "k", "t", ["st"]).collect()
    )
    assert vers == [(0, 2, "a", False), (2, 5, "b", False),
                    (5, 6, "a", False), (6, None, "c", True)]
    # every SCD2 version spans exactly one RLE run
    assert len(vers) == len(segs)


def test_corr_moments_matches_numpy(spark):
    import numpy as np

    from sis_spark.operators.analytics import corr_moments

    rng = np.random.default_rng(19)
    x = rng.integers(0, 100, 40)
    y = 3 * x + rng.integers(-20, 20, 40)
    rows = [(0, int(a), int(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    (r,) = corr_moments(df, "k", "x", "y").collect()
    ref = np.corrcoef(x, y)[0, 1]
    assert abs(r.corr_q / 1e6 - ref) < 1e-5
    n = len(x)
    assert r.cov_n2 == n * int((x * y).sum()) - int(x.sum()) * int(y.sum())


def test_gini_extremes(spark):
    from sis_spark.operators.analytics import gini

    rows_eq = [(0, 10, i) for i in range(8)]           # perfect equality
    rows_con = [(1, 0, i) for i in range(7)] + [(1, 100, 7)]  # all in one hand
    df = spark.createDataFrame(rows_eq + rows_con, ["k", "v", "i"])
    got = {r.k: (r.gini_num, r.gini_den) for r in gini(df, "k", "v", "i").collect()}
    assert got[0][0] == 0                              # G = 0
    num, den = got[1]
    assert num / den == (8 - 1) / 8                    # G = (n-1)/n


def test_sparse_matmul_matches_numpy(spark):
    import numpy as np

    from sis_spark.operators.embeddings import sparse_matmul

    rng = np.random.default_rng(23)
    A = rng.integers(0, 5, (6, 7))
    B = rng.integers(0, 5, (7, 4))
    a_rows = [(i, k, int(A[i, k])) for i in range(6) for k in range(7) if A[i, k]]
    b_rows = [(k, j, int(B[k, j])) for k in range(7) for j in range(4) if B[k, j]]
    a = spark.createDataFrame(a_rows, ["i", "k", "v"])
    b = spark.createDataFrame(b_rows, ["k", "j", "w"])
    got = {(r.i, r.j): r.v for r in sparse_matmul(a, b).collect()}
    C = A @ B
    exp = {(i, j): int(C[i, j]) for i in range(6) for j in range(4) if C[i, j]}
    assert got == exp


def test_kendall_and_spearman_against_scipy_formulas(spark):
    import numpy as np

    from sis_spark.operators.analytics import kendall_tau, spearman_rho

    rng = np.random.default_rng(27)
    x = rng.integers(0, 30, 20)  # ties present
    y = x + rng.integers(-5, 5, 20)
    rows = [(0, t, int(a), int(b)) for t, (a, b) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])

    (r,) = kendall_tau(
        df.select("k", "t", F.col("y").alias("cents")), "k", "t", "cents", cap=25
    ).collect()
    nc = nd = nt = 0
    for i in range(20):
        for j in range(i + 1, 20):
            d = y[j] - y[i]
            nc += d > 0
            nd += d < 0
            nt += d == 0
    assert (r.n_pairs, r.nc, r.nd, r.n_tie) == (190, nc, nd, nt)

    (s,) = spearman_rho(df, "k", "x", "y").collect()
    # scipy-equivalent: Pearson of average ranks
    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), float)
        sv = np.sort(v)
        first = {}
        for idx, val in enumerate(sv):
            first.setdefault(val, idx + 1)
        cnt = {val: int((sv == val).sum()) for val in set(v.tolist())}
        for i, val in enumerate(v):
            ranks[i] = first[val] + (cnt[val] - 1) / 2
        return ranks
    rx, ry = avg_ranks(x), avg_ranks(y)
    ref = np.corrcoef(rx, ry)[0, 1]
    assert abs(s.corr_q / 1e6 - ref) < 1e-5


def test_chi2_contingency_against_scipy_formula(spark):
    import numpy as np

    from sis_spark.operators.analytics import chi2_contingency

    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10
        + [("b", "x")] * 15 + [("b", "y")] * 25
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = chi2_contingency(df, "r", "c").collect()
    O = {("a", "x"): 30, ("a", "y"): 10, ("b", "x"): 15, ("b", "y"): 25}
    N = 80
    R = {"a": 40, "b": 40}
    C = {"x": 45, "y": 35}
    total = 0.0
    for rr in out:
        e = R[rr.row_v] * C[rr.col_v] / N
        ref = (O[(rr.row_v, rr.col_v)] - e) ** 2 / e
        assert abs(rr.contrib_q / 1e6 - ref) < 1e-4
        total += ref
    # matches the textbook chi2 for this table
    assert abs(total - sum(
        (O[(r_, c_)] - R[r_] * C[c_] / N) ** 2 / (R[r_] * C[c_] / N)
        for r_ in "ab" for c_ in "xy") ) < 1e-9


def test_decision_stump_matches_brute(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(k), int(x), int(y))
        for k, x, y in zip(
            rng.randint(0, 3, 200),
            rng.randint(0, 12, 200),
            rng.randint(0, 2, 200),
        )
    ]
    from sis_spark.operators.analytics import decision_stump

    df = spark.createDataFrame(rows, "k long, x long, y long").repartition(5)
    got = {r["k"]: r for r in decision_stump(df, "k", "x", "y").collect()}
    for k in sorted({r[0] for r in rows}):
        pts = sorted((x, y) for kk, x, y in rows if kk == k)
        n = len(pts)
        best = None
        for thr in sorted({x for x, _ in pts}):
            left = [(x, y) for x, y in pts if x <= thr]
            nl = len(left)
            if nl == n:
                continue
            nlp = sum(y for _, y in left)
            npos = sum(y for _, y in pts)
            nr, nrp = n - nl, npos - nlp
            num = (nlp**2 + (nl - nlp) ** 2) * nr + (
                nrp**2 + (nr - nrp) ** 2
            ) * nl
            den = nl * nr
            key = (-(num / den), thr)
            if best is None or key < best[0]:
                best = (key, thr, nl, nlp, num, den)
        _, thr, nl, nlp, num, den = best
        r = got[k]
        assert (r["thr"], r["nl"], r["nl_pos"]) == (thr, nl, nlp)
        assert (r["score_num"], r["score_den"]) == (num, den)


def test_assoc_rules_counts(spark):
    from sis_spark.operators.analytics import assoc_rules

    baskets = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "b"),  # dup item collapses
        (4, "c"),
    ]
    df = spark.createDataFrame(baskets, "bk long, it string")
    got = {
        (r["a"], r["b"]): r
        for r in assoc_rules(df, "bk", "it", min_support=2).collect()
    }
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"]) == (3, 3, 3, 4)


def test_markov_transitions_counts(spark):
    from sis_spark.operators.analytics import markov_transitions

    seq = [
        (1, 0, "x"), (1, 1, "y"), (1, 2, "x"),
        (2, 0, "x"), (2, 1, "x"),
    ]
    df = spark.createDataFrame(seq, "k long, o long, st string")
    got = {
        (r["from_state"], r["to_state"]): (r["n_trans"], r["n_from"])
        for r in markov_transitions(df, "k", "o", "st").collect()
    }
    # n_from counts OUTGOING transitions (last row of each key has none)
    assert got == {
        ("x", "y"): (1, 2),
        ("y", "x"): (1, 1),
        ("x", "x"): (1, 2),
    }


def test_kaplan_meier_life_table(spark):
    import math

    from sis_spark.operators.analytics import kaplan_meier

    # (t, e): e=1 death, e=0 censored
    rows = [(1, 1), (1, 1), (2, 0), (3, 1), (4, 0), (5, 1), (5, 0)]
    df = spark.createDataFrame(rows, "t long, e long")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "e").collect()}
    assert sorted(got) == [1, 3, 5]  # only event times
    assert (got[1]["n_risk"], got[1]["d"], got[1]["c"]) == (7, 2, 0)
    assert (got[3]["n_risk"], got[3]["d"]) == (4, 1)
    assert (got[5]["n_risk"], got[5]["d"], got[5]["c"]) == (2, 1, 1)
    # survival curve ~ product of (1 - d/n): S(3) = (5/7)*(3/4)
    s3 = math.exp(got[3]["log_s_q"] / 1e9)
    assert abs(s3 - (5 / 7) * (3 / 4)) < 1e-6


def test_lcs_diag_matches_dense(spark):
    from sis_spark.operators.textops import _lcs_diag, lcs_dense

    rng = np.random.RandomState(11)
    for _ in range(40):
        na, nb = rng.randint(1, 25), rng.randint(1, 25)
        a = rng.randint(0, 4, na)
        b = rng.randint(0, 4, nb)
        assert _lcs_diag(a, b) == lcs_dense(list(a), list(b))


def test_lcs_join_spark(spark):
    from sis_spark.operators.textops import lcs_dense, lcs_join

    seq = {0: [1, 2, 3, 1, 2], 1: [2, 3, 1], 2: [3, 3, 3, 3], 3: [1, 2]}
    rows = [(k, o, t) for k, toks in seq.items() for o, t in enumerate(toks)]
    seqs = spark.createDataFrame(rows, "k long, o long, tok long").repartition(3)
    pairs = spark.createDataFrame([(0, 1), (2, 3), (0, 2)], "a long, b long")
    got = {(r["a"], r["b"]): r["lcs"] for r in lcs_join(seqs, pairs).collect()}
    assert got == {
        (a, b): lcs_dense(seq[a], seq[b]) for a, b in [(0, 1), (2, 3), (0, 2)]
    }


def test_holt_int_negative_floor(spark):
    from sis_spark.operators.timeseries import holt_int

    xs = [-50, 13, 2, 17, -42, 25]
    rows = [(1, i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, x long")
    got = holt_int(df, 1, 4, 1, 8).orderBy("rn").collect()
    l, b = xs[0], 0
    for t in range(1, len(xs)):
        lp = l
        l = int(np.floor_divide(xs[t] + 3 * (l + b), 4))
        b = int(np.floor_divide((l - lp) + 7 * b, 8))
        assert (got[t]["l"], got[t]["b"]) == (l, b)


def test_roc_points_counts(spark):
    from sis_spark.operators.analytics import roc_points

    rows = [(3, 1), (3, 0), (2, 1), (1, 0), (1, 0), (1, 1)]
    df = spark.createDataFrame(rows, "s long, y long")
    got = {r["thr"]: r for r in roc_points(df, "s", "y").collect()}
    assert (got[3]["tp"], got[3]["fp"], got[3]["fn"], got[3]["tn"]) == (1, 1, 2, 2)
    assert (got[2]["tp"], got[2]["fp"]) == (2, 1)
    assert (got[1]["tp"], got[1]["fp"], got[1]["fn"], got[1]["tn"]) == (3, 3, 0, 0)


def test_seq_patterns_window(spark):
    from sis_spark.operators.analytics import seq_patterns

    # key 1: a b a c   (gap 2: ab, aa, ba, bc, ac);  key 2: c a
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
            (2, 0, "c"), (2, 1, "a")]
    df = spark.createDataFrame(rows, "k long, o long, it string")
    got = {(r["s1"], r["s2"]): (r["n_occ"], r["n_keys"])
           for r in seq_patterns(df, "k", "o", "it", max_gap=2).collect()}
    assert got == {
        ("a", "b"): (1, 1), ("a", "a"): (1, 1), ("b", "a"): (1, 1),
        ("b", "c"): (1, 1), ("a", "c"): (1, 1), ("c", "a"): (1, 1),
    }


def test_cohens_kappa_formula(spark):
    from sis_spark.operators.analytics import cohens_kappa

    rows = [(0, 0), (0, 0), (0, 1), (1, 1), (1, 1), (1, 0), (2, 2)]
    df = spark.createDataFrame(rows, "a long, b long")
    (r,) = cohens_kappa(df, "a", "b").collect()
    n, agree = 7, 5
    # marginals a: {0:3,1:3,2:1}; b: {0:3,1:3,2:1} -> pe_num = 9+9+1
    assert (r["n"], r["agree"], r["pe_num"]) == (n, agree, 19)
    kappa = (agree * n - 19) / (n * n - 19)
    assert abs(kappa - (5 / 7 - 19 / 49) / (1 - 19 / 49)) < 1e-12


def test_class_prf_counts(spark):
    from sis_spark.operators.analytics import class_prf

    rows = [(0, 0), (0, 1), (1, 1), (1, 1), (2, 1), (3, 9)]  # 9 never predicted? actually 3 predicted, act 9
    df = spark.createDataFrame(rows, "pred long, act long")
    got = {r["cls"]: (r["tp"], r["fp"], r["fn"], r["support"])
           for r in class_prf(df, "pred", "act").collect()}
    assert got[0] == (1, 1, 0, 1)
    assert got[1] == (2, 0, 2, 4)
    assert got[2] == (0, 1, 0, 0)   # predicted only
    assert got[9] == (0, 0, 1, 1)   # actual only
    assert got[3] == (0, 1, 0, 0)


def test_mutual_info_independent_and_dependent(spark):
    import math

    from sis_spark.operators.analytics import mutual_info

    # perfectly dependent: b == a -> MI == H(A)
    rows = [(i % 3, i % 3) for i in range(90)]
    df = spark.createDataFrame(rows, "a long, b long")
    (r,) = mutual_info(df, "a", "b").collect()
    h = math.log(3)
    assert abs(r["mi_q"] / 1e9 - h) < 1e-6
    assert abs(r["ha_q"] / 1e9 - h) < 1e-6
    # independent: uniform product distribution -> MI == 0 (each cell ln 1)
    rows = [(i % 3, (i // 3) % 4) for i in range(120)]
    df = spark.createDataFrame(rows, "a long, b long")
    (r,) = mutual_info(df, "a", "b").collect()
    assert r["mi_q"] == 0


def test_cum_distinct_running(spark):
    from sis_spark.operators.analytics import cum_distinct

    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
            (2, 0, "x"), (2, 1, "x")]
    df = spark.createDataFrame(rows, "k long, o long, v string")
    got = {(r["k"], r["o"]): r["n_distinct"]
           for r in cum_distinct(df, "k", "o", "v").collect()}
    assert got == {(1, 0): 1, (1, 1): 2, (1, 2): 2, (1, 3): 3,
                   (2, 0): 1, (2, 1): 1}


def test_first_touch_attribution(spark):
    from sis_spark.operators.analytics import first_touch_attribution

    rows = [
        # user 1: session A (view first, converts), session B (click, no)
        (1, 0, 1, "view"), (1, 100, 2, "purchase"),
        (1, 10_000, 3, "click"), (1, 10_050, 4, "view"),
        # user 2: single session, purchase-first (self-converting)
        (2, 0, 5, "purchase"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, i long, ch string")
    got = {r["channel"]: (r["n_sessions"], r["n_converted"])
           for r in first_touch_attribution(df, "u", "t", "i", "ch",
                                            "purchase", gap_s=1800).collect()}
    assert got == {"view": (1, 1), "click": (1, 0), "purchase": (1, 1)}


def test_rfm_scores_quartiles(spark):
    from sis_spark.operators.analytics import rfm_scores

    rows = [(c, d, 100 * (c + 1)) for c in range(8) for d in range(c + 1)]
    df = spark.createDataFrame(rows, "c long, day long, amt long")
    got = {r["c"]: r for r in rfm_scores(df, "c", "day", "amt").collect()}
    # customer 7 has most orders, highest monetary, latest day -> bucket 1
    assert got[7]["f_score"] == 1 and got[7]["m_score"] == 1 and got[7]["r_score"] == 1
    assert got[0]["f_score"] == 4 and got[0]["m_score"] == 4
    assert got[0]["freq"] == 1 and got[7]["freq"] == 8


def test_auc_exact_matches_sklearn_free_brute(spark):
    import numpy as np

    from sis_spark.operators.analytics import auc_exact

    rng = np.random.default_rng(7)
    scores = rng.integers(0, 50, 400)
    labels = (rng.random(400) < (scores / 60.0)).astype(int)
    df = spark.createDataFrame(
        [(int(s), int(y)) for s, y in zip(scores, labels)], "s long, y long"
    )
    r = auc_exact(df, "s", "y").collect()[0]
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    num2 = sum(2 * int((n < p).sum()) + int((n == p).sum()) for p in pos
               for n in [neg])
    assert r["pos"] == len(pos) and r["neg"] == len(neg)
    assert r["num2"] == num2
    assert r["den2"] == 2 * len(pos) * len(neg)
    auc = r["num2"] / r["den2"]
    assert 0.5 < auc < 1.0  # scores are informative by construction


def test_ranking_metrics_hand_case(spark):
    from sis_spark.operators.analytics import ranking_metrics

    rows = [
        # key, score, tie, rel  -> ranks by score desc, tie asc
        (1, 90, 1, 0), (1, 80, 2, 1), (1, 70, 3, 1),   # first_rank 2
        (2, 50, 1, 0), (2, 40, 2, 0),                  # no relevant
        (3, 10, 5, 1),                                 # first_rank 1
    ]
    df = spark.createDataFrame(rows, "k long, s long, t long, rel long")
    out = {r["k"]: r for r in
           ranking_metrics(df, "k", "s", "t", "rel", k=2).collect()}
    assert out[1]["first_rank"] == 2 and out[1]["p_at_k"] == 1
    assert out[1]["mrr_q"] == (1 << 20) // 2
    assert out[2]["first_rank"] is None and out[2]["mrr_q"] == 0
    assert out[3]["mrr_q"] == 1 << 20 and out[3]["p_at_k"] == 1


def test_calibration_bins_clamp_and_sums(spark):
    from sis_spark.operators.analytics import calibration_bins

    rows = [(i, i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "s long, y long")
    out = {r["bin"]: r for r in
           calibration_bins(df, "s", "y", n_bins=10, score_max=100).collect()}
    assert len(out) == 10
    for b, r in out.items():
        assert r["n"] == 10 and r["n_pos"] == 5
        assert r["s_sum"] == sum(range(b * 10, b * 10 + 10))
    # score == score_max lands in the LAST bin (clamped)
    df2 = spark.createDataFrame([(100, 1)], "s long, y long")
    assert calibration_bins(df2, "s", "y", 10, 100).collect()[0]["bin"] == 9


def test_ks_stat_matches_scipy_free_brute(spark):
    import numpy as np

    from sis_spark.operators.analytics import ks_stat

    rng = np.random.default_rng(23)
    s1 = rng.integers(0, 60, 300)      # group 1
    s2 = rng.integers(10, 80, 200)     # group 0, shifted
    rows = [(int(v), 1) for v in s1] + [(int(v), 0) for v in s2]
    df = spark.createDataFrame(rows, "s long, g long")
    r = ks_stat(df, "s", "g").collect()[0]
    n1, n2 = len(s1), len(s2)
    xs = sorted(set(rows_v for rows_v, _ in rows))
    best = max(
        abs(n2 * int((s1 <= x).sum()) - n1 * int((s2 <= x).sum()))
        for x in xs
    )
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert r["d_num"] == best
    d = r["d_num"] / (n1 * n2)
    assert 0 < d <= 1


def test_mcc_counts_matches_brute(spark):
    rng = np.random.RandomState(7)
    rows = [(int(p), int(y)) for p, y in rng.randint(0, 2, size=(500, 2))]
    df = spark.createDataFrame(rows, "pred long, y long").repartition(5)
    from sis_spark.operators.analytics import mcc_counts

    r = mcc_counts(df, "pred", "y").collect()[0]
    tp = sum(1 for p, y in rows if p == 1 and y == 1)
    fp = sum(1 for p, y in rows if p == 1 and y == 0)
    fn = sum(1 for p, y in rows if p == 0 and y == 1)
    tn = sum(1 for p, y in rows if p == 0 and y == 0)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
    assert r["num"] == tp * tn - fp * fn
    # derived MCC equals the textbook float formula
    import math

    den = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    got = r["num"] / den
    exp = (tp * tn - fp * fn) / den
    assert got == exp


def test_brier_sum_matches_float_formula(spark):
    rng = np.random.RandomState(8)
    rows = [(int(q), int(y)) for q, y in
            zip(rng.randint(0, 1_000_001, 400), rng.randint(0, 2, 400))]
    df = spark.createDataFrame(rows, "pq long, y long").repartition(3)
    from sis_spark.operators.analytics import brier_sum

    r = brier_sum(df, "pq", "y").collect()[0]
    assert r["n"] == 400
    want = sum((q - y * 1_000_000) ** 2 for q, y in rows)
    assert r["sq_sum"] == want
    # derived score ~ mean((p-y)^2) within quantization error
    brier = r["sq_sum"] / (r["n"] * 1e12)
    ref = np.mean([(q / 1e6 - y) ** 2 for q, y in rows])
    assert abs(brier - ref) < 1e-12


def test_ndcg_matches_numpy_reference(spark):
    rng = np.random.RandomState(9)
    rows = [(int(i % 5), int(i), int(s), int(rel)) for i, (s, rel) in
            enumerate(zip(rng.randint(0, 40, 200), rng.randint(0, 4, 200)))]
    df = spark.createDataFrame(rows, "q long, i long, s long, rel long")
    from sis_spark.operators.analytics import _ndcg_discount_lut, ndcg_at_k

    out = {r["q"]: (r["dcg_q"], r["idcg_q"])
           for r in ndcg_at_k(df, "q", "i", "s", "rel", k=10).collect()}
    lut = _ndcg_discount_lut(10)
    for q in range(5):
        items = [(s, i, rel) for qq, i, s, rel in rows if qq == q]
        run = sorted(items, key=lambda t: (-t[0], t[1]))[:10]
        ideal = sorted(items, key=lambda t: (-t[2], t[1]))[:10]
        dcg = sum(rel * lut[rk] for rk, (_, _, rel) in enumerate(run))
        idcg = sum(rel * lut[rk] for rk, (_, _, rel) in enumerate(ideal))
        assert out[q] == (dcg, idcg)
        # the derived float NDCG approximates the textbook value
        ref_d = sum(rel / np.log2(rk + 2) for rk, (_, _, rel) in enumerate(run))
        ref_i = sum(rel / np.log2(rk + 2) for rk, (_, _, rel) in enumerate(ideal))
        if idcg:
            assert abs(dcg / idcg - ref_d / ref_i) < 1e-9


def test_lift_table_buckets_and_totals(spark):
    rng = np.random.RandomState(10)
    rows = [(int(s), int(y), i) for i, (s, y) in
            enumerate(zip(rng.randint(0, 1000, 503), rng.randint(0, 2, 503)))]
    df = spark.createDataFrame(rows, "s long, y long, i long").repartition(4)
    from sis_spark.operators.analytics import lift_table

    out = {r["bucket"]: (r["n"], r["positives"])
           for r in lift_table(df, "s", "y", "i").collect()}
    assert sum(n for n, _ in out.values()) == 503
    assert sum(p for _, p in out.values()) == sum(y for _, y, _ in rows)
    # brute replay of the floor-bucket rule on the same total order
    order = sorted(rows, key=lambda t: (-t[0], t[2]))
    want = {}
    for rk, (_, y, _) in enumerate(order):
        b = rk * 10 // 503
        n, p = want.get(b, (0, 0))
        want[b] = (n + 1, p + y)
    assert out == want
    # bucket sizes balanced within 1
    sizes = [n for n, _ in out.values()]
    assert max(sizes) - min(sizes) <= 1


def test_t_closeness_matches_brute(spark):
    from sis_spark.operators.quality import t_closeness

    rng = np.random.RandomState(13)
    rows = [(int(g), int(v)) for g, v in
            zip(rng.randint(0, 4, 300), rng.randint(0, 5, 300))]
    # one group missing a value entirely (tests the dense-grid fill)
    rows = [r for r in rows if not (r[0] == 3 and r[1] == 2)]
    df = spark.createDataFrame(rows, "qi long, sens long").repartition(3)
    got = {r["grp"]: (r["n_g"], r["emd_num"])
           for r in t_closeness(df, "qi", "sens").collect()}
    vals = sorted({v for _, v in rows})
    n = len(rows)
    for g in {g for g, _ in rows}:
        grp = [v for gg, v in rows if gg == g]
        n_g = len(grp)
        cum_g = cum = emd = 0
        for v in vals:
            cum_g += sum(1 for x in grp if x == v)
            cum += sum(1 for _, x in rows if x == v)
            emd += abs(cum_g * n - cum * n_g)
        assert got[g] == (n_g, emd)
        # the derived t in [0, 1]
        t = got[g][1] / (n_g * n * (len(vals) - 1))
        assert 0.0 <= t <= 1.0


def test_jenks_dp_brute_and_distributed(spark):
    from itertools import combinations

    from sis_spark.operators.analytics import jenks_costs, jenks_dp

    # small weighted histogram: brute-force all partitions
    bins = [1, 4, 5, 9, 12, 20]
    wts = [3, 1, 2, 5, 1, 4]
    import numpy as np
    b = np.array(bins, dtype=np.int64)
    n = np.array(wts, dtype=np.int64)

    def seg_cost(i, j):  # inclusive index range into bins
        N = int(n[i:j + 1].sum())
        sx = int((n[i:j + 1] * b[i:j + 1]).sum())
        sxx = int((n[i:j + 1] * b[i:j + 1] ** 2).sum())
        return N * sxx - sx * sx

    m = len(bins)
    for k in (1, 2, 3, 4):
        best = None
        for cuts in combinations(range(1, m), k - 1):
            edges = [0, *cuts, m]
            tot = sum(seg_cost(edges[s], edges[s + 1] - 1)
                      for s in range(k))
            if best is None or tot < best:
                best = tot
        costs, breaks = jenks_dp(bins, wts, k)
        assert costs[k - 1] == best
        assert len(breaks) == k and breaks[-1] == bins[-1]
        assert breaks == sorted(breaks)

    # distributed entry point: explode the histogram into rows
    rows = [(v,) for v, w in zip(bins, wts) for _ in range(w)]
    df = spark.createDataFrame(rows, "v long")
    got = {r["c"]: r["cost"] for r in jenks_costs(df, "v", 4).collect()}
    costs, _ = jenks_dp(bins, wts, 4)
    assert got == {c + 1: costs[c] for c in range(4)}
    # monotone: more classes never cost more
    assert all(got[c + 1] <= got[c] for c in range(1, 4))


def test_ols_multi_exact_and_vs_numpy(spark):
    import numpy as np

    from sis_spark.operators.analytics import ols_multi

    rng = np.random.default_rng(3)
    x1 = rng.integers(0, 20, 300)
    x2 = rng.integers(0, 15, 300)
    noise = rng.integers(-2, 3, 300)
    y = 4 * x1 - 3 * x2 + 7 + noise
    df = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 long, x2 long, y long",
    )
    r = ols_multi(df, "x1", "x2", "y").collect()[0]
    X = np.stack([np.ones(300), x1, x2], axis=1).astype(np.float64)
    beta = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)[0]
    got = np.array([r["num0"], r["num1"], r["num2"]], np.float64) / float(r["det"])
    assert np.allclose(got, beta, atol=1e-9)

    # exact linear data -> exact rational recovery
    y2 = 4 * x1 - 3 * x2 + 7
    df2 = spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y2)],
        "x1 long, x2 long, y long",
    )
    r2 = ols_multi(df2, "x1", "x2", "y").collect()[0]
    assert (r2["num0"], r2["num1"], r2["num2"]) == (
        7 * r2["det"], 4 * r2["det"], -3 * r2["det"])


def test_dissolve_rect_area_hand(spark):
    from sis_spark.operators.analytics import dissolve_rect_area

    rows = [
        # group 0: two overlapping 10x10 squares offset by 5 -> 175
        (0, 0, 10, 0, 10), (0, 5, 15, 5, 15),
        # group 1: disjoint 2x3 and 4x5 -> 26
        (1, 0, 2, 0, 3), (1, 10, 14, 10, 15),
        # group 2: containment -> area of outer 100
        (2, 0, 10, 0, 10), (2, 2, 4, 2, 4),
    ]
    df = spark.createDataFrame(
        rows, "g long, xmin long, xmax long, ymin long, ymax long"
    )
    out = {r["g"]: r["area"] for r in dissolve_rect_area(df).collect()}
    assert out == {0: 175, 1: 26, 2: 100}


def test_ransac_line_matches_brute(spark):
    import hashlib

    from sis_spark.operators.analytics import ransac_line

    rng = __import__("numpy").random.default_rng(4)
    pts = []
    for i in range(60):
        x = int(rng.integers(0, 200))
        if i % 5 == 0:
            y = int(rng.integers(-300, 900))   # outlier
        else:
            y = 2 * x - 30 + int(rng.integers(-4, 5))
        pts.append((i, x, y))
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r["k"]: (r["x1"], r["y1"], r["x2"], r["y2"], r["n_inliers"])
           for r in ransac_line(df, n_models=10, eps=5).collect()}

    def u60(key, salt="ransac"):
        return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:15], 16)

    want = {}
    for k in range(10):
        a = min(pts, key=lambda p: (u60(f"{k}:a:{p[0]}"), p[0]))
        b = min(pts, key=lambda p: (u60(f"{k}:b:{p[0]}"), p[0]))
        x1, y1, x2, y2 = a[1], a[2], b[1], b[2]
        if (x1, y1) == (x2, y2):
            continue
        n = sum(
            1 for _, x, y in pts
            if ((x2 - x1) * (y1 - y) - (x1 - x) * (y2 - y1)) ** 2
            <= 25 * ((x2 - x1) ** 2 + (y2 - y1) ** 2)
        )
        want[k] = (x1, y1, x2, y2, n)
    assert got == want
    # consensus sanity: the best model must cover most of the 48 inliers
    assert max(n for *_, n in got.values()) >= 40
