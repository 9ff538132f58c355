"""Differential + edge-case tests for operators/timeseries (as-of join,
interval range join, sessionization) against brute-force pandas replicas,
plus plan-shape assertions (no cartesian, single keyed exchange)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.timeseries import (
    asof_join,
    range_join,
    session_stats,
    sessionize,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_events(seed: int, n: int, keys: int):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "k": rng.integers(0, keys, n),
            "t": rng.integers(0, 10_000, n).astype("int64"),
            "v": rng.integers(-100, 100, n).astype("int64"),
        }
    )


# --------------------------------------------------------------- as-of join


def _brute_asof(lp: pd.DataFrame, rp: pd.DataFrame, tol=None):
    rows = []
    for _, l in lp.iterrows():
        cand = rp[(rp["k"] == l["k"]) & (rp["t"] <= l["t"])]
        if tol is not None:
            cand = cand[cand["t"] >= l["t"] - tol]
        if len(cand):
            # max t; among ties the brute picks the same arbitrary one the
            # test data avoids (unique (k, t) enforced below)
            m = cand.loc[cand["t"].idxmax()]
            rows.append((l["id"], int(m["id"]), int(m["t"])))
        else:
            rows.append((l["id"], None, None))
    return pd.DataFrame(rows, columns=["id", "r_rid", "r_t"])


@pytest.mark.parametrize("tol", [None, 500])
def test_asof_matches_brute(spark, tol):
    lp = _mk_events(1, 300, 12)
    rp = _mk_events(2, 300, 12).drop_duplicates(["k", "t"])
    rp = rp.rename(columns={"id": "rid"})
    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp[["k", "t", "rid"]])
    out = asof_join(
        left, right, keys=["k"], left_ts="t", right_ts="t",
        value_cols=["rid"],
        tolerance=None if tol is None else F.lit(tol),
        how="left",
    )
    got = (
        out.select("id", F.col("r_rid"), F.col("r_t"))
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = _brute_asof(lp, rp.rename(columns={"rid": "id"}), tol)
    exp = exp.sort_values("id").reset_index(drop=True)
    assert got["r_rid"].astype("float").tolist() == pytest.approx(
        exp["r_rid"].astype("float").tolist(), nan_ok=True
    )
    assert got["r_t"].astype("float").tolist() == pytest.approx(
        exp["r_t"].astype("float").tolist(), nan_ok=True
    )


def test_asof_tie_at_equal_ts_is_visible(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [100], "id": [0]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [100], "rid": [7]}))
    out = asof_join(left, right, keys=["k"], left_ts="t", right_ts="t",
                    value_cols=["rid"]).collect()
    assert out[0]["r_rid"] == 7  # <= semantics: same-instant right row seen


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "t": [100, 100], "id": [0, 1]})
    )
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [50], "rid": [7]}))
    got = asof_join(left, right, keys=["k"], left_ts="t", right_ts="t",
                    value_cols=["rid"], how="inner").collect()
    assert [(r["id"], r["r_rid"]) for r in got] == [(0, 7)]


def test_asof_plan_single_exchange_no_nested_loop(spark):
    lp = _mk_events(3, 50, 4)
    out = asof_join(
        spark.createDataFrame(lp),
        spark.createDataFrame(lp.rename(columns={"id": "rid"})[["k", "t", "rid"]]),
        keys=["k"], left_ts="t", right_ts="t", value_cols=["rid"],
    )
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle on k
    assert "EvalPython" not in plan


# ------------------------------------------------------------- range join


def _brute_overlap(ap, bp, keys=False):
    pairs = set()
    for _, x in ap.iterrows():
        for _, y in bp.iterrows():
            if keys and x["k"] != y["k"]:
                continue
            if x["s"] <= y["e2"] and y["s2"] <= x["e"]:
                pairs.add((int(x["aid"]), int(y["bid"])))
    return pairs


@pytest.mark.parametrize("width", [1, 7, 100, 10_000])
def test_range_join_matches_brute(spark, width):
    rng = np.random.default_rng(4)
    n = 120
    s = rng.integers(0, 1000, n)
    ap = pd.DataFrame({"aid": np.arange(n), "s": s,
                       "e": s + rng.integers(0, 50, n)})
    s2 = rng.integers(0, 1000, n)
    bp = pd.DataFrame({"bid": np.arange(n), "s2": s2,
                       "e2": s2 + rng.integers(0, 50, n)})
    out = range_join(
        spark.createDataFrame(ap), spark.createDataFrame(bp),
        "s", "e", "s2", "e2", bin_width=width,
    )
    got = [(r["aid"], r["bid"]) for r in out.collect()]
    assert len(got) == len(set(got))  # exactly-once emission, no dupes
    assert set(got) == _brute_overlap(ap, bp)


def test_range_join_edges(spark):
    # shared endpoint, nested, zero-length, negative coords, disjoint
    ap = pd.DataFrame({"aid": [0, 1, 2, 3], "s": [0, 10, -20, 100],
                       "e": [5, 20, -10, 100]})
    bp = pd.DataFrame({"bid": [0, 1, 2], "s2": [5, 12, -15],
                       "e2": [8, 14, -15]})
    out = range_join(spark.createDataFrame(ap), spark.createDataFrame(bp),
                     "s", "e", "s2", "e2", bin_width=6)
    got = sorted((r["aid"], r["bid"]) for r in out.collect())
    assert got == [(0, 0), (1, 1), (2, 2)]


def test_range_join_keyed(spark):
    rng = np.random.default_rng(5)
    n = 80
    ap = pd.DataFrame({"aid": np.arange(n), "k": rng.integers(0, 3, n),
                       "s": rng.integers(0, 200, n)})
    ap["e"] = ap["s"] + rng.integers(0, 30, n)
    bp = pd.DataFrame({"bid": np.arange(n), "k": rng.integers(0, 3, n),
                       "s2": rng.integers(0, 200, n)})
    bp["e2"] = bp["s2"] + rng.integers(0, 30, n)
    out = range_join(spark.createDataFrame(ap), spark.createDataFrame(bp),
                     "s", "e", "s2", "e2", bin_width=16, keys=["k"])
    got = set((r["aid"], r["bid"]) for r in out.collect())
    assert got == _brute_overlap(ap, bp, keys=True)
    assert "k" in out.columns and out.columns.count("k") == 1


def test_range_join_rejects_column_collision(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": [1], "e": [2], "x": [3]}))
    with pytest.raises(ValueError, match="overlapping"):
        range_join(df, df, "s", "e", "s", "e", bin_width=10)


def test_range_join_plan_no_cartesian(spark):
    ap = pd.DataFrame({"aid": [0], "s": [0], "e": [5]})
    bp = pd.DataFrame({"bid": [0], "s2": [1], "e2": [2]})
    out = range_join(spark.createDataFrame(ap), spark.createDataFrame(bp),
                     "s", "e", "s2", "e2", bin_width=4)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


# ------------------------------------------------------------ sessionize


def test_sessionize_matches_pandas(spark):
    ev = _mk_events(6, 400, 10).drop_duplicates(["k", "t"])
    out = sessionize(spark.createDataFrame(ev), "k", ts="t", gap=F.lit(50))
    got = out.toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    exp = ev.sort_values(["k", "t"]).copy()
    exp["session_idx"] = (
        exp.groupby("k")["t"].diff().gt(50).fillna(False).groupby(exp["k"]).cumsum()
    )
    assert got["session_idx"].tolist() == exp["session_idx"].astype(int).tolist()


def test_sessionize_gap_boundary_inclusive(spark):
    # events exactly `gap` apart stay in ONE session (strict > starts new)
    ev = pd.DataFrame({"k": [1] * 3, "t": [0, 50, 101]})
    out = sessionize(spark.createDataFrame(ev), "k", ts="t", gap=F.lit(50))
    idx = [r["session_idx"] for r in out.orderBy("t").collect()]
    assert idx == [0, 0, 1]


def test_session_stats_rollup(spark):
    ev = pd.DataFrame({"k": [1, 1, 1, 2], "t": [0, 10, 200, 5],
                       "v": [3, 4, 5, 6]})
    out = session_stats(
        spark.createDataFrame(ev), "k", ts="t", gap=F.lit(50),
        aggs=[F.sum("v").alias("sv")],
    ).orderBy("k", "session_idx")
    rows = [(r["k"], r["session_idx"], r["n_events"], r["sv"]) for r in out.collect()]
    assert rows == [(1, 0, 2, 7), (1, 1, 1, 5), (2, 0, 1, 6)]


def test_tumbling_and_sliding_windows_brute(spark):
    """Window membership vs a brute python replica, incl. multi-window
    membership in the sliding case."""
    import pandas as pd

    from sis_spark.operators.timeseries import sliding_agg, tumbling_agg

    ts = [pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(seconds=s)
          for s in (0, 1, 299, 300, 301, 599, 600, 1199, 1200)]
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "value": vals}))

    tum = {r["w_start"]: (r["n"], r["total_cents"])
           for r in tumbling_agg(df, 300).collect()}
    brute = {}
    for t, v in zip(ts, vals):
        s = pd.Timestamp("2024-01-01") + pd.Timedelta(
            seconds=(t - pd.Timestamp("1970-01-01")).total_seconds() // 300 * 300
            - (pd.Timestamp("2024-01-01") - pd.Timestamp("1970-01-01")).total_seconds())
        n, c = brute.get(s, (0, 0))
        brute[s] = (n + 1, c + round(v * 100))
    assert tum == brute

    sli = {r["w_start"]: (r["n"], r["total_cents"])
           for r in sliding_agg(df, 600, 300).collect()}
    brute2 = {}
    epoch = pd.Timestamp("1970-01-01")
    for t, v in zip(ts, vals):
        tus = (t - epoch).total_seconds()
        base = int(tus // 300)
        for o in range(2):
            start_s = (base - o) * 300
            if start_s <= tus < start_s + 600:
                s = epoch + pd.Timedelta(seconds=start_s)
                n, c = brute2.get(s, (0, 0))
                brute2[s] = (n + 1, c + round(v * 100))
    assert sli == brute2
    # every event lands in exactly 2 sliding windows (width/slide = 2)
    assert sum(n for n, _ in sli.values()) == 2 * len(ts)


def test_ewma_int_matches_python_recurrence(spark):
    import numpy as np

    from sis_spark.operators.timeseries import ewma_int

    rng = np.random.RandomState(41)
    rows = []
    for u in range(3):
        for i in range(50):
            rows.append((u, i, i * 1000, int(rng.randint(-500, 500))))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, x long")
    got = {
        (r["user_id"], r["rn"]): r["s"]
        for r in ewma_int(df, num=1, den=4).collect()
    }
    for u in range(3):
        xs = [x for uu, _, _, x in rows if uu == u]
        s = xs[0]
        assert got[(u, 1)] == s
        for t in range(1, len(xs)):
            s = (xs[t] + 3 * s) // 4  # python // is floor: the contract
            assert got[(u, t + 1)] == s


def test_interval_union_matches_python(spark):
    import numpy as np

    from sis_spark.operators.timeseries import interval_union

    rng = np.random.RandomState(71)
    rows = []
    for u in range(4):
        for _ in range(30):
            s = int(rng.randint(0, 500))
            rows.append((u, s, s + int(rng.randint(1, 80))))
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    got = sorted(
        (r["user_id"], r["m_start"], r["m_end"], r["n_merged"])
        for r in interval_union(df).collect()
    )

    want = []
    for u in range(4):
        ivs = sorted((s, e) for uu, s, e in rows if uu == u)
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                want.append((u, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        want.append((u, cur_s, cur_e, n))
    assert got == sorted(want)
    # merged intervals are disjoint and non-touching per user
    for u in range(4):
        ms = [(a, b) for uu, a, b, _ in got if uu == u]
        for (a0, b0), (a1, b1) in zip(ms, ms[1:]):
            assert a1 > b0


def test_changepoint_finds_planted_shift(spark):
    import numpy as np

    from sis_spark.operators.timeseries import changepoint

    rng = np.random.RandomState(83)
    rows = []
    for u, true_k in ((0, 30), (1, 70), (2, 10)):
        for i in range(100):
            base = 100 if i < true_k else 500
            rows.append((u, i, i * 10, int(base + rng.randint(-5, 6))))
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, x long")
    got = {r["user_id"]: r for r in changepoint(df).collect()}
    for u, true_k in ((0, 30), (1, 70), (2, 10)):
        assert got[u]["k_best"] == true_k, (u, got[u]["k_best"])
        assert got[u]["n"] == 100

    # brute check of the exact objective for user 0
    xs = [x for uu, _, _, x in rows if uu == 0]
    S = sum(xs)
    best = max(
        range(1, 100),
        key=lambda k: (
            (sum(xs[:k]) ** 2 * (100 - k) + (S - sum(xs[:k])) ** 2 * k)
            / (k * (100 - k)),
            -k,
        ),
    )
    assert got[0]["k_best"] == best


def test_isotonic_fit_properties(spark):
    import numpy as np

    from sis_spark.operators.timeseries import isotonic_fit

    rng = np.random.default_rng(31)
    rows, series = [], {}
    for k in range(6):
        ys = (np.arange(20) * 2 + rng.integers(-15, 15, 20)).tolist()
        series[k] = ys
        rows += [(k, o, int(y)) for o, y in enumerate(ys)]
    rows += [(9, o, 10 - o) for o in range(5)]  # decreasing -> single block
    series[9] = [10 - o for o in range(5)]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    got = {}
    for r in isotonic_fit(df, "k", "t", "y").collect():
        got.setdefault(r.k, []).append(r)
    for k, ys in series.items():
        blocks = sorted(got[k], key=lambda r: r.blk)
        # partition covers 1..n contiguously
        assert blocks[0].r_start == 1 and blocks[-1].r_end == len(ys)
        for a, b in zip(blocks, blocks[1:]):
            assert b.r_start == a.r_end + 1
            # fitted means strictly increasing across blocks (rational cmp)
            assert a.fit_num * b.fit_den < b.fit_num * a.fit_den
        # block means are exact means of the covered points
        for b in blocks:
            seg = ys[b.r_start - 1: b.r_end]
            assert b.fit_num == sum(seg) and b.fit_den == len(seg)
        # least-squares optimality vs sklearn-style check: fit is the
        # isotonic projection, so SSE <= SSE of any other monotone fit;
        # spot-check vs the constant overall-mean fit
        fit = np.concatenate([
            np.full(b.fit_den, b.fit_num / b.fit_den) for b in blocks
        ])
        y = np.asarray(ys, float)
        assert ((y - fit) ** 2).sum() <= ((y - y.mean()) ** 2).sum() + 1e-9
    assert len(got[9]) == 1  # decreasing input pools to one block


def test_mase_components_reference(spark):
    from sis_spark.operators.timeseries import mase_components

    xs = [3, 7, 2, 9, 9, 1, 5, 8, 4]
    rows = [(1, i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, x long")
    (r,) = mase_components(df, season=3).collect()
    n1 = [abs(xs[i] - xs[i - 1]) for i in range(1, len(xs))]
    nm = [abs(xs[i] - xs[i - 3]) for i in range(3, len(xs))]
    assert (r["n"], r["n_naive"], r["n_seasonal"]) == (9, 8, 6)
    assert (r["sum_abs_naive"], r["sum_abs_seasonal"]) == (sum(n1), sum(nm))


def test_xcorr_argmax_planted_lag(spark):
    import numpy as np

    from sis_spark.operators.timeseries import xcorr_argmax

    rng = np.random.RandomState(2)
    base = rng.randint(-5, 6, 40)
    y = np.roll(base, 3)  # y[i] = x[i-3] -> lag 3 aligns x with y
    rows = [(1, i, int(base[i]), int(y[i])) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, o long, x long, y long")
    (r,) = xcorr_argmax(df, max_lag=6).collect()
    assert r["lag"] == 3
    assert r["xsum"] == int((base[:-3] * y[3:]).sum())


def test_burstiness_moments(spark):
    from sis_spark.operators.timeseries import burstiness_moments

    rows = [(1, 0, 0), (1, 10, 1), (1, 30, 2), (1, 60, 3)]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long")
    (r,) = burstiness_moments(df).collect()
    # gaps 10, 20, 30
    assert (r["n_gaps"], r["s_dt"], r["s_dt2"]) == (3, 60, 100 + 400 + 900)


def test_hampel_flags_planted_spike(spark):
    from sis_spark.operators.timeseries import hampel_flags

    xs = [10, 11, 10, 500, 11, 10, 12, 11]  # spike at index 3
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, x long")
    got = {r["o"]: r for r in hampel_flags(df, window=2, k_num=3).collect()}
    assert got[3]["flag"] == 1
    # integer data can hit MAD == 0 windows (any deviation then flags —
    # the textbook Hampel caveat); the spike must flag, most rows must not
    assert sum(r["flag"] for r in got.values()) <= 3
    assert got[3]["med"] in (10, 11)  # window median ignores the spike


def test_paa_segments_hand(spark):
    from sis_spark.operators.timeseries import paa_segments

    rows = [(1, i, i * 10) for i in range(7)]  # 7 points, seg_len 3
    df = spark.createDataFrame(rows, "k long, o long, v long")
    out = {(r["k"], r["seg"]): (r["n"], r["vsum"])
           for r in paa_segments(df, 3).collect()}
    assert out[(1, 0)] == (3, 0 + 10 + 20)
    assert out[(1, 1)] == (3, 30 + 40 + 50)
    assert out[(1, 2)] == (1, 60)  # ragged tail kept with its true count


def test_sax_symbols_hand(spark):
    from sis_spark.operators.timeseries import sax_symbols

    # values 0..7 with alpha=4 and range [0,7]: width (7-0+1)/4 = 2
    rows = [(1, i, i) for i in range(8)]
    rows += [(2, 1, 5), (2, 2, 5)]  # degenerate vmin == vmax -> all '0'
    df = spark.createDataFrame(rows, "k long, o long, v long")
    out = {r["k"]: r for r in sax_symbols(df, alpha=4).collect()}
    assert out[1]["word"] == "00112233" and out[1]["n"] == 8
    assert out[2]["word"] == "00"


def test_interarrival_hist_buckets(spark):
    from sis_spark.operators.timeseries import interarrival_hist

    # gaps: 1 (bucket 0), 2,3 (bucket 1), 4 (bucket 2), 0 (bucket -1)
    ts = [0, 1, 3, 6, 10, 10]
    rows = [(1, i, t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "k long, o long, t_us long")
    out = {r["bucket"]: r["cnt"] for r in interarrival_hist(df).collect()}
    assert out[0] == 1 and out[1] == 2 and out[2] == 1 and out[-1] == 1


def test_seasonal_decompose_int_hand(spark):
    from sis_spark.operators.timeseries import seasonal_decompose_int

    # period 3, one key: phases {0: [10, 16], 1: [20], 2: [30, 36]}
    xs = [10, 20, 30, 16, 40, 36]
    rows = [(1, t, x) for t, x in enumerate(xs)]
    # plant a second key to prove partition isolation
    rows += [(2, 0, 100), (2, 3, 200)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    out = {
        (r["k"], r["t"]): r
        for r in seasonal_decompose_int(
            df, period=3, key_cols=("k",)
        ).collect()
    }
    assert len(out) == 8
    r = out[(1, 0)]
    assert (r["phase"], r["cnt"], r["ssum"]) == (0, 2, 26)
    assert r["dev"] == 10 * 2 - 26  # x*cnt - ssum
    r = out[(1, 4)]  # t=4 -> phase 1, values [20, 40]
    assert (r["phase"], r["cnt"], r["ssum"], r["dev"]) == (1, 2, 60, 20)
    r = out[(2, 3)]  # key 2 phase 0: [100, 200]
    assert (r["phase"], r["cnt"], r["ssum"], r["dev"]) == (0, 2, 300, 100)
    # residual identity: sum(dev) over each (key, phase) group is 0
    tot = sum(v["dev"] for v in out.values())
    assert tot == 0


def test_ordinal_patterns_hand(spark):
    from sis_spark.operators.timeseries import ordinal_patterns

    # xs = 1,3,2,2,5 -> triples (1,3,2)=100b? compute by hand below
    xs = [1, 3, 2, 2, 5]
    rows = [(1, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["code"]: r["cnt"]
           for r in ordinal_patterns(df, key_cols=("k",)).collect()}

    def code(a, b, c):
        return 4 * (a <= b) + 2 * (a <= c) + (b <= c)

    want = {}
    for i in range(2, len(xs)):
        c = code(xs[i - 2], xs[i - 1], xs[i])
        want[c] = want.get(c, 0) + 1
    assert got == want and sum(got.values()) == len(xs) - 2
    # only consistent Bandt-Pompe codes can ever occur
    assert set(got) <= {0, 1, 3, 4, 6, 7}


def test_dft_coeffs_planted_sinusoid(spark):
    import math

    from sis_spark.operators.timeseries import _DFT_SCALE, dft_coeffs

    # x_t = round(1000 * cos(2*pi*2*t/32)): power concentrates at f=2
    P = 32
    xs = [int(round(1000 * math.cos(2 * math.pi * 2 * t / P)))
          for t in range(2 * P)]
    rows = [(1, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, x long")
    got = {r["freq"]: (r["c"], r["s"], r["n"])
           for r in dft_coeffs(df, key_cols=("k",)).collect()}
    assert all(v[2] == 2 * P for v in got.values())
    # exact replay against the LUT definition
    from sis_spark.operators.timeseries import dft_luts
    cl, sl = dft_luts()
    for f in (1, 2, 3, 4):
        c = sum(x * cl[f][t % P] for t, x in enumerate(xs))
        s = sum(x * sl[f][t % P] for t, x in enumerate(xs))
        assert got[f] == (c, s, 2 * P)
    # dominance: |c| at f=2 dwarfs every other bin
    mag = {f: abs(got[f][0]) + abs(got[f][1]) for f in got}
    assert mag[2] > 100 * max(mag[1], mag[3], mag[4])
    assert abs(got[2][0]) > 0.9 * 1000 * P * _DFT_SCALE


def test_holt_winters_int_replica(spark):
    """Engine recurrence == an independently-written Python replica, and
    a pure seasonal signal yields converging seasonal state."""
    rows = []
    vals = [10, 50, 10, 50, 12, 52, 12, 52, 14, 54, 14, 54]
    for i, v in enumerate(vals):
        rows.append((1, i, i, v))
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, x long")
    from sis_spark.operators.timeseries import holt_winters_int

    out = {r["rn"]: (r["l"], r["b"], r["s"]) for r in
           holt_winters_int(df, m=4, ts_col="ts").collect()}

    def fdiv(a, b):
        return a // b

    m, an, ad, bn, bd, gn, gd = 4, 1, 4, 1, 8, 1, 4
    l = [vals[0]]; b = [0]; s = [0]
    for t in range(1, len(vals)):
        sm = s[t - m] if t - m >= 0 else 0
        lt = fdiv(an * (vals[t] - sm) + (ad - an) * (l[-1] + b[-1]), ad)
        bt = fdiv(bn * (lt - l[-1]) + (bd - bn) * b[-1], bd)
        st = fdiv(gn * (vals[t] - lt) + (gd - gn) * sm, gd)
        l.append(lt); b.append(bt); s.append(st)
    for t in range(len(vals)):
        assert out[t + 1] == (l[t], b[t], s[t])


def test_matrix_profile_matches_brute(spark):
    import numpy as np

    from sis_spark.operators.timeseries import matrix_profile

    rng = np.random.default_rng(12)
    rows = []
    for k in range(3):
        base = rng.integers(0, 40, 45)
        base[5:13] = base[30:38]  # plant an exact motif pair
        for t, v in enumerate(base):
            rows.append((k, t, int(v)))
    df = spark.createDataFrame(rows, "k long, o long, v long")
    m = 8
    got = {(r["k"], r["i"]): (r["d2"], r["j"])
           for r in matrix_profile(df, "k", "o", "v", m=m, cap=60).collect()}

    want = {}
    series = {}
    for k, t, v in rows:
        series.setdefault(k, []).append(v)
    for k, vs in series.items():
        n = len(vs) - m + 1
        for i in range(n):
            best = None
            for j in range(n):
                if abs(i - j) < m:
                    continue
                d2 = sum((vs[i + t] - vs[j + t]) ** 2 for t in range(m))
                if best is None or (d2, j) < best:
                    best = (d2, j)
            want[(k, i + 1)] = (best[0], best[1] + 1)  # 1-based indices
    assert got == want
    # the planted motif is each series' best match: mp == 0 at i=6 and j=31
    for k in series:
        assert got[(k, 6)] == (0, 31) and got[(k, 31)] == (0, 6)
