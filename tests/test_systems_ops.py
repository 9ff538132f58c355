"""Property tests for the systems/allocation sitting ops: stable-matching
stability, ring-vs-rendezvous balance, apportionment invariants,
Bradley-Terry sanity, chain-ladder identity, conformal guarantee."""

import numpy as np


def test_stable_matching_has_no_blocking_pair(spark):
    """The gate instance's output is a genuinely STABLE matching: no
    (man, woman) pair prefers each other over their assigned partners."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from sis_spark.operators.graph import stable_matching

    n = 8
    base = spark.range(6 * n * n).select(
        (F.col("id") / (n * n)).cast("long").alias("g"),
        ((F.col("id") / n) % n).cast("long").alias("m"),
        (F.col("id") % n).alias("w"),
    )
    wp = Window.partitionBy("g", "m").orderBy(
        (F.col("m") * 7 + F.col("w") * 11 + F.col("g") * 3) % 19, "w"
    )
    pref = base.withColumn("rk", F.row_number().over(wp).cast("long"))
    wkey = lambda g, w, m: (w * 5 + m * 13 + g * 7) % 23
    out = stable_matching(pref, wkey, n=n, rounds=16).collect()

    def mkey(g, m, w):
        return ((m * 7 + w * 11 + g * 3) % 19, w)

    def wk(g, w, m):
        return ((w * 5 + m * 13 + g * 7) % 23, m)

    for g in range(6):
        match = {r["m"]: r["w"] for r in out if r["g"] == g}
        wife_of = {w: m for m, w in match.items()}
        assert len(match) == n  # perfect (complete preference lists)
        for m in range(n):
            for w in range(n):
                if match[m] == w:
                    continue
                # blocking pair: m prefers w to his wife AND w prefers m
                m_prefers = mkey(g, m, w) < mkey(g, m, match[m])
                w_prefers = wk(g, w, m) < wk(g, w, wife_of[w])
                assert not (m_prefers and w_prefers), (g, m, w)


def test_hash_ring_and_rendezvous_balance(spark):
    from pyspark.sql import functions as F
    from sis_spark.operators.analytics import hash_ring_assign, rendezvous_assign

    keys = spark.range(4000).select(F.col("id").alias("key_id"))
    for fn in (lambda k: hash_ring_assign(k, list(range(10))),
               lambda k: rendezvous_assign(k, list(range(10)))):
        counts = {r["node"]: r["n"] for r in
                  fn(keys).groupBy("node").agg(F.count("*").alias("n")).collect()}
        assert len(counts) == 10  # every node gets keys
        assert max(counts.values()) < 4 * min(counts.values())


def test_rendezvous_minimal_reshuffle(spark):
    """Removing one node moves ONLY that node's keys (the HRW property)."""
    from sis_spark.operators.analytics import rendezvous_assign

    keys = spark.range(1500).selectExpr("id AS key_id")
    full = {r["key_id"]: r["node"]
            for r in rendezvous_assign(keys, list(range(8))).collect()}
    reduced = {r["key_id"]: r["node"]
               for r in rendezvous_assign(keys, [n for n in range(8) if n != 3]).collect()}
    for k, node in full.items():
        if node != 3:
            assert reduced[k] == node


def test_apportion_sums_to_total(spark):
    from sis_spark.operators.analytics import apportion_largest_remainder

    votes = spark.createDataFrame(
        [(i, 100 + 37 * i) for i in range(9)], "k long, v long"
    )
    rows = apportion_largest_remainder(votes, "k", "v", seats=501).collect()
    assert sum(r["seats"] for r in rows) == 501
    for r in rows:
        assert r["seats"] - r["quota"] in (0, 1)  # largest-remainder bound


def test_bradley_terry_orders_dominant_team_first(spark):
    from sis_spark.operators.analytics import bradley_terry

    # team 0 beats everyone 9/10 times; others even
    rows = []
    for b in range(1, 5):
        rows.append((0, b, 9, 1))
    for a in range(1, 5):
        for b in range(a + 1, 5):
            rows.append((a, b, 5, 5))
    m = spark.createDataFrame(rows, "a long, b long, wins_ab long, wins_ba long")
    w = {r["team"]: r["w"] for r in bradley_terry(m, iters=3).collect()}
    assert w[0] == max(w.values())
    assert w[0] > 2 * max(v for t, v in w.items() if t != 0)


def test_chain_ladder_complete_triangle_identity(spark):
    """With a fully-observed square (factors exactly 1 beyond data) the
    ultimate equals the latest cumulative."""
    from sis_spark.operators.analytics import chain_ladder

    rows = [(i, j, 100) for i in range(5) for j in range(5) if i + j < 5]
    df = spark.createDataFrame(rows, "i long, j long, x long")
    out = {r["i"]: r for r in chain_ladder(df).collect()}
    # constant increments: C[i, k] = 100*(k+1); factors f_j = sum C_{j+1}/sum C_j
    # project and compare against a tiny numpy replica
    tri = np.zeros((5, 5))
    for i, j, x in rows:
        tri[i, j] = x
    cum = tri.cumsum(axis=1)
    fac = []
    for j in range(4):
        num = sum(cum[i, j + 1] for i in range(5) if i + j + 1 < 5)
        den = sum(cum[i, j] for i in range(5) if i + j + 1 < 5)
        fac.append((num, den))
    for i in range(5):
        c = cum[i, 4 - i]
        for j in range(4 - i, 4):
            num, den = fac[j]
            c = (c * num) // den
        assert out[i]["ultimate"] == c


def test_conformal_coverage_holds_marginally(spark):
    """Split-conformal coverage >= 1 - alpha on exchangeable data."""
    from sis_spark.operators.analytics import conformal_coverage

    rng = np.random.RandomState(5)
    rows = [("g", int(rng.randint(0, 1000)), bool(i % 2), i)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, r long, is_cal boolean, id long")
    row = conformal_coverage(df, alpha_num=1, alpha_den=5).collect()[0]
    assert row["covered"] / row["n_test"] >= 0.8 - 0.03
