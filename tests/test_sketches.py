"""Sketches: HyperLogLog / Bloom / Count-Min — merge laws, accuracy, plans.

The oracle gates (hll_registers / bloom_filter / countmin_heavy) pin the
sketch contents bit-for-bit; these tests cover what the gates can't: the
monoid merge law (sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property
that makes them tree-aggregable on a cluster), the FP estimate accuracy, the
one-sided Count-Min guarantee, and zero false NEGATIVES for Bloom.
"""

import pytest
from pyspark.sql import functions as F

from sis_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    countmin_build,
    countmin_estimate,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def keys(spark):
    # 5000 distinct string keys, plus a skewed repeat of the first 10
    base = spark.range(5000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    hot = spark.range(200).select(
        F.concat(F.lit("k"), (F.col("id") % 10)).alias("key")
    )
    return base.unionByName(hot)


def test_hll_merge_law(spark, keys):
    whole = hll_registers(keys, "key", p=6)
    left = hll_registers(keys.filter(F.length("key") <= 3), "key", p=6)
    right = hll_registers(keys.filter(F.length("key") > 3), "key", p=6)
    merged = hll_merge(left, right)
    w = {r["reg"]: r["max_rho"] for r in whole.collect()}
    m = {r["reg"]: r["max_rho"] for r in merged.collect()}
    assert w == m


def test_hll_estimate_accuracy(spark, keys):
    regs = hll_registers(keys, "key", p=8)
    est = hll_estimate(regs)
    # 5000 distinct; HLL p=8 -> std err ~1.04/sqrt(256) ~ 6.5%
    assert abs(est - 5000) / 5000 < 0.15


def test_hll_register_shape(spark, keys):
    regs = hll_registers(keys, "key", p=6).collect()
    assert len(regs) == 64
    assert all(0 <= r["max_rho"] <= 55 for r in regs)


def test_bloom_no_false_negatives(spark, keys):
    build = keys.distinct().limit(1000)
    bitmap = bloom_build(build, "key", bits=4800, k=3)
    probed = bloom_probe(build, bitmap, "key", bits=4800, k=3)
    assert probed.filter(~F.col("maybe")).count() == 0


def test_bloom_fpr_reasonable(spark):
    inside = spark.range(500).select(F.concat(F.lit("in"), F.col("id")).alias("key"))
    outside = spark.range(5000).select(
        F.concat(F.lit("out"), F.col("id")).alias("key")
    )
    bitmap = bloom_build(inside, "key", bits=7200, k=3)
    fp = bloom_probe(outside, bitmap, "key", bits=7200, k=3).filter("maybe").count()
    # load 500*3/7200 -> FPR ~ (1-exp(-0.208))^3 ~ 0.7%; allow generous slack
    assert fp / 5000 < 0.05


def test_countmin_one_sided_and_merge(spark, keys):
    sketch = countmin_build(keys, "key", depth=4, width=32)
    probe = keys.distinct()
    est = countmin_estimate(probe, sketch, "key", depth=4, width=32)
    truth = keys.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    joined = est.join(truth, "key").collect()
    assert all(r["est"] >= r["n"] for r in joined)
    # hot keys (21 occurrences) dominate their counters enough to stay near truth
    hot = {r["key"]: r["est"] for r in joined if r["key"] in {"k0", "k1"}}
    assert all(v >= 21 for v in hot.values())

    # merge law: counter-wise sum over a union == build over the whole
    a = keys.filter(F.length("key") <= 3)
    b = keys.filter(F.length("key") > 3)
    sa = countmin_build(a, "key", depth=4, width=32)
    sb = countmin_build(b, "key", depth=4, width=32)
    merged = (
        sa.unionByName(sb).groupBy("row", "col").agg(F.sum("n").alias("n"))
    )
    w = {(r["row"], r["col"]): r["n"] for r in sketch.collect()}
    m = {(r["row"], r["col"]): r["n"] for r in merged.collect()}
    assert w == m


def test_sketch_plans_python_free(spark, keys):
    plans = [
        hll_registers(keys, "key", p=6)._jdf.queryExecution().executedPlan().toString(),
        bloom_build(keys, "key")._jdf.queryExecution().executedPlan().toString(),
        countmin_build(keys, "key")._jdf.queryExecution().executedPlan().toString(),
    ]
    for p in plans:
        assert "EvalPython" not in p and "Arrow" not in p


# ---------------------------------------------------------------- KMV / theta


@pytest.fixture(scope="module")
def kmv_keys(spark):
    return spark.range(4000).select(F.concat(F.lit("d"), F.col("id")).alias("key"))


def test_kmv_merge_law(spark, kmv_keys):
    from sis_spark.operators.sketches import kmv_build, kmv_merge

    whole = kmv_build(kmv_keys, "key", k=32)
    left = kmv_build(kmv_keys.filter(F.length("key") <= 3), "key", k=32)
    right = kmv_build(kmv_keys.filter(F.length("key") > 3), "key", k=32)
    merged = kmv_merge(left, right, k=32)
    assert sorted(r["u"] for r in whole.collect()) == sorted(
        r["u"] for r in merged.collect()
    )


def test_kmv_estimate_accuracy(spark, kmv_keys):
    from sis_spark.operators.sketches import kmv_build, kmv_estimate

    est = kmv_estimate(kmv_build(kmv_keys, "key", k=128), k=128)
    # rel err ~ 1/sqrt(k) ~ 9%
    assert abs(est - 4000) / 4000 < 0.3


def test_kmv_small_exact(spark, kmv_keys):
    from sis_spark.operators.sketches import kmv_build, kmv_estimate

    few = kmv_keys.limit(17)
    assert kmv_estimate(kmv_build(few, "key", k=64), k=64) == 17


def test_kmv_intersection(spark, kmv_keys):
    from sis_spark.operators.sketches import kmv_build, kmv_intersect_estimate

    # A = ids 0..2999, B = ids 2000..3999 -> |A ∩ B| = 1000
    ids = kmv_keys.withColumn("n", F.substring("key", 2, 10).cast("long"))
    a = kmv_build(ids.filter(F.col("n") < 3000), "key", k=256)
    b = kmv_build(ids.filter(F.col("n") >= 2000), "key", k=256)
    est = kmv_intersect_estimate(a, b, k=256)
    assert abs(est - 1000) / 1000 < 0.5  # intersection error compounds


def test_kmv_summary_matches_driver_helpers(spark, kmv_keys):
    from sis_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_summary,
    )

    ids = kmv_keys.withColumn("n", F.substring("key", 2, 10).cast("long"))
    a = kmv_build(ids.filter(F.col("n") < 3000), "key", k=64)
    b = kmv_build(ids.filter(F.col("n") >= 2000), "key", k=64)
    row = kmv_summary(a, b, k=64).collect()[0]
    assert row["est_a"] == kmv_estimate(a, k=64)
    assert row["est_b"] == kmv_estimate(b, k=64)
    assert row["est_intersect"] == kmv_intersect_estimate(a, b, k=64)


def test_kmv_plan_topk_and_python_free(spark, kmv_keys):
    from sis_spark.operators.sketches import kmv_build

    plan = kmv_build(kmv_keys, "key", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan and "Arrow" not in plan


# ---------------------------------------------------------------- quantile hist


def test_quantile_hist_merge_law_and_answers(spark):
    from sis_spark.operators.sketches import (
        quantile_from_hist,
        quantile_hist,
        quantile_hist_merge,
    )

    import numpy as np

    rng = np.random.RandomState(31)
    vals = rng.randint(0, 1 << 16, size=3000).astype(int).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    whole = quantile_hist(df, "v", domain_bits=16, p=8)
    left = quantile_hist(df.filter(F.col("v") % 2 == 0), "v", 16, p=8)
    right = quantile_hist(df.filter(F.col("v") % 2 == 1), "v", 16, p=8)
    merged = quantile_hist_merge(left, right)
    assert {(r["bucket"], r["cnt"]) for r in whole.collect()} == {
        (r["bucket"], r["cnt"]) for r in merged.collect()
    }

    # answers bracket the true quantile within one bucket (width 256)
    svals = sorted(vals)
    for q_num, q_den in ((1, 2), (9, 10)):
        row = quantile_from_hist(whole, q_num, q_den, 16, p=8).collect()[0]
        true_q = svals[(q_num * len(svals) + q_den - 1) // q_den - 1]
        assert row["lo"] <= true_q <= row["hi"]
        assert row["n"] == len(vals)
