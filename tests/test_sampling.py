"""Deterministic sampling/splitting: stability, nesting, stratification."""

from pyspark.sql import functions as F

from sis_spark.operators.sampling import hash_sample, hash_split, stratified_sample


def _ids(df):
    return sorted(r[0] for r in df.select(df.columns[0]).collect())


def test_split_is_partitioning_and_rerun_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["k"]: r["split"] for r in hash_split(df, w, "k").collect()}
    b = {r["k"]: r["split"]
         for r in hash_split(df.repartition(17), w, "k").collect()}
    assert a == b
    # append stability: the first half's assignments are unchanged when the
    # second half arrives
    half = {r["k"]: r["split"]
            for r in hash_split(df.filter("k < 1000"), w, "k").collect()}
    assert all(a[k] == v for k, v in half.items())
    # rough proportions
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.74 < train / n < 0.86
    assert set(a.values()) == {"train", "val", "test"}


def test_samples_nest_by_rate(spark):
    df = spark.range(3000).withColumnRenamed("id", "k")
    s2 = set(_ids(hash_sample(df, 0.2, "k")))
    s5 = set(_ids(hash_sample(df, 0.5, "k")))
    assert s2 < s5  # same salt: lower rate is a strict subset
    assert 0.15 < len(s2) / 3000 < 0.25
    assert 0.45 < len(s5) / 3000 < 0.55


def test_stratified_rates(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 4 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, {"en": 1.0, "de": 0.1}, "lang", "k")
    rows = out.groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in rows}
    assert got["en"] == 1000  # rate 1.0 keeps every row
    assert 200 < got["de"] < 400
    # unconfigured strata drop entirely
    none = stratified_sample(df, {"fr": 1.0}, "lang", "k")
    assert none.count() == 0
