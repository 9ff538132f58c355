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


def test_group_cap_deterministic_and_partition_invariant(spark):
    import hashlib

    import pandas as pd

    from sis_spark.operators.sampling import group_cap

    pdf = pd.DataFrame({"doc_id": range(200), "grp": [f"g{i % 3}" for i in range(200)]})
    docs = spark.createDataFrame(pdf)
    a = group_cap(docs, "grp", 5, "doc_id")
    b = group_cap(docs.repartition(13), "grp", 5, "doc_id")
    ra = sorted((r["grp"], r["doc_id"]) for r in a.collect())
    rb = sorted((r["grp"], r["doc_id"]) for r in b.collect())
    assert ra == rb
    per = {}
    for g, i in ra:
        per.setdefault(g, []).append(i)
    want = {}
    for i in range(200):
        g = f"g{i % 3}"
        want.setdefault(g, []).append((hashlib.md5(str(i).encode()).hexdigest(), i))
    for g, pairs in want.items():
        assert per[g] == sorted(i for _, i in sorted(pairs)[:5])


def test_group_quantiles_exact_indices(spark):
    import pandas as pd

    from sis_spark.operators.sampling import group_quantiles

    pdf = pd.DataFrame(
        {
            "grp": [f"g{i % 3}" for i in range(200)],
            "val": [(i * 37) % 100 for i in range(200)],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = group_quantiles(docs, "grp", "val", qs=[(1, 2), (9, 10)])
    rows = {(r["grp"], r["q_num"], r["q_den"]): r["value"] for r in got.collect()}
    for g in ("g0", "g1", "g2"):
        vals = sorted((i * 37) % 100 for i in range(200) if f"g{i % 3}" == g)
        n = len(vals)
        assert rows[(g, 1, 2)] == vals[(n - 1) * 1 // 2]
        assert rows[(g, 9, 10)] == vals[(n - 1) * 9 // 10]


def test_hash_sample_plan_is_map_only(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    got = hash_sample(df, 0.25, "k")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan + codegen filter only


def test_tfidf_topk_matches_python(spark):
    import math

    import pandas as pd

    from sis_spark.operators.textops import tfidf_topk

    texts = {
        0: "apple banana apple cherry",
        1: "banana banana durian",
        2: "cherry apple cherry cherry",
        3: "durian elder fig fig",
    }
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {}
    for r in tfidf_topk(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"]))
    tf = {(d, t): texts[d].split().count(t) for d in texts for t in set(texts[d].split())}
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(texts)
    for d in texts:
        scored = sorted(
            ((tf[(d, t)] * math.log(n / df[t]), t) for t in set(texts[d].split())),
            key=lambda s: (-s[0], s[1]),
        )[:2]
        want = [(rk + 1, t, tf[(d, t)], df[t]) for rk, (_, t) in enumerate(scored)]
        assert sorted(got[d]) == want


def test_dhash_matches_numpy_replica(spark):
    import numpy as np

    from sis_spark.operators.imageops import DHASH_COLS, DHASH_ROWS, dhash
    from sis_spark.raster import codec
    from sis_spark.sources.images import images_table

    img = images_table(spark, 24).filter("fmt <> 'jpeg'")
    rows = img.select("image_id", "bytes", "fmt").collect()
    got = {r["image_id"]: r["dhash"] for r in dhash(img).collect()}
    R, C = DHASH_ROWS, DHASH_COLS
    for r in rows:
        arr = codec.decode(bytes(r["bytes"]), r["fmt"]).astype(np.int64)
        luma = arr.sum(axis=2)
        h, w = luma.shape
        s = np.zeros((R, C), np.int64)
        for y in range(h):
            for x in range(w):
                s[(y * R) // h, (x * C) // w] += luma[y, x]
        bits = 0
        for rr in range(R):
            for cc in range(C - 1):
                if s[rr, cc + 1] > s[rr, cc]:
                    bits |= 1 << (62 - (rr * (C - 1) + cc))
        assert got[r["image_id"]] == bits
        assert 0 <= got[r["image_id"]] < (1 << 63)


def test_color_histogram_counts_sum_to_pixels(spark):
    from sis_spark.operators.imageops import color_histogram
    from sis_spark.sources.images import images_table

    img = images_table(spark, 12).filter("fmt <> 'jpeg'")
    hist = color_histogram(img)
    per = (
        hist.groupBy("image_id", "channel")
        .sum("n")
        .withColumnRenamed("sum(n)", "total")
    )
    dims = {r["image_id"]: r["w"] * r["h"] for r in img.select("image_id", "w", "h").collect()}
    for r in per.collect():
        assert r["total"] == dims[r["image_id"]]
    assert hist.count() == len(dims) * 24


def test_shuffle_assign_is_permutation_and_stable(spark):
    from sis_spark.operators.sampling import shuffle_assign

    df = spark.range(500).withColumnRenamed("id", "k")
    a = shuffle_assign(df, 4, "k")
    rows = [(r["shard"], r["pos"], r["k"]) for r in a.collect()]
    # (shard, pos) is a bijection: positions 0..n_shard-1 within each shard
    per = {}
    for s, p, k in rows:
        per.setdefault(s, []).append(p)
    assert sum(len(v) for v in per.values()) == 500
    for s, ps in per.items():
        assert sorted(ps) == list(range(len(ps)))
    # partitioning invariance
    b = {(r["shard"], r["pos"]): r["k"]
         for r in shuffle_assign(df.repartition(11), 4, "k").collect()}
    assert b == {(s, p): k for s, p, k in rows}


def test_mixture_rates_no_upsampling_and_proportions(spark):
    import pandas as pd

    from sis_spark.operators.sampling import mixture_rates

    pdf = pd.DataFrame({
        "doc_id": range(100),
        "src": ["a"] * 60 + ["b"] * 30 + ["c"] * 10,
    })
    df = spark.createDataFrame(pdf)
    got = {r["src"]: r for r in mixture_rates(df, "src", {"a": 1, "b": 1, "c": 2}).collect()}
    # c is the binding source: T = min(60*4//1, 30*4//1, 10*4//2) = 20
    assert got["a"]["target_n"] == 5 and got["b"]["target_n"] == 5
    assert got["c"]["target_n"] == 10
    for r in got.values():
        assert r["target_n"] <= r["n"]          # never upsample
        assert r["rate"] == r["target_n"] / r["n"]


def test_temporal_group_split_no_leakage(spark):
    from sis_spark.operators.sampling import temporal_group_split

    rows = [(u, u * 100 + i) for u in range(9) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {r["k"]: r["split"] for r in temporal_group_split(df, 3).collect()}
    # users ordered by first ts (u*100): contiguous thirds
    assert [got[u] for u in range(9)] == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_poisson_bootstrap_properties(spark):
    """Weights are Poisson(1)-shaped (n_eff ~ n), replicates differ,
    and the result is partitioning-stable."""
    from sis_spark.operators.sampling import poisson_bootstrap

    n = 2000
    df = spark.range(n).selectExpr("id AS event_id", "id % 100 AS x")
    out = poisson_bootstrap(df, n_boot=20, key_col="event_id", value_col="x")
    rows = {r["b"]: (r["n_eff"], r["sum_x"]) for r in out.collect()}
    assert len(rows) == 20
    effs = [v[0] for v in rows.values()]
    # Poisson(1) sum over 2000 rows: mean 2000, sd ~45 -> generous band
    assert all(1700 < e < 2300 for e in effs)
    assert len(set(rows.values())) > 1  # replicates actually differ

    out2 = poisson_bootstrap(df.repartition(13), n_boot=20,
                             key_col="event_id", value_col="x")
    assert {r["b"]: (r["n_eff"], r["sum_x"]) for r in out2.collect()} == rows
