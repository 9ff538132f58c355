"""Data-quality operators: profile single-pass law, constraint counts."""

import pytest
from pyspark.sql import functions as F

from sis_spark.operators.quality import check_constraints, profile_table


def test_profile_with_nulls(spark):
    rows = [(1, "a"), (2, None), (None, "bbb"), (2, "a"), (5, "cc")]
    df = spark.createDataFrame(rows, "x long, s string")
    prof = {r["col"]: r for r in profile_table(
        df, [("x", True), ("s", False)]).collect()}
    assert prof["x"]["n"] == 5 and prof["x"]["n_null"] == 1
    assert prof["x"]["n_distinct"] == 3  # 1, 2, 5 (nulls excluded)
    assert prof["x"]["min_q"] == 1 and prof["x"]["max_q"] == 5
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["min_q"] == 1 and prof["s"]["max_q"] == 3  # lengths


def test_constraints_counts(spark):
    facts = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 500), (3, 99, 7), (3, 11, None), (4, 12, -2)],
        "k long, fk long, v long",
    )
    dims = spark.createDataFrame([(10,), (11,), (12,)], "dk long")
    row = check_constraints(
        facts, dims, "fk", "dk", "k", "v", lo=0, hi=100
    ).collect()[0]
    assert row["n"] == 5
    assert row["orphans"] == 1        # fk=99
    assert row["dup_keys"] == 1       # k=3 twice
    assert row["out_of_range"] == 2   # 500 and -2
    assert row["nulls"] == 1


def test_doc_cosine_pairs_brute(spark):
    from sis_spark.operators.textops import doc_cosine_pairs

    docs = [
        (1, "apple banana apple rare1"),
        (2, "banana cherry rare1 rare2"),
        (3, "apple apple apple rare2"),
        (4, "unrelated words only"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]): (r["dot"], r["na2"], r["nb2"])
           for r in doc_cosine_pairs(df, max_df=3).collect()}
    # brute over the df<=3 vocabulary
    from collections import Counter
    tfs = {i: Counter(t.split(" ")) for i, t in docs}
    df_t = Counter(t for c in tfs.values() for t in c)
    vocab = {t for t, d in df_t.items() if d <= 3}
    want = {}
    for a in tfs:
        for b in tfs:
            if a < b:
                dot = sum(tfs[a][t] * tfs[b][t] for t in vocab)
                if dot > 0:
                    na2 = sum(v * v for t, v in tfs[a].items() if t in vocab)
                    nb2 = sum(v * v for t, v in tfs[b].items() if t in vocab)
                    want[(a, b)] = (dot, na2, nb2)
    assert got == want


def test_url_canonical_rules(spark):
    from sis_spark.operators.textops import url_canonical

    urls = [
        (1, "https://WWW.Example.COM/a/"),
        (2, "http://example.com/a?q=1#frag"),
        (3, "https://example.com"),
        (4, "https://www.example.com/a"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {r["doc_id"]: r["canon"] for r in url_canonical(df).collect()}
    assert got[1] == "example.com/a"
    assert got[2] == "example.com/a"
    assert got[3] == "example.com/"
    assert got[4] == "example.com/a"


def test_k_anonymity_violations(spark):
    from sis_spark.operators.quality import k_anonymity_violations

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "t string, g long")
    got = {(r["t"], r["g"]): r["cnt"]
           for r in k_anonymity_violations(df, ["t", "g"], k=3).collect()}
    assert got == {("a", 2): 2, ("b", 1): 1}


def test_token_sort_dedup_collides_reorderings(spark):
    from sis_spark.operators.textops import token_sort_dedup

    docs = [
        (1, "new york pizza"),
        (2, "pizza new york"),
        (3, "york pizza new"),
        (4, "new york pizza pizza"),  # different multiset: no collision
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r["n_docs"], r["min_id"]) for r in token_sort_dedup(df).collect()
    )
    assert got == [(1, 4), (3, 1)]


def test_fd_discover_hand(spark):
    from sis_spark.operators.quality import fd_discover

    rows = [
        # a -> b holds (a determines b); b -> a violated (b=1 maps to a=1,3)
        (1, 1, "x"), (1, 1, "y"), (2, 2, "x"), (3, 1, "x"),
    ]
    df = spark.createDataFrame(rows, "a long, b long, c string")
    out = {(r["a_col"], r["b_col"]): (r["n_lhs"], r["n_violating"], r["holds"])
           for r in fd_discover(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == (3, 0, True)
    assert out[("b", "a")] == (2, 1, False)
    assert out[("a", "c")] == (3, 1, False)   # a=1 -> c in {x, y}
    assert out[("c", "b")] == (2, 1, False)   # c=x -> b in {1, 2}
    assert len(out) == 6


def test_mondrian_k_guarantee(spark):
    """Every output box keeps >= k rows; boxes partition the input; the
    guard refuses splits that would break k."""
    from sis_spark.operators.quality import mondrian_boxes

    n, k = 400, 30
    df = spark.range(n).selectExpr("id % 53 AS a", "(id * 13) % 41 AS b")
    rows = mondrian_boxes(df, k=k, rounds=5).collect()
    assert sum(r["n"] for r in rows) == n
    assert all(r["n"] >= k for r in rows)
    assert len(rows) > 1  # it actually split
    for r in rows:
        assert r["a_min"] <= r["a_max"] and r["b_min"] <= r["b_max"]

    # tiny input: never splits below k
    tiny = spark.range(2 * k - 1).selectExpr("id AS a", "id AS b")
    trows = mondrian_boxes(tiny, k=k, rounds=3).collect()
    assert len(trows) == 1 and trows[0]["n"] == 2 * k - 1


def test_dp_counts_matches_brute_and_is_laplace(spark):
    import hashlib
    import math

    from sis_spark.operators.quality import dp_counts

    rows = [(i % 7,) for i in range(200)]
    df = spark.createDataFrame(rows, "g long")
    got = {r["key"]: (r["n"], r["noise_q"])
           for r in dp_counts(df, "g", b="2.0E0", salt="dp").collect()}

    want = {}
    for k in range(7):
        n = sum(1 for (g,) in rows if g == k)
        h = int(hashlib.md5(f"{k}:dp".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / (1 << 60)
        x = 2.0 * math.log(2.0 * u) if u < 0.5 else -2.0 * math.log(2.0 - 2.0 * u)
        want[k] = (n, int(math.floor(x * 1e6 + 0.12345678987)))
    assert got == want
    # noise is centered-ish and bounded by the b*ln(2^60) tail
    assert all(abs(nq) < 90 * 10**6 for _, nq in got.values())
    assert any(nq < 0 for _, nq in got.values()) or any(
        nq > 0 for _, nq in got.values())
