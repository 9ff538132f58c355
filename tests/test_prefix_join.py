"""Prefix-filtering exact Jaccard join vs brute all-pairs."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.dedup import jaccard_join_prefix


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(23)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        k = int(rng.randint(4, 12))
        words = sorted(set(rng.choice(vocab, size=k)))
        rows.append((i, " ".join(words)))
    return rows


def _brute(rows, t_num, t_den):
    sets = {i: set(t.split(" ")) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if t_den * inter >= t_num * union:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


@pytest.mark.parametrize("t_num,t_den", [(1, 2), (3, 5), (4, 5)])
def test_prefix_join_matches_brute(spark, corpus, t_num, t_den):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): (r["common"], r["sa"], r["sb"])
        for r in jaccard_join_prefix(df, t_num=t_num, t_den=t_den).collect()
    }
    assert got == _brute(corpus, t_num, t_den)


def test_prefix_join_no_candidates_below_threshold(spark):
    # disjoint vocabularies -> zero pairs, and the prefix join must not
    # fabricate candidates from the verification stage
    rows = [(0, "a b c d"), (1, "e f g h"), (2, "i j k l")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert jaccard_join_prefix(df, 1, 2).count() == 0


# ---------------------------------------------------------------- FastSS


def test_edit_distance_join_matches_brute(spark):
    from sis_spark.operators.dedup import edit_distance_join

    words = [
        "spark", "spork", "sparks", "park", "spar", "stark", "shark",
        "sharks", "apark", "xyzzy", "xyzz", "zyzzy", "a", "", "b", "ab",
    ]
    rows = [(i, w) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["a"], r["b"]) for r in edit_distance_join(df, "s", "id").collect()}

    def lev(x, y):
        dp = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, dp[0] = dp[0], i
            for j, cy in enumerate(y, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (cx != cy)
                )
        return dp[-1]

    want = {
        (i, j)
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if lev(words[i], words[j]) <= 1
    }
    assert got == want
