"""Hot-bucket caps in banded candidate generation (VERDICT r2 wrong #4).

An adversarial corpus where EVERY row lands in one bucket (identical text /
constant embeddings) must not materialize the O(b^2) in-bucket pair list:
with ``max_bucket`` set, the degenerate bucket is excluded BEFORE any
collect_list, with logged drop accounting; rows outside the hot bucket keep
their exact candidate semantics.
"""

from __future__ import annotations

import logging

import numpy as np
import pytest
from pyspark.sql import functions as F


def _adversarial_docs(spark, n_const=400, n_real=20):
    """n_const identical documents (one degenerate bucket per band) plus a
    few near-dup pairs of distinct documents."""
    rows = [(i, "the same text everywhere") for i in range(n_const)]
    for j in range(n_real):
        base = 10_000 + 2 * j
        words = " ".join(f"w{j}_{t}" for t in range(12))
        rows.append((base, words))
        rows.append((base + 1, words + " tail"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_cap_drops_degenerate_bucket_keeps_rest(spark, caplog):
    from sis_spark.operators.dedup import minhash_lsh_pairs

    docs = _adversarial_docs(spark)
    with caplog.at_level(logging.WARNING, logger="sis_spark.operators.buckets"):
        pairs = minhash_lsh_pairs(docs, threshold=0.25, max_bucket=50).toPandas()
    # drop accounting surfaced, not silent
    assert any("oversized bucket" in r.message for r in caplog.records)
    got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
    # every genuine near-dup pair outside the hot bucket survives
    for j in range(20):
        assert (10_000 + 2 * j, 10_000 + 2 * j + 1) in got
    # no pair from the degenerate cluster was expanded
    assert not any(a < 400 and b < 400 for a, b in got)


def test_lsh_no_cap_exact_semantics(spark):
    """max_bucket=None (gate default): identical output to r2 semantics —
    the constant cluster's pairs ARE emitted (this is the oracle contract;
    keep corpora like this away from the uncapped path)."""
    from sis_spark.operators.dedup import minhash_lsh_pairs

    docs = _adversarial_docs(spark, n_const=30, n_real=2)
    pairs = minhash_lsh_pairs(docs, threshold=0.25).toPandas()
    const_pairs = sum(1 for a, b in zip(pairs["a"], pairs["b"]) if a < 30 and b < 30)
    assert const_pairs == 30 * 29 // 2


def test_simhash_cap(spark, caplog):
    from sis_spark.operators.dedup import simhash, simhash_near_dups

    # 300 identical docs (degenerate bucket) + 5 small clusters of 2
    # identical docs each (hamming 0, bucket size 2 — under the cap)
    rows = [(i, "the same text everywhere") for i in range(300)]
    for j in range(5):
        t = " ".join(f"w{j}_{k}" for k in range(12))
        rows.append((10_000 + 2 * j, t))
        rows.append((10_001 + 2 * j, t))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sims = simhash(docs)
    with caplog.at_level(logging.WARNING, logger="sis_spark.operators.buckets"):
        out = simhash_near_dups(sims, max_hamming=3, max_bucket=50).toPandas()
    assert any("oversized bucket" in r.message for r in caplog.records)
    assert not any(a < 300 and b < 300 for a, b in zip(out["a"], out["b"]))
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    for j in range(5):
        assert (10_000 + 2 * j, 10_001 + 2 * j) in got


def test_embedding_band_cap(spark, caplog):
    """Constant embeddings: all vectors share every band bucket; the cap
    must bound the expansion while distinct clusters still pair up."""
    from sis_spark.operators.ann import near_dup_pairs_banded

    rng = np.random.default_rng(0)
    rows = []
    const = rng.normal(0, 1, 16)
    for i in range(300):
        rows.append((i, [float(x) for x in const]))
    for j in range(5):
        v = rng.normal(0, 1, 16)
        rows.append((10_000 + 2 * j, [float(x) for x in v]))
        rows.append((10_001 + 2 * j, [float(x) for x in v + rng.normal(0, 1e-3, 16)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with caplog.at_level(logging.WARNING, logger="sis_spark.operators.buckets"):
        out = near_dup_pairs_banded(vecs, threshold=0.98, max_bucket=50).toPandas()
    assert any("oversized bucket" in r.message for r in caplog.records)
    assert not any(a < 300 and b < 300 for a, b in zip(out["a"], out["b"]))
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    for j in range(5):
        assert (10_000 + 2 * j, 10_001 + 2 * j) in got




def test_default_caps_survive_constant_corpus(spark):
    """VERDICT r3 item 4: the DEFAULT path of the banded generators must
    survive a degenerate constant corpus — every doc/vector identical, so
    all of them land in one bucket per band.  With a small explicit cap the
    bucket drops (no O(b^2) pair list); the capped default is the same code
    path with a bigger constant."""
    import pandas as pd
    from sis_spark.operators.buckets import DEFAULT_MAX_BUCKET
    from sis_spark.operators.dedup import (minhash_lsh_pairs, simhash,
                                           simhash_near_dups)
    from sis_spark.operators.ann import near_dup_pairs_banded

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(300)),
        "text": ["the same words every time for each document"] * 300,
    }))
    # default path: cap present but not triggered at 300 < DEFAULT_MAX_BUCKET
    assert minhash_lsh_pairs.__defaults__ is not None
    # tiny explicit cap: the degenerate bucket must be dropped entirely
    assert minhash_lsh_pairs(docs, max_bucket=100).count() == 0
    assert simhash_near_dups(simhash(docs), max_bucket=100).count() == 0

    vecs = spark.createDataFrame(pd.DataFrame({
        "vec_id": list(range(300)),
        "embedding": [[0.5, -0.25, 0.125, 1.0]] * 300,
    }))
    assert near_dup_pairs_banded(vecs, 0.9, max_bucket=100).count() == 0
    # and the built-in default actually IS the shared constant
    import inspect
    for fn in (minhash_lsh_pairs, simhash_near_dups, near_dup_pairs_banded):
        assert inspect.signature(fn).parameters["max_bucket"].default == DEFAULT_MAX_BUCKET
