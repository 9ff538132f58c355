"""Distributed BPE vs an independent pure-Python reference trainer."""

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from sis_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    encode_word,
    init_vocab,
    pair_counts,
    word_freq,
)


def _ref_train(texts, num_merges):
    """Independent reference: dict-based Sennrich trainer."""
    wf = Counter(w for t in texts for w in t.split(" "))
    vocab = {w: tuple(w) for w in wf}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in vocab.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # deterministic tie rule: max count, then lexicographically smallest
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        a, b = best
        nv = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[w] = tuple(out)
        vocab = nv
    return merges, vocab


def test_bpe_train_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    want_merges, want_vocab = _ref_train(texts, 12)
    got_merges, got_vocab = bpe_train(docs, 12)
    assert got_merges == want_merges
    got = {r["word"]: tuple(r["symbols"]) for r in got_vocab.collect()}
    assert got == want_vocab


def test_merge_fold_nonoverlapping(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"word": ["aaa", "aaaa", "abab"], "freq": [1, 1, 1]})
    )
    v = init_vocab(df)
    from sis_spark.operators.bpe import _merge_expr

    out = {
        r["word"]: r["m"]
        for r in v.select("word", F.expr(_merge_expr("a", "a")).alias("m")).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["abab"] == ["a", "b", "a", "b"]


def test_pair_counts_weighted(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"word": ["ab", "abc"], "freq": [3, 2]})
    )
    got = {
        (r["a"], r["b"]): r["cnt"] for r in pair_counts(init_vocab(df)).collect()
    }
    assert got == {("a", "b"): 5, ("b", "c"): 2}


def test_bpe_encode_differential(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    merges, _ = bpe_train(docs, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: (r["n_tokens"], r["n_words"]) for r in bpe_encode(docs, merges).collect()}
    for i, t in texts.items():
        ws = t.split(" ")
        want = sum(len(encode_word(w, ranks)) for w in ws)
        assert got[i] == (want, len(ws))


def test_encode_word_applies_rank_order():
    # merges: (a,b) then (ab,c): "abc" -> ab c -> abc
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert encode_word("abc", ranks) == ["abc"]
    assert encode_word("acb", ranks) == ["a", "c", "b"]
