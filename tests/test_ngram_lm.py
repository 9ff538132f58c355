"""n-gram LM fluency scoring (textops.ngram_lm_score): python replica,
fluency ordering, degenerate docs."""

from collections import Counter

from sis_spark.operators.textops import ngram_lm_score


def _replica(rows):
    bgs = {}
    c2 = Counter()
    for i, text in rows:
        ws = text.split(" ")
        b = list(zip(ws, ws[1:]))
        bgs[i] = b
        c2.update(b)
    c1 = Counter()
    for (w1, _w2), n in c2.items():
        c1[w1] += n
    out = {}
    for i, b in bgs.items():
        if not b:
            continue
        s = sum(c2[p].bit_length() - c1[p[0]].bit_length() for p in b)
        out[i] = (len(b), s, s / len(b))
    return out


def test_matches_python_replica(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the cat"),
        (2, "zx qq zx qq zx"),
        (3, "the the the the"),
        (4, "single"),             # no bigram -> absent from output
        (5, "the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_sum"], r["fluency"])
        for r in ngram_lm_score(df).collect()
    }
    assert got == _replica(rows)
    assert 4 not in got


def test_likely_continuations_score_higher(spark):
    # with a shared prefix, the corpus-frequent continuation outranks a
    # one-off continuation (the signal a perplexity filter thresholds on)
    rows = [(i, "the cat") for i in range(20)]
    rows += [(50 + j, f"the w{j}") for j in range(6)]  # rare continuations
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sc = {r["doc_id"]: r["fluency"] for r in ngram_lm_score(df).collect()}
    assert sc[0] == 0.0          # bitlen(20) == bitlen(26)
    assert sc[50] < sc[0]        # bitlen(1) - bitlen(26) < 0
