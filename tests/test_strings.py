"""Brute differentials for the string-processing ops (SA, BWT, LZ77)."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_suffix_array_matches_sorted_suffixes(spark):
    from sis_spark.operators.textops import suffix_array

    texts = ["banana", "abracadabra", "mississippi river runs",
             "aaaaabaaa", "the quick brown fox"]
    df = _docs(spark, list(enumerate(texts)))
    got = suffix_array(df, prefix=64).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["i"]] = r["sa_rank"]
    for did, t in enumerate(texts):
        sufs = sorted(range(1, len(t) + 1), key=lambda i: t[i - 1:])
        exp = {i: rank + 1 for rank, i in enumerate(sufs)}
        assert by_doc[did] == exp, (did, t)


def test_bwt_matches_rotation_brute(spark):
    from sis_spark.operators.textops import bwt_prefix

    texts = ["banana banana banana banana banan",
             "the cat sat on the mat quite calmly"]
    df = _docs(spark, list(enumerate(texts)))
    got = {r["doc_id"]: r["bwt"] for r in bwt_prefix(df, prefix=32).collect()}
    for did, t in enumerate(texts):
        s = t[:32] + "!"
        rots = sorted(s[i:] + s[:i] for i in range(len(s)))
        assert got[did] == "".join(r[-1] for r in rots)


def test_lz77_reconstructs_text(spark):
    from sis_spark.operators.textops import lz77_factors

    texts = ["abcabcabcabcabc xyz xyz xyz xyz end",
             "no repeats here at all zqjkvw", "aaaaaaaaaaaaaaaaaaaaa"]
    df = _docs(spark, list(enumerate(texts)))
    rows = lz77_factors(df, window=64, max_len=16, min_len=3,
                        cap=160).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, t in enumerate(texts):
        t = t[:160]
        out = []
        for r in sorted(by_doc[did], key=lambda r: r["idx"]):
            pos = r["pos"] - 1
            assert len("".join(out)) == pos  # factors tile the text
            if r["len"] == 1:
                out.append(t[pos])
            else:
                src = pos - r["dist"]
                out.append(t[src:src + r["len"]])
        assert "".join(out) == t


def test_lcs_substring_matches_brute(spark):
    from sis_spark.operators.textops import lcs_substring_pairs

    texts = ["the quick brown fox jumps over it",
             "a lazy dog saw the quick brown cat",
             "nothing in common here zzz",
             "totally different words qqq vvv"]
    df = _docs(spark, list(enumerate(texts)))
    got = {(r["a_id"], r["b_id"]): r["lcs_len"]
           for r in lcs_substring_pairs(df, prefix=48, max_l=32).collect()}

    def brute(a, b):
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while (i + k < len(a) and j + k < len(b)
                       and a[i + k] == b[j + k]):
                    k += 1
                best = max(best, k)
        return best

    for i in range(3):
        a, b = texts[i][:48], texts[i + 1][:48]
        assert got[(i, i + 1)] == min(brute(a, b), 32), (i, got[(i, i + 1)])


def test_bwt_inverse_roundtrip(spark):
    """Inverse BWT must start the LF walk at the SENTINEL'S rank in the
    first column — texts with spaces (space < '!') caught a row-0 start
    producing a rotated reconstruction."""
    from sis_spark.operators.textops import bwt_inverse, bwt_prefix

    texts = ["key agg row scan slow fast table extra tail",
             "banana banana banana banana banana banana",
             "a b a b a b a b a b a b a b a b a b a b"]
    df = _docs(spark, list(enumerate(texts)))
    b = bwt_prefix(df, prefix=32)
    rec = {r["doc_id"]: r["recon"] for r in bwt_inverse(b, length=33).collect()}
    for did, t in enumerate(texts):
        assert rec[did] == t[:32] + "!", (did, rec[did])
