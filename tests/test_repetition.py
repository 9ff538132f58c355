"""repetition_stats edge cases: degenerate docs + known bigram modes."""

import pandas as pd
import pytest

from sis_spark.operators.textops import repetition_stats


def test_repetition_known_values(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b a b a",      # bigrams: ab,ba,ab,ba -> top 2 of 4
                    "x x x x",        # xx,xx,xx -> top 3 of 3; dup 3/4
                    "unique words only here",  # all distinct, top bigram 1/3
                    "solo",           # 1 word: no bigrams
                ],
            }
        )
    )
    got = {
        r["doc_id"]: r
        for r in repetition_stats(docs).collect()
    }
    assert got[0]["n_words"] == 5 and got[0]["n_distinct_words"] == 2
    assert got[0]["top_bigram_cnt"] == 2
    assert got[0]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[0]["dup_word_frac"] == pytest.approx(1 - 2 / 5)
    assert got[1]["top_bigram_cnt"] == 3
    assert got[1]["top_bigram_frac"] == pytest.approx(1.0)
    assert got[1]["dup_word_frac"] == pytest.approx(0.75)
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_cnt"] == 1
    assert got[3]["n_words"] == 1
    assert got[3]["top_bigram_cnt"] == 0
    assert got[3]["top_bigram_frac"] == 0.0
    assert got[3]["dup_word_frac"] == 0.0


def test_repetition_empty_text(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [""]}))
    r = repetition_stats(docs).collect()[0]
    # split('') -> [''] : one (empty) word, no bigrams, no repetition
    assert r["n_words"] == 1 and r["top_bigram_cnt"] == 0
    assert r["dup_word_frac"] == 0.0
