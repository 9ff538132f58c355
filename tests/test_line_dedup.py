"""CCNet/C4-style line dedup (textops.line_dedup), Benford audit
(quality.benford_digits), circular heading stats
(trajectory.heading_resultant): hand cases + invariants."""

import numpy as np


def test_line_dedup_drops_hot_lines_keeps_order(spark):
    from sis_spark.operators.textops import line_dedup

    dup = "a b"                      # 2-token line repeated in 3 docs
    docs = [
        (1, f"{dup} u1 v1 {dup}"),   # dup twice in one doc
        (2, f"{dup} u2 v2"),
        (3, "u3 v3 w3 x3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(df, line_tokens=2, max_df=2).collect()}
    # "a b" occurs 3x corpus-wide -> dropped everywhere
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 1
    assert out[1]["kept_text"] == "u1 v1"
    assert out[2]["kept_text"] == "u2 v2" and out[2]["n_kept"] == 1
    # unique lines survive untouched, in order
    assert out[3]["kept_text"] == "u3 v3 w3 x3" and out[3]["n_kept"] == 2
    # all lines dropped -> empty string, doc still present
    df2 = spark.createDataFrame(
        [(1, "z z"), (2, "z z"), (3, "z z")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r for r in
            line_dedup(df2, line_tokens=2, max_df=2).collect()}
    assert out2[1]["n_kept"] == 0 and out2[1]["kept_text"] == ""


def test_benford_digit_histogram(spark):
    from sis_spark.operators.quality import benford_digits

    vals = [1, 19, 199, 2, 25, 300, 9999]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp0 string, v long"
    )
    out = {(r["grp"], r["digit"]): r["cnt"]
           for r in benford_digits(df, "v", "grp0").collect()}
    assert out[("g", 1)] == 3 and out[("g", 2)] == 2
    assert out[("g", 3)] == 1 and out[("g", 9)] == 1


def test_heading_resultant_right_angles(spark):
    from sis_spark.operators.trajectory import heading_resultant

    q = 1_000_000_000
    pts = [
        # user 1: east then north -> rx = ry = q
        (1, 1, 0, 0), (1, 2, 10, 0), (1, 3, 10, 10),
        # user 2: east then west -> cancels to zero
        (2, 1, 0, 0), (2, 2, 5, 0), (2, 3, 0, 0),
        # user 3: duplicate point is skipped
        (3, 1, 0, 0), (3, 2, 0, 0), (3, 3, 3, 4),
    ]
    df = spark.createDataFrame(pts, "k long, o long, x long, y long")
    out = {r["k"]: r for r in heading_resultant(df).collect()}
    assert out[1]["n_seg"] == 2
    assert out[1]["rx_q"] == q and out[1]["ry_q"] == q
    assert out[2]["rx_q"] == 0 and out[2]["n_seg"] == 2
    assert out[3]["n_seg"] == 1
    # 3-4-5 triangle: cos = 0.6, sin = 0.8 (floor-quantized doubles)
    assert out[3]["rx_q"] == int(np.floor(3 / 5 * q))
    assert out[3]["ry_q"] == int(np.floor(4 / 5 * q))


def test_ngram_novelty_ordering(spark):
    from sis_spark.operators.textops import ngram_novelty

    docs = [
        (1, "a b c d e"),          # all 2 grams of len-4... n=4 -> grams: "a b c d","b c d e"
        (2, "a b c d x"),          # shares "a b c d"
        (3, "a b c d e"),          # exact dup of 1 -> zero novel
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=4).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 2
    assert out[2]["n_novel"] == 1     # "b c d x" only
    assert out[3]["n_novel"] == 0
