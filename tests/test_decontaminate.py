"""decontaminate + classifier_score: brute differentials and plan shape."""

import hashlib

import pandas as pd

from sis_spark.operators.textops import (
    CLASSIFIER_WEIGHTS,
    classifier_score,
    decontaminate,
)


def _grams(text: str, n: int) -> set:
    ws = text.split(" ")
    if len(ws) >= n:
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
    return {" ".join(ws)}


def test_decontaminate_vs_brute(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pdocs = docs.select("doc_id", "text").toPandas()
    bench_rows = [
        " ".join(t.split(" ")[4:16])
        for i, t in zip(pdocs["doc_id"], pdocs["text"])
        if i % 29 == 3 and len(t.split(" ")) >= 20
    ]
    bench = spark.createDataFrame(pd.DataFrame({"text": bench_rows}))
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(docs, bench, n=8).collect()
    }

    bench_grams = set()
    for b in bench_rows:
        bench_grams |= _grams(b, 8)
    want = {}
    for i, t in zip(pdocs["doc_id"], pdocs["text"]):
        hits = _grams(t, 8) & bench_grams
        if hits:
            want[i] = len(hits)
    assert got == want and len(want) > 0


def test_decontaminate_short_doc_whole_text_matches(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["tiny doc", "another one"]})
    )
    bench = spark.createDataFrame(pd.DataFrame({"text": ["tiny doc"]}))
    got = decontaminate(docs, bench, n=8).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in got] == [(0, 1)]


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = spark.createDataFrame(pd.DataFrame({"text": ["a b c d e f g h"]}))
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _brute_score(text: str) -> int:
    return sum(
        CLASSIFIER_WEIGHTS[hashlib.md5(t.encode()).hexdigest()[0]]
        for t in text.split(" ")
    )


def test_classifier_score_vs_brute(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["doc_id"]: (r["score"], r["keep"]) for r in classifier_score(docs).collect()}
    for i, t in docs.select("doc_id", "text").toPandas().itertuples(index=False):
        s = _brute_score(t)
        assert got[i] == (s, s >= 0)


def test_classifier_plan_is_shuffle_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = classifier_score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_image_quality_blur_ordering(spark):
    """Laplacian variance separates sharp from flat content; doubles match
    numpy var computed the same way."""
    import numpy as np
    import pandas as pd

    from sis_spark.operators.imageops import image_quality
    from sis_spark.raster import codec

    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    rng_y, rng_x = np.indices((16, 16))
    checker = ((rng_x + rng_y) % 2 * 255).astype(np.uint8)
    sharp = np.stack([checker] * 3, axis=2)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["flat", "sharp"],
                "bytes": [codec.encode(flat, "png"), codec.encode(sharp, "png")],
                "fmt": ["png", "png"],
            }
        )
    )
    got = {r["image_id"]: r for r in image_quality(df).collect()}
    assert got["flat"]["sharpness_var"] == 0.0
    assert got["flat"]["contrast_var"] == 0.0
    assert got["sharp"]["sharpness_var"] > 1e6
    luma = sharp.astype(np.int64).sum(axis=2)
    n = luma.size
    s, sq = luma.sum(), (luma * luma).sum()
    want = (float(sq) - float(s) * float(s) / float(n)) / float(n)
    assert got["sharp"]["contrast_var"] == want


def test_caption_alignment_matches_numpy(spark):
    """Cosine scores equal a straight numpy replica over decoded pixels and
    hashed caption buckets."""
    import hashlib

    import numpy as np

    from sis_spark.operators.imageops import caption_alignment
    from sis_spark.sources.images import images_table

    img = images_table(spark, 30).filter("fmt <> 'jpeg'")
    rows = img.select("image_id", "caption", "bytes", "fmt").collect()
    got = {r["image_id"]: r for r in caption_alignment(img, threshold=0.97).collect()}

    from sis_spark.raster import codec

    hexmod = {c: i % 3 for i, c in enumerate("0123456789abcdef")}
    for r in rows:
        arr = codec.decode(bytes(r["bytes"]), r["fmt"]).astype(np.int64)
        iv = np.array([arr[:, :, k].sum() for k in range(3)], dtype=np.float64)
        cv = np.zeros(3)
        for t in r["caption"].split(" "):
            cv[hexmod[hashlib.md5(t.encode()).hexdigest()[0]]] += 1
        want = float(iv @ cv / (np.sqrt((cv * cv).sum()) * np.sqrt((iv * iv).sum())))
        g = got[r["image_id"]]
        assert abs(g["alignment"] - want) < 1e-12
        assert g["keep"] == (g["alignment"] >= 0.97)


def test_dup_ngram_coverage_known_values(spark):
    """Hand-computable interval unions, incl. overlapping spans."""
    import pandas as pd

    from sis_spark.operators.textops import dup_ngram_coverage

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a b c d x y z w",   # shares 'a b c d' with doc 1
                    "a b c d p q r s",   # spans [1..4] in both -> covered 4
                    "k l m n o",          # unique -> covered 0
                    "a b c d e a b c d e niner",  # self-repeat: grams at 1..2 and 6..7
                ],
            }
        )
    )
    got = {r["doc_id"]: r for r in dup_ngram_coverage(docs, n=4, min_count=2).collect()}
    assert (got[0]["covered"], got[0]["n_words"]) == (4, 8)
    assert got[1]["covered"] == 4
    assert got[2]["covered"] == 0 and got[2]["dup_ngram_frac"] == 0.0
    # doc 3: dup grams 'a b c d'@1,6  'b c d e'@2,7 -> spans {1,2,6,7}
    # union: 4 + min(4,1) + min(4,4) + min(4,1) = 10 of 11 tokens
    assert got[3]["covered"] == 10 and got[3]["n_words"] == 11


def test_redact_pii_known_values(spark):
    """Hand-checked redactions: ordering (email before IP), counts, and
    non-PII text untouched."""
    import pandas as pd

    from sis_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "reach me at bob.smith+x@sub.example.org today",
                "server 192.168.1.254 and 10.0.0.1 are up",
                "call +4915123456789 now or visit 1.2.3.4",
                "no pii here just words and 42 numbers",
            ],
        })
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[0]["n_email"] == 1 and got[0]["redacted"] == "reach me at <EMAIL> today"
    assert got[1]["n_ip"] == 2
    assert got[1]["redacted"] == "server <IP> and <IP> are up"
    assert got[2]["n_phone"] == 1 and got[2]["n_ip"] == 1
    assert got[2]["redacted"] == "call <PHONE> now or visit <IP>"
    assert got[3]["redacted"] == "no pii here just words and 42 numbers"
    assert (got[3]["n_email"], got[3]["n_ip"], got[3]["n_phone"]) == (0, 0, 0)


def test_redact_pii_plan_is_map_only(spark):
    import pandas as pd

    from sis_spark.operators.textops import redact_pii

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["x"]})
    )
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
