#!/usr/bin/env python
"""Corpus curation + integrity audit: documents -> per-doc profile
(language, quality, readability, Adler-32) -> exact dedup keep list ->
kept corpus -> per-source integrity manifest (Merkle root + checksum
aggregate), checkpointed and resumable.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/corpus_audit.py \
        --out /tmp/sis_audit_out --sf-dir /root/testdata/sf0.1

Stages (each a parquet + manifest checkpoint; re-running the identical
command resumes from the completed stages):

  1. profile   — per-doc language id, quality score, token/readability
                 stats, Adler-32 content checksum — one scan, all codegen
                 except nothing (no Python anywhere in the stage plan)
  2. keep      — exact-dedup canonical ids (md5 groups, min doc_id wins)
  3. kept      — profile rows of the canonical documents that pass the
                 language + quality filters
  4. integrity — per-source manifest: doc count, token totals, xor-free
                 Adler aggregate, and the Merkle root over kept doc
                 hashes in doc_id order — the tamper-evident shard
                 receipt a downstream trainer verifies against

The emitted JSON line reports corpus/kept counts, language histogram,
and the integrity-manifest row count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)
os.environ["PYTHONPATH"] = (
    _repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sis_audit_job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--langs", default="en")
    args = ap.parse_args(argv)

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sis_spark.operators.textops import (
        adler32_docs,
        lang_id,
        quality_score_sql,
        readability_counts,
    )
    from sis_spark.operators.quality import merkle_root
    from sis_spark.plans.checkpoint import CheckpointedPipeline
    from sis_spark.session import get_spark

    spark = get_spark("corpus_audit")
    pipe = CheckpointedPipeline(spark, args.out)
    langs = args.langs.split(",")

    def build_profile(s, _ups):
        docs = s.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            "doc_id", "source", "text"
        )
        prof = lang_id(docs).withColumn(
            "quality", F.expr(quality_score_sql("text"))
        ).withColumn("h", F.md5(F.col("text").cast("binary")))
        read = readability_counts(docs)
        adl = adler32_docs(docs).select("doc_id", "adler")
        return (
            prof.join(read, "doc_id")
            .join(adl, "doc_id")
            .select("doc_id", "source",
                    F.col("predicted").alias("lang"), "quality", "h",
                    "n_words", "n_sents", "flesch_q", "adler")
        )

    s_profile = pipe.stage(
        "profile", build_profile, params={"sf": args.sf_dir},
    )

    def build_keep(s, ups):
        (prof,) = ups
        w = Window.partitionBy("h")
        return (
            prof.select("doc_id", "h")
            .withColumn("canonical", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("canonical"))
            .select("doc_id")
        )

    s_keep = pipe.stage("keep", build_keep, params={}, upstream=[s_profile])

    def build_kept(s, ups):
        prof, keep = ups
        return (
            prof.join(keep, "doc_id", "semi")
            .filter(F.col("lang").isin(langs)
                    & (F.col("quality") >= args.min_quality))
        )

    s_kept = pipe.stage(
        "kept", build_kept,
        params={"langs": args.langs, "min_quality": args.min_quality},
        upstream=[s_profile, s_keep],
    )

    def build_integrity(s, ups):
        (kept,) = ups
        w = Window.partitionBy("source").orderBy("doc_id")
        leaves = kept.select(
            F.col("source").alias("g"), F.col("h"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        roots = merkle_root(leaves)
        stats = kept.groupBy(F.col("source").alias("g")).agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("adler").alias("adler_sum"),
        )
        return stats.join(roots, "g").select(
            F.col("g").alias("source"), "n_docs", "n_words",
            "adler_sum", "root",
        )

    s_int = pipe.stage("integrity", build_integrity, params={},
                       upstream=[s_kept])

    prof = s_profile.read(spark)
    kept = s_kept.read(spark)
    manifest = s_int.read(spark)
    langs_hist = {
        r["lang"]: int(r["n"])
        for r in prof.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({
        "documents": prof.count(),
        "kept": kept.count(),
        "langs": langs_hist,
        "sources": manifest.count(),
    }, sort_keys=True))


if __name__ == "__main__":
    main()
