#!/usr/bin/env python
"""End-to-end training-data curation job: documents -> exact + near dedup ->
transitive clusters -> deterministic split of the keep list, checkpointed
and resumable.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/dedup_pipeline.py \
        --out /tmp/sis_dedup_out --sf-dir /root/testdata/sf0.1

Stages (each a parquet + manifest checkpoint; re-running the identical
command resumes from the completed stages):

  1. docs       — the corpus scan (projection pruned to id/text/lang)
  2. pairs      — MinHash-LSH candidate pairs + exact-Jaccard verify
  3. clusters   — connected components over (near-dup ∪ exact-dup) edges,
                  one canonical survivor per transitive cluster
  4. splits     — hash-deterministic train/val/test over the keep list

The emitted JSON line reports corpus size, duplicate pairs, clusters,
rows kept, and per-split counts — the job's scoreboard contract.
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
    ap.add_argument("--out", default="/tmp/sis_dedup_job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--max-bucket", type=int, default=100_000,
                    help="hot-bucket cap for LSH candidate generation "
                         "(degenerate buckets dropped with logged "
                         "accounting); 0 disables")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sis_spark.operators.dedup import minhash_lsh_pairs
    from sis_spark.operators.graph import dedup_clusters
    from sis_spark.operators.sampling import hash_split
    from sis_spark.plans.checkpoint import CheckpointedPipeline
    from sis_spark.session import get_spark

    spark = get_spark("dedup_pipeline")
    pipe = CheckpointedPipeline(spark, args.out)

    def build_docs(s, _ups):
        return s.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang"
        )

    s_docs = pipe.stage("docs", build_docs, params={"sf": args.sf_dir})

    def build_pairs(s, ups):
        (docs,) = ups
        near = minhash_lsh_pairs(
            docs, threshold=args.threshold,
            max_bucket=args.max_bucket or None,
        ).select("a", "b")
        exact = (
            docs.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
            .filter("a <> b")
            .select("a", "b")
        )
        return near.unionByName(exact)

    s_pairs = pipe.stage(
        "pairs", build_pairs, params={"threshold": args.threshold}, upstream=[s_docs]
    )

    def build_clusters(s, ups):
        docs, pairs = ups
        return dedup_clusters(pairs, docs, "doc_id")

    s_clusters = pipe.stage(
        "clusters", build_clusters, params={}, upstream=[s_docs, s_pairs]
    )

    def build_splits(s, ups):
        (clusters,) = ups
        keep = clusters.filter("keep").select("doc_id")
        return hash_split(keep, {"train": 0.9, "val": 0.05, "test": 0.05}, "doc_id")

    s_splits = pipe.stage("splits", build_splits, params={}, upstream=[s_clusters])

    docs_n = s_docs.manifest["row_count"]
    pairs_n = s_pairs.manifest["row_count"]
    clusters_df = s_clusters.read(spark)
    splits_df = s_splits.read(spark)
    kept = {r["split"]: r["n"] for r in
            splits_df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    from sis_spark.operators.buckets import LAST_DROP_STATS

    print(json.dumps({
        "documents": docs_n,
        "dup_pairs": pairs_n,
        "clusters": clusters_df.select("cluster").distinct().count(),
        "kept": sum(kept.values()),
        "splits": kept,
        # hot-bucket drop accounting (r5): empty when no bucket exceeded
        # the cap; otherwise the recall given up is visible in the job
        # output, not just a log line (ADVICE r4)
        "dropped_buckets": LAST_DROP_STATS,
    }))


if __name__ == "__main__":
    main()
