#!/usr/bin/env python
"""End-to-end pretraining shard builder: documents -> quality filter ->
first-fit sequence packing into context bins -> deterministic tar shards,
checkpointed and resumable.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/pack_shards.py \
        --out /tmp/sis_pack_out --sf-dir /root/testdata/sf0.1

Stages (each a parquet + manifest checkpoint; re-running the identical
command resumes from the completed stages):

  1. docs    — corpus scan, projection pruned to id/text, quality-filtered
               (composite score threshold, operators/textops.quality_score_sql)
  2. packed  — pack_greedy bin assignments (first-fit sequential per shard,
               no document straddles a bin)
  3. bins    — bin payload assembly: docs of a bin concatenated in offset
               order (JVM-side array_sort over (off, text) structs — no
               Python in the assembly plan)
  4. shards  — WebDataset tar shards via write_tar_shards (one task per
               shard, byte-deterministic tars + ranged-read index sidecars);
               the stage's parquet checkpoint is the shard manifest
               (path/samples/bytes/sha256)

The emitted JSON line reports corpus/kept/bin/shard counts and token
totals — the job's scoreboard contract.
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
    ap.add_argument("--out", default="/tmp/sis_pack_job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--capacity", type=int, default=512,
                    help="context-window token capacity per bin")
    ap.add_argument("--pack-shards", type=int, default=16,
                    help="packing shards (bounds per-task packing state)")
    ap.add_argument("--tar-shards", type=int, default=4,
                    help="output tar shard count")
    ap.add_argument("--min-quality", type=float, default=0.0)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sis_spark.operators.textops import pack_greedy, quality_score_sql
    from sis_spark.plans.checkpoint import CheckpointedPipeline
    from sis_spark.session import get_spark
    from sis_spark.sources.tar_shards import write_tar_shards

    spark = get_spark("pack_shards")
    pipe = CheckpointedPipeline(spark, args.out)

    def build_docs(s, _ups):
        return (
            s.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text",
                    F.expr(quality_score_sql("text")).alias("quality"))
            .filter(F.col("quality") >= args.min_quality)
            .select("doc_id", "text")
        )

    s_docs = pipe.stage(
        "docs", build_docs,
        params={"sf": args.sf_dir, "min_quality": args.min_quality},
    )

    def build_packed(s, ups):
        (docs,) = ups
        return pack_greedy(docs, args.capacity, args.pack_shards)

    s_packed = pipe.stage(
        "packed", build_packed,
        params={"capacity": args.capacity, "shards": args.pack_shards},
        upstream=[s_docs],
    )

    def build_bins(s, ups):
        docs, packed = ups
        joined = packed.join(docs, "doc_id")
        # concatenate each bin's docs in offset order, fully JVM-side
        parts = F.array_sort(F.collect_list(F.struct("off", "text")))
        body = F.array_join(F.transform(parts, lambda p: p["text"]), "\n\n")
        return (
            joined.groupBy("shard", "bin")
            .agg(
                body.alias("body"),
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .select(
                F.format_string("s%04d-b%06d", "shard", "bin").alias("image_id"),
                F.encode("body", "UTF-8").alias("bytes"),
                # NOT "txt": the caption member is {stem}.txt — a txt payload
                # would collide with it (write_tar_shards rejects it)
                F.lit("text").alias("fmt"),
                F.format_string("%d docs, %d tokens", "n_docs", "n_tokens")
                .alias("caption"),
                (F.col("shard") % args.tar_shards).cast("int").alias("shard"),
                "n_docs", "n_tokens",
            )
        )

    s_bins = pipe.stage(
        "bins", build_bins, params={"tar_shards": args.tar_shards},
        upstream=[s_docs, s_packed],
    )

    def build_shards(s, ups):
        (bins,) = ups
        return write_tar_shards(
            bins.drop("n_docs", "n_tokens"),
            os.path.join(args.out, "shards"),
            shard_col="shard",
        )

    s_shards = pipe.stage("shards", build_shards, params={}, upstream=[s_bins])

    bins_df = s_bins.read(spark)
    manifest = s_shards.read(spark)
    stats = bins_df.agg(
        F.count(F.lit(1)).alias("bins"),
        F.sum("n_docs").alias("docs_packed"),
        F.sum("n_tokens").alias("tokens"),
    ).first()
    print(json.dumps({
        "documents": s_docs.manifest["row_count"],
        "docs_packed": int(stats["docs_packed"]),
        "bins": int(stats["bins"]),
        "tokens": int(stats["tokens"]),
        "capacity": args.capacity,
        "tar_shards": manifest.count(),
        "shard_bytes": int(
            manifest.agg(F.sum("bytes").alias("b")).first()["b"]
        ),
    }))


if __name__ == "__main__":
    main()
