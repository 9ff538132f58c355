#!/usr/bin/env python
"""Streaming ingest job: continuously arriving image+caption parquet files
-> watermark-bounded exact dedup -> stateless flagship spatial join ->
exactly-once batch-partitioned parquet sink with per-batch metrics
manifests.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/stream_ingest.py \
        --landing /data/landing --out /tmp/sis_stream_out [--continuous]

Contract (the streaming twin of the batch jobs' checkpoint story):

* **Source**: a parquet LANDING directory; files appear over time (the
  sandbox stand-in for a Kafka/queue feed).  Schema = the input_hint image
  table + an ``ts`` event-time column.
* **Dedup**: ``dropDuplicatesWithinWatermark`` on (phash, md5(bytes)) —
  state is bounded by the watermark window, the only formulation that
  survives an unbounded 10^12-row ingest.  Dedup state lives in the
  checkpoint: duplicates arriving across job RESTARTS (within the
  watermark) are still dropped.
* **Join**: the flagship stateless plan (broadcast cell prefilter ->
  envelope prune -> Arrow PIP refine) per micro-batch.
* **Sink**: foreachBatch writes ``data/batch=<id>/`` then a manifest
  ``manifests/batch-<id>.json`` (rows, per-cell histogram, paths) —
  manifest LAST, so a manifest's existence certifies its data; on restart
  re-delivery of a batch id is detected and skipped (exactly-once).
* **Trigger**: availableNow by default (drain the landing dir and exit —
  also the test mode); ``--continuous`` switches to a processing-time
  trigger for a long-running deployment.
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

LANDING_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double, ts timestamp"
)


def make_sink(out: str, cell_res: int = 7):
    """foreachBatch sink closure: exactly-once batch dirs + metrics manifests."""
    from pyspark.sql import functions as F

    from sis_spark.functions.cells import cell_sql_flat

    data_root = os.path.join(out, "data")
    man_root = os.path.join(out, "manifests")
    os.makedirs(man_root, exist_ok=True)

    def sink(batch_df, batch_id: int):
        man_path = os.path.join(man_root, f"batch-{batch_id}.json")
        if os.path.exists(man_path):  # restart re-delivery: already committed
            return
        path = os.path.join(data_root, f"batch={batch_id}")
        batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(path)
            hist = (
                batch_df.withColumn(
                    "cell", F.expr(cell_sql_flat("lon", "lat", cell_res))
                )
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "cell")
                .limit(32)
                .collect()
            )
            rows = batch_df.count()
        finally:
            batch_df.unpersist()
        manifest = {
            "batch_id": batch_id,
            "rows": rows,
            "path": path,
            "cell_histogram": [{"cell": r["cell"], "n": r["n"]} for r in hist],
        }
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, man_path)  # atomic: manifest certifies the data

    return sink


def build_query(spark, landing: str, out: str, polygons, watermark: str = "10 minutes",
                continuous: bool = False, interval: str = "10 seconds"):
    from pyspark.sql import functions as F

    from sis_spark.streaming.pipeline import (
        streaming_dedup_exact,
        streaming_spatial_join,
    )

    stream = (
        spark.readStream.schema(LANDING_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing)
    )
    deduped = streaming_dedup_exact(
        stream.withColumn("content_key", F.md5(F.col("bytes"))),
        ["phash", "content_key"],
        time_col="ts",
        watermark=watermark,
    )
    joined = streaming_spatial_join(deduped.drop("bytes"), polygons)
    writer = (
        joined.writeStream.foreachBatch(make_sink(out))
        .option("checkpointLocation", os.path.join(out, "_checkpoint"))
    )
    if continuous:
        writer = writer.trigger(processingTime=interval)
    else:
        writer = writer.trigger(availableNow=True)
    return writer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--landing", required=True)
    ap.add_argument("--out", default="/tmp/sis_stream_out")
    ap.add_argument("--n-polygons", type=int, default=50)
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    args = ap.parse_args(argv)

    from sis_spark import synth
    from sis_spark.session import get_spark

    spark = get_spark("stream_ingest", cores=args.cpus, shuffle_partitions=args.cpus * 2)
    polygons = synth.polygon_table_np(list(range(1, args.n_polygons + 1)))
    q = build_query(
        spark, args.landing, args.out, polygons,
        watermark=args.watermark, continuous=args.continuous,
    ).start()
    q.awaitTermination()
    mans = sorted(os.listdir(os.path.join(args.out, "manifests")))
    total = 0
    for m in mans:
        with open(os.path.join(args.out, "manifests", m)) as f:
            total += json.load(f)["rows"]
    print(json.dumps({"batches": len(mans), "rows_joined": total, "out": args.out}))


if __name__ == "__main__":
    main()
