#!/usr/bin/env python
"""End-to-end image batch-prep job: image+caption table -> perceptual dedup
-> aspect-bucketed batch assembly -> resize to bucket resolution ->
WebDataset tar shards, checkpointed and resumable.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/prep_images.py \
        --n-images 20000 --out /tmp/sis_prep_out

Stages (each a parquet + manifest checkpoint; re-running the identical
command resumes from the completed stages):

  1. images  — the input_hint table (image_id, bytes, w, h, fmt, caption,
               phash), generated distributed (mapInPandas source), plus a
               --dup-fraction of exact duplicate rows under fresh ids.
               The base corpus also carries INTRINSIC byte duplicates
               beyond id 2304: dims/fmt cycle with period 9 and the pixel
               formula with period 256, so byte content repeats with
               period lcm(9,256)=2304 — exact dedup provably keeps
               min(n, 2304) of the base rows
  2. keep    — dedup keep list.  Default --dedup exact: md5(bytes)
               groups -> min-id survivor.  --dedup phash runs the banded
               Hamming pipeline instead (candidate pairs -> components);
               NOTE the synthetic pixel pattern differs between ids only
               by a constant intensity offset, which the DCT-sign phash is
               invariant to — on THIS data phash collapses each shape
               class to one survivor (expected, documented; on real data
               use it with a calibrated --max-hamming)
  3. prepped — kept images resized to their aspect bucket's canonical
               resolution (codegen bucket argmin + batch/slot window;
               the decode/resize/encode Arrow stage is map-only)
  4. shards  — deterministic tar shards (one task per shard, ranged-read
               index sidecars); the stage checkpoint is the shard manifest

The emitted JSON line reports corpus/kept/bucket/shard counts — the job's
scoreboard contract.
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
    ap.add_argument("--out", default="/tmp/sis_prep_job")
    ap.add_argument("--n-images", type=int, default=5000)
    ap.add_argument("--dup-fraction", type=float, default=0.1,
                    help="fraction of extra exact-duplicate rows synthesized")
    ap.add_argument("--dedup", choices=["exact", "phash"], default="exact")
    ap.add_argument("--max-hamming", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--tar-shards", type=int, default=4)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sis_spark.operators.dedup import exact_dedup_groups
    from sis_spark.operators.graph import dedup_clusters
    from sis_spark.operators.imageops import (
        aspect_batches, phash_near_dups, resize_to_bucket,
    )
    from sis_spark.plans.checkpoint import CheckpointedPipeline
    from sis_spark.session import get_spark
    from sis_spark.sources.images import images_table
    from sis_spark.sources.tar_shards import write_tar_shards

    spark = get_spark("prep_images")
    pipe = CheckpointedPipeline(spark, args.out)

    n_dups = int(args.n_images * args.dup_fraction)

    def build_images(s, _ups):
        base = images_table(s, args.n_images)
        if n_dups == 0:
            return base
        # duplicates: rows 0..n_dups-1 replayed byte-identical under new ids
        # ('xdup-' sorts after 'img-', so the min-id survivor is the original)
        dups = images_table(s, n_dups).withColumn(
            "image_id",
            F.format_string("xdup-%012d",
                            F.substring("image_id", 5, 12).cast("long")),
        )
        return base.unionByName(dups)

    s_images = pipe.stage(
        "images", build_images,
        params={"n": args.n_images, "dups": n_dups},
    )

    def build_keep(s, ups):
        (img,) = ups
        if args.dedup == "exact":
            groups = exact_dedup_groups(img, text_col="bytes", id_col="image_id")
            return groups.select(F.col("canonical_id").alias("image_id"))
        pairs = phash_near_dups(img, max_hamming=args.max_hamming).select(
            F.col("image_id").alias("a"), F.col("image_id_2").alias("b")
        )
        return dedup_clusters(pairs, img, "image_id").filter("keep").select("image_id")

    s_keep = pipe.stage(
        "keep", build_keep,
        params={"dedup": args.dedup, "max_hamming": args.max_hamming},
        upstream=[s_images],
    )

    def build_prepped(s, ups):
        img, keep = ups
        kept = img.join(keep, "image_id", "left_semi")
        sized = resize_to_bucket(kept)
        slots = aspect_batches(kept, batch_size=args.batch_size).select(
            "image_id", "batch", "slot"
        )
        captions = kept.select("image_id", "caption")
        return sized.join(slots, "image_id").join(captions, "image_id")

    s_prepped = pipe.stage(
        "prepped", build_prepped, params={"batch_size": args.batch_size},
        upstream=[s_images, s_keep],
    )

    def build_shards(s, ups):
        (prepped,) = ups
        # shard by bucket+batch so one training batch never splits shards
        df = prepped.withColumn(
            "shard",
            (F.xxhash64("bucket", "batch") % args.tar_shards + args.tar_shards)
            .cast("int") % args.tar_shards,
        )
        return write_tar_shards(
            df.select("image_id", "bytes", "fmt", "caption", "shard",
                      "w", "h", "bucket", "batch", "slot"),
            os.path.join(args.out, "shards"),
            shard_col="shard",
        )

    s_shards = pipe.stage(
        "shards", build_shards, params={"tar_shards": args.tar_shards},
        upstream=[s_prepped],
    )

    prepped = s_prepped.read(spark)
    manifest = s_shards.read(spark)
    print(json.dumps({
        "images": s_images.manifest["row_count"],
        "kept": s_keep.manifest["row_count"],
        "buckets": prepped.select("bucket").distinct().count(),
        "batches": prepped.select("bucket", "batch").distinct().count(),
        "tar_shards": manifest.count(),
        "shard_bytes": int(manifest.agg(F.sum("bytes").alias("b")).first()["b"]),
    }))


if __name__ == "__main__":
    main()
