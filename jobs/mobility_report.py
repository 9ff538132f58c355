#!/usr/bin/env python
"""End-to-end mobility-analytics job: event pings -> home/work anchors ->
density clusters -> OD flows with gravity scores -> co-traveler pairs,
checkpointed and resumable.

Run (north-rule deployment shape):

    spark-submit --py-files sis_spark.zip jobs/mobility_report.py \
        --out /tmp/sis_mobility_out --sf-dir /root/testdata/sf0.1

Stages (each a parquet + manifest checkpoint; re-running the identical
command resumes from the completed stages):

  1. pings     — the event scan (projection pruned; lon/lat + local hour)
  2. anchors   — modal night/working-hours cell per user (home_work)
  3. clusters  — exact point DBSCAN over a deterministic ping subsample
  4. od        — 32x32 OD matrix + gravity-model scores
  5. cotravel  — user pairs repeatedly co-located in space-time buckets

The emitted JSON line reports ping/user counts, anchor coverage, cluster
counts by role, flow counts, and co-traveler pairs — the job's
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
    ap.add_argument("--out", default="/tmp/sis_mobility_job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--grid-n", type=int, default=64)
    ap.add_argument("--eps", type=int, default=30_000)
    ap.add_argument("--min-pts", type=int, default=4)
    ap.add_argument("--sample-mod", type=int, default=20)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from sis_spark.operators.density import dbscan, gravity_scores, od_matrix
    from sis_spark.operators.trajectory import co_travelers, home_work
    from sis_spark.plans.checkpoint import CheckpointedPipeline
    from sis_spark.queries import EPOCH_US, point_lonlat_cols
    from sis_spark.session import get_spark

    spark = get_spark("mobility_report")
    pipe = CheckpointedPipeline(spark, args.out)

    def build_pings(s, _ups):
        ev = s.read.parquet(f"{args.sf_dir}/events.parquet").select(
            "event_id", "user_id", "ts"
        )
        lon, lat = point_lonlat_cols("event_id")
        us = F.expr(EPOCH_US.format("ts"))
        return ev.select(
            "event_id", "user_id",
            lon.alias("lon"), lat.alias("lat"),
            (us.cast("long") / F.lit(3_600_000_000)).cast("long")
            .__mod__(24).alias("hour"),
            (us.cast("long") / F.lit(1_000_000)).cast("long").alias("t_s"),
        )

    s_pings = pipe.stage("pings", build_pings, params={"sf": args.sf_dir})

    def build_anchors(s, ups):
        (pings,) = ups
        return home_work(
            pings.withColumnRenamed("user_id", "u"), grid_n=args.grid_n
        )

    s_anchors = pipe.stage(
        "anchors", build_anchors, params={"grid_n": args.grid_n},
        upstream=[s_pings],
    )

    def build_clusters(s, ups):
        (pings,) = ups
        pts = pings.filter(F.col("event_id") % args.sample_mod == 0).select(
            F.col("event_id").alias("id"),
            F.floor(F.col("lon") * 10000.0).cast("long").alias("qx"),
            F.floor(F.col("lat") * 10000.0).cast("long").alias("qy"),
        )
        return dbscan(pts, eps=args.eps, min_pts=args.min_pts)

    s_clusters = pipe.stage(
        "clusters", build_clusters,
        params={"eps": args.eps, "min_pts": args.min_pts,
                "mod": args.sample_mod},
        upstream=[s_pings],
    )

    def build_od(s, ups):
        (pings,) = ups
        flows = od_matrix(
            pings.select("user_id", "event_id", "lon", "lat"), grid_n=32
        ).withColumnRenamed("n_trips", "n")
        return gravity_scores(flows)

    s_od = pipe.stage("od", build_od, params={"grid_n": 32},
                      upstream=[s_pings])

    def build_cotravel(s, ups):
        (pings,) = ups
        pts = pings.select(
            F.col("user_id").alias("u"), F.col("t_s").alias("t"),
            "lon", "lat",
        )
        return co_travelers(pts, grid_n=32, time_bin=600, min_meetings=2,
                            user_col="u")

    s_cot = pipe.stage("cotravel", build_cotravel,
                       params={"grid_n": 32, "bin": 600},
                       upstream=[s_pings])

    clusters = s_clusters.read(spark)
    roles = {r["role"]: r["n"] for r in
             clusters.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps({
        "pings": s_pings.manifest["row_count"],
        "anchors": s_anchors.manifest["row_count"],
        "cluster_points": roles,
        "clusters": clusters.filter("cluster IS NOT NULL")
                            .select("cluster").distinct().count(),
        "od_flows": s_od.manifest["row_count"],
        "co_traveler_pairs": s_cot.manifest["row_count"],
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
