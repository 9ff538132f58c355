#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

``--scaling`` mode re-runs the flagship pipeline in subprocesses at two
parallelism levels (default 8 and 32 cores — the sandbox stand-in for N and
4N executors) and writes BENCH/BASELINE.md with throughput at both plus the
scaling efficiency (north-rule target >= 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "spatial_join_pipeline",  # flagship: PIP join + tile assignment
    "cell_counts",
    "tile_counts",
    "tile_pyramid",
    "knn",
    "minhash_lsh",
    "ann_topk",
    "images_pipeline",
]


def run_queries(spark, sf_dir: str, names=None):
    """Returns (per-query seconds, flagship rows, flagship seconds)."""
    from pyspark.sql import functions as F

    from sis_spark.operators.spatial_join import spatial_join
    from sis_spark.operators.tiling import assign_tiles
    from sis_spark.queries import QUERIES, _events_points, _supplier_polygons

    timings: dict[str, float] = {}
    flagship_rows = 0
    flagship_sec = 0.0
    names = names or HEADLINE

    for name in names:
        t0 = time.time()
        if name == "spatial_join_pipeline":
            pts = _events_points(spark, sf_dir)
            polys = _supplier_polygons(spark, sf_dir)
            out = assign_tiles(spatial_join(pts, polys, "lon", "lat"), "lon", "lat", 12)
            out.count()
            # throughput denominator = input points streamed through the join
            flagship_rows = pts.count()
            flagship_sec = time.time() - t0
        elif name == "images_pipeline":
            from sis_spark.sources.images import images_table

            n_img = 20000
            img = images_table(spark, n_img)
            joined = spatial_join(
                img.select("image_id", "lon", "lat"),
                _supplier_polygons(spark, sf_dir),
                "lon", "lat",
            )
            assign_tiles(joined, "lon", "lat", 12).count()
        else:
            QUERIES[name][0](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    return timings, flagship_rows, flagship_sec


def main():
    if "--scaling" in sys.argv:
        return scaling_main()
    if "--flagship-only" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--flagship-only") + 1])
        from sis_spark.session import get_spark

        spark = get_spark(f"bench{cpus}", cores=cpus, shuffle_partitions=cpus)
        # warm up JVM + Arrow paths once, then measure
        run_queries(spark, SF_DIR, ["spatial_join_pipeline"])
        t, rows, sec = run_queries(spark, SF_DIR, ["spatial_join_pipeline"])
        print(json.dumps({"cpus": cpus, "rows": rows, "sec": sec}))
        return

    from sis_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)
    timings, rows, sec = run_queries(spark, SF_DIR)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (spatial join + tiling + kNN + dedup + ANN)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "rows_per_sec": round(rows / sec, 1) if sec else None,
                "cpus": CPUS,
            }
        )
    )


def scaling_main():
    """Same flagship job at two parallelism levels; efficiency =
    (throughput@4N / throughput@N) / 4."""
    levels = [8, 32]
    results = {}
    for cpus in levels:
        out = subprocess.run(
            [sys.executable, __file__, "--flagship-only", str(cpus)],
            capture_output=True, text=True, check=True,
            env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[levels[0]], results[levels[1]]
    tp8 = r8["rows"] / r8["sec"]
    tp32 = r32["rows"] / r32["sec"]
    eff = (tp32 / tp8) / (levels[1] / levels[0])
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — flagship spatial-join + tile-assignment throughput

Sandbox stand-in for the north rule's two-cluster-size criterion: the same
job, same input ({SF_DIR}), run at local[{levels[0]}] and local[{levels[1]}]
(N and 4N cores).

| parallelism | input rows | wall sec | rows/sec |
|---|---|---|---|
| local[{levels[0]}] | {r8['rows']} | {r8['sec']:.2f} | {tp8:,.0f} |
| local[{levels[1]}] | {r32['rows']} | {r32['sec']:.2f} | {tp32:,.0f} |

**Scaling efficiency** = ({tp32:,.0f} / {tp8:,.0f}) / {levels[1] // levels[0]}
= **{eff:.3f}** (north-rule target >= 0.8).
"""
        )
    print(json.dumps({"throughput": {str(k): results[k] for k in results}, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
