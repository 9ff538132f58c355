"""Checkpointed stages with manifests: idempotent, resumable pipelines.

North-rule requirement: "every stage checkpoints per-partition lineage +
row-count/cell-histogram metrics so runs resume idempotently."  The engine
is batch (the reference has no streaming, SURVEY.md §2.9), so resume =
deterministic stage outputs + manifest files, not Structured Streaming state.

A stage's identity is a fingerprint of (stage name, params, upstream stage
fingerprints) — no wall-clock enters the identity, so re-running the same
pipeline skips completed stages; changing any upstream param invalidates
exactly the downstream stages.  The manifest records:

    fingerprint, params, upstream fingerprints,
    row_count, n_partitions, per-partition row counts (lineage),
    optional cell histogram (skew metrics for the salting planner),
    schema, wall seconds (informational only).

Storage is parquet (Iceberg jars are absent in this image; the writer is a
single choke-point so an Iceberg `writeTo` drop-in replaces `_write`).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fingerprint(name: str, params: dict, upstream: list[str]) -> str:
    payload = json.dumps({"name": name, "params": params, "upstream": upstream},
                         sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class Stage:
    def __init__(self, name: str, fingerprint: str, path: str, manifest: dict):
        self.name = name
        self.fingerprint = fingerprint
        self.path = path
        self.manifest = manifest

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str, fp: str):
        base = os.path.join(self.root, f"{name}-{fp}")
        return base, base + "_manifest.json"

    def stage(
        self,
        name: str,
        build_fn,
        params: dict | None = None,
        upstream: list[Stage] | None = None,
        cell_col: str | None = None,
        cell_hist_top: int = 20,
    ) -> Stage:
        """Run-or-resume one stage.  ``build_fn(spark, upstream_dfs) -> DataFrame``."""
        params = params or {}
        upstream = upstream or []
        fp = _fingerprint(name, params, [u.fingerprint for u in upstream])
        path, mpath = self._paths(name, fp)
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
            if manifest.get("status") == "complete":
                return Stage(name, fp, path, manifest)
        t0 = time.time()
        df = build_fn(self.spark, [u.read(self.spark) for u in upstream])
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        # lineage: per-partition row counts of the materialized output
        per_part = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .orderBy("pid")
            .collect()
        )
        manifest = {
            "status": "complete",
            "stage": name,
            "fingerprint": fp,
            "params": {k: str(v) for k, v in params.items()},
            "upstream": [u.fingerprint for u in upstream],
            "row_count": int(sum(r["count"] for r in per_part)),
            "n_partitions": len(per_part),
            "partition_rows": {str(r["pid"]): int(r["count"]) for r in per_part},
            "schema": out.schema.simpleString(),
            "wall_sec": round(time.time() - t0, 3),
        }
        if cell_col and cell_col in out.columns:
            hist = (
                out.groupBy(cell_col).count()
                .orderBy(F.col("count").desc(), F.col(cell_col))
                .limit(cell_hist_top)
                .collect()
            )
            manifest["cell_histogram_top"] = {str(r[cell_col]): int(r["count"]) for r in hist}
            manifest["n_distinct_cells"] = int(out.select(cell_col).distinct().count())
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, mpath)  # atomic completion marker
        return Stage(name, fp, path, manifest)
