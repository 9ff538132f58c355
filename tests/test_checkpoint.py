"""Checkpoint/manifest resume semantics."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sis_spark.plans.checkpoint import CheckpointedPipeline


def test_stage_runs_resumes_and_invalidates(spark, tmp_path, sf_dir):
    root = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def build_points(s, _ups):
        calls["n"] += 1
        from sis_spark.queries import _events_points

        return _events_points(s, sf_dir)

    pipe = CheckpointedPipeline(spark, root)
    s1 = pipe.stage("points", build_points, params={"sf": sf_dir})
    assert calls["n"] == 1
    assert s1.manifest["status"] == "complete"
    assert s1.manifest["row_count"] == s1.read(spark).count() > 0
    assert sum(map(int, s1.manifest["partition_rows"].values())) == s1.manifest["row_count"]

    # identical rerun: resumed from manifest, build_fn NOT called
    pipe2 = CheckpointedPipeline(spark, root)
    s1b = pipe2.stage("points", build_points, params={"sf": sf_dir})
    assert calls["n"] == 1
    assert s1b.fingerprint == s1.fingerprint

    # downstream stage with cell histogram metrics
    def build_cells(s, ups):
        from sis_spark.functions.spark_exprs import cell_col

        (pts,) = ups
        return pts.withColumn("cell", cell_col(F.col("lon"), F.col("lat"), 7))

    s2 = pipe2.stage("cells", build_cells, params={"res": 7}, upstream=[s1b], cell_col="cell")
    assert s2.manifest["n_distinct_cells"] > 0
    assert len(s2.manifest["cell_histogram_top"]) > 0
    # skew is visible: hottest cell sees much more than the median
    top = max(map(int, s2.manifest["cell_histogram_top"].values()))
    assert top > s2.manifest["row_count"] / s2.manifest["n_distinct_cells"] * 10

    # param change invalidates: new fingerprint, rebuild happens
    s2b = pipe2.stage("cells", build_cells, params={"res": 8}, upstream=[s1b], cell_col="cell")
    assert s2b.fingerprint != s2.fingerprint

    # manifests on disk are valid json with lineage
    mfiles = [f for f in os.listdir(root) if f.endswith("_manifest.json")]
    assert len(mfiles) == 3
    for mf in mfiles:
        with open(os.path.join(root, mf)) as f:
            m = json.load(f)
        assert m["status"] == "complete" and "partition_rows" in m
