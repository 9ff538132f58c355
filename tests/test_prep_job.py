"""prep_images job: end-to-end run, manifest resume, shard readability."""

import glob
import json
import os
import sys


def _run(out, capsys, *extra):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.prep_images import main

    main(["--out", out, "--n-images", "600", "--batch-size", "16", *extra])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_job_runs_resumes_and_shards_read_back(spark, tmp_path, capsys):
    out = str(tmp_path / "job")
    r1 = _run(out, capsys)
    # 600 base (< intrinsic duplicate period 2304, all unique) + 60 dups
    assert r1["images"] == 660 and r1["kept"] == 600
    manifests = glob.glob(os.path.join(out, "*_manifest.json"))
    assert len(manifests) == 4
    stamps = {m: os.path.getmtime(m) for m in manifests}
    r2 = _run(out, capsys)
    assert r2 == r1
    assert {m: os.path.getmtime(m) for m in manifests} == stamps

    from sis_spark.sources.tar_shards import read_tar_shards

    rows = read_tar_shards(
        spark, os.path.join(out, "shards"),
        columns=["image_id", "w", "h", "bucket", "batch", "slot", "caption"],
    ).collect()
    assert len(rows) == r1["kept"]
    # no duplicate survived, and every member of a batch shares the bucket shape
    assert all(not r["image_id"].startswith("xdup-") for r in rows)
    shapes = {}
    for r in rows:
        assert r["slot"] < 16
        shapes.setdefault((r["bucket"], r["batch"]), set()).add((r["w"], r["h"]))
    assert all(len(s) == 1 for s in shapes.values())
    assert len(shapes) == r1["batches"]
