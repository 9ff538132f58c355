"""dedup_pipeline job: end-to-end run + manifest resume."""

import glob
import json
import os
import sys


def _run(out, sf_dir, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.dedup_pipeline import main

    main(["--out", out, "--sf-dir", sf_dir])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_job_runs_and_resumes(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "job")
    r1 = _run(out, sf_dir, capsys)
    assert r1["documents"] > 0
    assert r1["kept"] <= r1["documents"]
    assert r1["kept"] == sum(r1["splits"].values())
    assert r1["clusters"] == r1["kept"]  # one survivor per cluster
    manifests = glob.glob(os.path.join(out, "*_manifest.json"))
    assert len(manifests) == 4
    stamps = {m: os.path.getmtime(m) for m in manifests}
    r2 = _run(out, sf_dir, capsys)
    assert r2 == r1
    # resume: no stage re-ran, manifests untouched
    assert {m: os.path.getmtime(m) for m in manifests} == stamps
