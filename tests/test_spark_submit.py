"""North-rule deployment shape: spark-submit --py-files sis_spark.zip.

Verifies the packaged artifact alone (cwd outside the repo, PYTHONPATH
clean) carries the whole engine to the driver AND the executor Python
workers — the sandbox stand-in for shipping to a real multi-executor
cluster."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except ImportError:
        return None


def test_spark_submit_pyfiles_job(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on this image")
    from tools.make_pyfiles_zip import build

    zip_path = str(tmp_path / "sis_spark.zip")
    build(zip_path, repo_root=REPO)
    # determinism: rebuild is byte-identical
    zip2 = str(tmp_path / "again.zip")
    build(zip2, repo_root=REPO)
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()

    out_dir = str(tmp_path / "job_out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "8"
    # copy the job OUT of the repo: its repo-root sys.path fallback then
    # points at tmp, so sis_spark can only come from the shipped zip
    job = str(tmp_path / "spatial_join_tiles.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "spatial_join_tiles.py"), job)
    run = subprocess.run(
        [
            submit,
            "--master", "local[8]",
            "--py-files", zip_path,
            job,
            "--n-images", "2000",
            "--out", out_dir,
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        cwd=tempfile.gettempdir(),  # NOT the repo: only the zip provides the package
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert run.returncode == 0, run.stderr[-4000:]
    line = [l for l in run.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["images"] == 2000
    assert res["join_rows"] > 0
    assert res["tile_rows"] == res["join_rows"]
