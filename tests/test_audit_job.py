"""corpus_audit job: end-to-end run, manifest resume, integrity receipt."""

import glob
import json
import os
import sys


def _run(out, sf_dir, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.corpus_audit import main

    main(["--out", out, "--sf-dir", sf_dir, "--min-quality", "0.0"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_audit_job_runs_resumes_and_verifies(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "job")
    r1 = _run(out, sf_dir, capsys)
    assert r1["documents"] > 0
    assert 0 < r1["kept"] <= r1["documents"]
    assert sum(r1["langs"].values()) == r1["documents"]
    manifests = glob.glob(os.path.join(out, "*_manifest.json"))
    assert len(manifests) == 4
    stamps = {m: os.path.getmtime(m) for m in manifests}
    r2 = _run(out, sf_dir, capsys)
    assert r2 == r1
    assert {m: os.path.getmtime(m) for m in manifests} == stamps

    # the integrity receipt verifies independently: recompute one source's
    # Merkle root from the kept stage's rows
    import hashlib

    def stage_dir(name):
        (d,) = [p for p in glob.glob(os.path.join(out, f"{name}-*"))
                if not p.endswith("_manifest.json")]
        return d

    kept = spark.read.parquet(stage_dir("kept")).collect()
    man = {r["source"]: r for r in
           spark.read.parquet(stage_dir("integrity")).collect()}
    src = sorted(man)[0]
    hs = [r["h"] for r in sorted(
        (r for r in kept if r["source"] == src), key=lambda r: r["doc_id"])]
    assert man[src]["n_docs"] == len(hs)
    while len(hs) > 1:
        nxt = []
        for i in range(0, len(hs), 2):
            if i + 1 < len(hs):
                nxt.append(hashlib.md5(
                    (hs[i] + hs[i + 1]).encode()).hexdigest())
            else:
                nxt.append(hs[i])
        hs = nxt
    assert man[src]["root"] == hs[0]
