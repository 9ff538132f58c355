"""pack_shards job: end-to-end run, manifest resume, shard readability."""

import glob
import json
import os
import sys


def _run(out, sf_dir, capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.pack_shards import main

    main(["--out", out, "--sf-dir", sf_dir, "--capacity", "256"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def test_job_runs_resumes_and_shards_read_back(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "job")
    r1 = _run(out, sf_dir, capsys)
    assert r1["documents"] > 0
    assert r1["docs_packed"] == r1["documents"]
    assert r1["bins"] >= r1["tokens"] // 256  # capacity bound
    manifests = glob.glob(os.path.join(out, "*_manifest.json"))
    assert len(manifests) == 4
    stamps = {m: os.path.getmtime(m) for m in manifests}
    r2 = _run(out, sf_dir, capsys)
    assert r2 == r1
    assert {m: os.path.getmtime(m) for m in manifests} == stamps

    # shards read back: caption-only projection (ranged sidecar reads)
    from sis_spark.sources.tar_shards import read_tar_shards

    caps = read_tar_shards(
        spark, os.path.join(out, "shards"), columns=["image_id", "caption"]
    ).collect()
    assert len(caps) == r1["bins"]
    # captions carry the per-bin doc/token counts; totals must reconcile
    docs = tokens = 0
    for r in caps:
        nd, nt = r["caption"].split(" docs, ")
        docs += int(nd)
        tokens += int(nt.split(" ")[0])
    assert docs == r1["docs_packed"] and tokens == r1["tokens"]

    # full read: every bin body is within capacity unless it is one doc
    rows = read_tar_shards(spark, os.path.join(out, "shards")).collect()
    for r in rows:
        body = bytes(r["bytes"]).decode("utf-8")
        n_tok = sum(len(p.split(" ")) for p in body.split("\n\n"))
        n_docs = int(r["caption"].split(" docs,")[0])
        assert n_tok <= 256 or n_docs == 1
