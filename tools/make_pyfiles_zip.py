#!/usr/bin/env python
"""Package sis_spark for ``spark-submit --py-files`` deployment.

Builds a deterministic zip of the sis_spark package (sources only, no
caches/tests) — the artifact the north-rule deployment shape ships to
executors:

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files sis_spark.zip jobs/spatial_join_tiles.py ...

Deterministic: fixed timestamps + sorted entries, so re-builds of the same
tree are byte-identical (content-addressable caching on a real cluster).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "sis_spark")
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, root)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "sis_spark.zip"
    print(build(out))
