"""Patch extraction (operators/imageops.patchify_*): numpy ground truth,
re-encoded patch bytes, fused digest parity.

The gate `patchify` verifies decode->slice->digest against the SQL oracle;
these tests pin the grid semantics and the bytes path the oracle can't see.
"""

import numpy as np

from sis_spark.operators.imageops import (
    patchify_array,
    patchify_checksums,
    patchify_images,
    pixel_checksum,
)
from sis_spark.raster import codec
from sis_spark.sources.images import images_table, pixels_for


def test_patchify_array_grid_and_truncation():
    arr = pixels_for(5, 50, 34)  # (h=34, w=50, 3), patch 16 -> 4x3 grid
    tiles = list(patchify_array(arr, 16))
    assert [(py, px) for py, px, _ in tiles] == [
        (py, px) for py in range(3) for px in range(4)
    ]
    for py, px, t in tiles:
        assert t.shape == (min(16, 34 - py * 16), min(16, 50 - px * 16), 3)
        assert np.array_equal(
            t, arr[py * 16: py * 16 + 16, px * 16: px * 16 + 16]
        )
    # reassembly tiles the original exactly (disjoint, complete)
    rec = np.zeros_like(arr)
    for py, px, t in tiles:
        rec[py * 16: py * 16 + t.shape[0], px * 16: px * 16 + t.shape[1]] = t
    assert np.array_equal(rec, arr)


def test_patchify_images_bytes_reassemble(spark):
    img = images_table(spark, 12, columns=["image_id", "bytes", "fmt", "w", "h"])
    img = img.filter(img.fmt != "jpeg")
    src = {r["image_id"]: (bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
           for r in img.collect()}
    out = patchify_images(img, patch=24).collect()
    by_img = {}
    for r in out:
        by_img.setdefault(r["image_id"], []).append(r)
    assert set(by_img) == set(src)
    for iid, rows in by_img.items():
        buf, fmt, w, h = src[iid]
        full = codec.decode(buf, fmt)
        rec = np.zeros_like(full)
        for r in rows:
            t = codec.decode(bytes(r["bytes"]), r["fmt"])
            assert t.shape == (r["h"], r["w"], 3)
            rec[r["py"] * 24: r["py"] * 24 + r["h"],
                r["px"] * 24: r["px"] * 24 + r["w"]] = t
        assert np.array_equal(rec, full)


def test_patchify_checksums_fused_equals_bytes_path(spark):
    img = images_table(spark, 9, columns=["image_id", "bytes", "fmt"])
    img = img.filter(img.fmt != "jpeg")
    fused = {(r["image_id"], r["py"], r["px"]): r["checksum"]
             for r in patchify_checksums(img, patch=16).collect()}
    via_bytes = {
        (r["image_id"], r["py"], r["px"]): pixel_checksum(
            codec.decode(bytes(r["bytes"]), r["fmt"])
        )
        for r in patchify_images(img, patch=16).collect()
    }
    assert fused == via_bytes and len(fused) > 0
