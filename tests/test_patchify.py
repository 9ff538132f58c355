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


def test_aspect_bucket_semantics(spark):
    import pandas as pd

    from sis_spark.operators.imageops import ASPECT_BUCKETS, aspect_batches

    shapes = [  # (w, h, expected bucket index)
        (64, 64, 0),    # exactly 1:1
        (40, 30, 1),    # exactly 4:3
        (30, 40, 2),    # exactly 3:4
        (64, 36, 3),    # exactly 16:9
        (36, 64, 4),    # exactly 9:16
        (100, 72, 1),   # 1.389 -> nearest 4:3 (1.333), not 1:1 or 16:9
        (100, 62, 3),   # 1.613 -> nearest 16:9 (1.778)? vs 4:3 (1.333): 16:9
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            [(f"i{k:03d}", w, h) for k, (w, h, _) in enumerate(shapes)],
            columns=["image_id", "w", "h"],
        ),
        "image_id string, w int, h int",
    )
    out = {r["image_id"]: r for r in aspect_batches(df, batch_size=2).collect()}
    for k, (w, h, want) in enumerate(shapes):
        got = out[f"i{k:03d}"]["bucket"]
        # cross-check expectation against the FP argmin definition
        fp = min(range(len(ASPECT_BUCKETS)),
                 key=lambda i: abs(w / h - ASPECT_BUCKETS[i][0] / ASPECT_BUCKETS[i][1]))
        assert got == want == fp, (w, h, got, want, fp)
    # batch/slot invariants: slots 0..batch_size-1 consecutive within batch
    rows = aspect_batches(df, batch_size=2).collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault((r["bucket"], r["batch"]), []).append(r["slot"])
    for slots in by_batch.values():
        assert sorted(slots) == list(range(len(slots))) and len(slots) <= 2


def test_resize_to_bucket_matches_kernel(spark):
    from sis_spark.operators.imageops import (
        BUCKET_TARGETS, aspect_batches, block_mean_resize, resize_to_bucket,
    )
    from sis_spark.raster import codec
    from sis_spark.sources.images import images_table

    img = images_table(spark, 9, columns=["image_id", "bytes", "fmt", "w", "h"])
    img = img.filter(img.fmt != "jpeg")
    src = {r["image_id"]: (bytes(r["bytes"]), r["fmt"]) for r in img.collect()}
    buckets = {r["image_id"]: r["bucket"] for r in
               aspect_batches(img, batch_size=4).collect()}
    out = resize_to_bucket(img).collect()
    assert len(out) == len(src)
    for r in out:
        tw, th = BUCKET_TARGETS[buckets[r["image_id"]]]
        assert (r["w"], r["h"]) == (tw, th) and r["bucket"] == buckets[r["image_id"]]
        got = codec.decode(bytes(r["bytes"]), r["fmt"])
        buf, fmt = src[r["image_id"]]
        import numpy as np
        want = block_mean_resize(codec.decode(buf, fmt).astype(np.float64), th, tw)
        assert np.array_equal(got, want)
