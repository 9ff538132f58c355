"""Augmentation kernels: numpy ground truth, encode round-trip, fused digest.

The gate `augment` verifies the decode->kernel->digest path against the SQL
oracle; these tests pin the kernel semantics themselves and the re-encoded
bytes path the oracle can't see.
"""

import numpy as np
import pytest

from sis_spark.operators.imageops import (
    AUG_OPS,
    augment_array,
    augment_checksums,
    augment_images,
    pixel_checksum,
)
from sis_spark.raster import codec
from sis_spark.sources.images import images_table, make_row, pixels_for


def test_augment_array_semantics():
    arr = pixels_for(7, 8, 6)  # (h=6, w=8, 3)
    assert np.array_equal(augment_array(arr, "hflip"), arr[:, ::-1])
    assert np.array_equal(augment_array(arr, "vflip"), arr[::-1])
    r = augment_array(arr, "rot90")
    assert r.shape == (8, 6, 3)
    for i in range(8):
        for j in range(6):
            assert np.array_equal(r[i, j], arr[j, 8 - 1 - i])
    c = augment_array(arr, "crop")
    assert c.shape == (3, 4, 3)
    assert np.array_equal(c, arr[1:4, 2:6])
    with pytest.raises(ValueError):
        augment_array(arr, "zoom")


def test_pixel_checksum_distinguishes_permutations():
    arr = pixels_for(3, 16, 16)
    sums = {op: pixel_checksum(augment_array(arr, op)) for op in AUG_OPS}
    assert len(set(sums.values())) == len(sums)  # weighting breaks symmetry
    assert sums["hflip"] != pixel_checksum(arr)


def test_augment_images_bytes_roundtrip(spark):
    n = 12
    img = images_table(spark, n, partitions=2).filter("fmt <> 'jpeg'")
    out = {(r["image_id"], r["op"]): r for r in augment_images(img).collect()}
    ids = [i for i in range(n) if i % 3 != 2]
    assert len(out) == len(ids) * len(AUG_OPS)
    for i in ids:
        row = make_row(i)
        arr = codec.decode(row["bytes"], row["fmt"])
        for op in AUG_OPS:
            r = out[(row["image_id"], op)]
            exp = augment_array(arr, op)
            assert (r["w"], r["h"]) == (exp.shape[1], exp.shape[0])
            got = codec.decode(bytes(r["bytes"]), r["fmt"])
            assert np.array_equal(got, exp), (i, op)


def test_augment_checksums_fused_equals_bytes_path(spark):
    img = images_table(spark, 9, partitions=2).filter("fmt <> 'jpeg'")
    fused = {(r["image_id"], r["op"]): r["checksum"]
             for r in augment_checksums(img).collect()}
    for r in augment_images(img).collect():
        arr = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert fused[(r["image_id"], r["op"])] == pixel_checksum(arr)
