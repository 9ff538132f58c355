"""Multimodal operators: image features/thumbnails/phash near-dups and the
audio/video plumbing with deterministic fake codecs (real Spark shapes,
stubbed bitstreams per the driver mandate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def images_df(spark):
    from sis_spark.sources.images import images_table

    return images_table(spark, 120).cache()


def test_image_features_match_local(spark, images_df):
    from sis_spark.operators.imageops import image_features
    from sis_spark.raster import codec

    got = {r["image_id"]: r for r in image_features(images_df).collect()}
    assert len(got) == 120
    sample = images_df.filter("image_id = 'img-000000000007'").collect()[0]
    arr = codec.decode(bytes(sample["bytes"]), sample["fmt"]).astype(np.float64)
    r = got["img-000000000007"]
    assert r["mean_r"] == pytest.approx(arr[:, :, 0].mean())
    assert r["std"] == pytest.approx(arr.std())
    assert r["edge_energy"] > 0


def test_thumbnails_roundtrip(spark, images_df):
    from sis_spark.operators.imageops import block_mean_resize, thumbnails
    from sis_spark.raster import codec

    rows = thumbnails(images_df, size=8).collect()
    assert len(rows) == 120
    by_id = {r["image_id"]: r for r in rows}
    sample = images_df.filter("image_id = 'img-000000000010'").collect()[0]
    arr = codec.decode(bytes(sample["bytes"]), sample["fmt"]).astype(np.float64)
    want = block_mean_resize(arr, 8, 8)
    got = codec.decode(bytes(by_id["img-000000000010"]["thumb"]), "png")
    assert np.array_equal(got, want)


def test_phash_near_dups_banding_is_exact(spark):
    """Banded candidate join must find EXACTLY the pairs a brute-force
    Hamming scan finds (pigeonhole completeness)."""
    from pyspark.sql import functions as F

    from sis_spark.operators.imageops import phash_near_dups

    rng = np.random.default_rng(9)
    base = rng.integers(-(2**62), 2**62, size=40, dtype=np.int64)
    rows = [("id-%03d" % i, int(h)) for i, h in enumerate(base)]
    # planted near-dups: flip <= 4 bits of some hashes
    for i in range(10):
        h = base[i]
        for b in rng.choice(64, size=int(rng.integers(0, 5)), replace=False):
            h = np.int64(h) ^ np.int64(1 << int(b))
        rows.append(("id-dup%02d" % i, int(h)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "phash"]))

    got = {
        (r["image_id"], r["image_id_2"], r["hamming"])
        for r in phash_near_dups(df, max_hamming=6).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            ham = bin((a[1] ^ b[1]) & ((1 << 64) - 1)).count("1")
            if ham <= 6:
                x, y = sorted((a[0], b[0]))
                want.add((x, y, ham))
    assert got == want and len(want) >= 10


def test_audio_features_windows(spark):
    from sis_spark.operators.media import AUDIO_SCHEMA, audio_features, make_fake_audio

    pdf = pd.DataFrame([make_fake_audio(i) for i in range(6)])
    df = spark.createDataFrame(pdf, schema=AUDIO_SCHEMA)
    out = audio_features(df, frame_ms=25).collect()
    # 1s @ 8kHz, 25ms frames -> 40 frames per clip
    assert len(out) == 6 * 40
    assert all(0.0 <= r["zcr"] <= 1.0 for r in out)
    assert all(0.0 < r["rms"] < 1.0 for r in out)


def test_video_frame_sampling(spark):
    from sis_spark.operators.media import VIDEO_SCHEMA, make_fake_video, sample_frames

    pdf = pd.DataFrame([make_fake_video(i) for i in range(4)])
    df = spark.createDataFrame(pdf, schema=VIDEO_SCHEMA)
    out = sample_frames(df, every_n=4).collect()
    # 12 frames, every 4th -> frames 0, 4, 8
    assert len(out) == 4 * 3
    assert sorted({r["frame"] for r in out}) == [0, 4, 8]
    # frame content is the deterministic function of (x, y, frame, ch, id)
    row = next(r for r in out if r["media_id"] == "vid-000000002" and r["frame"] == 4)
    full = np.frombuffer(make_fake_video(2)["payload"], dtype=np.uint8).reshape(12, 12, 16, 3)
    assert bytes(row["frame_bytes"]) == full[4].tobytes()
    assert row["mean_intensity"] == pytest.approx(full[4].astype(np.float64).mean())


def test_unknown_codec_raises(spark):
    from sis_spark.operators.media import _decode_audio

    with pytest.raises(NotImplementedError, match="register_audio_decoder"):
        _decode_audio(b"", "mp3")


def test_phash_near_dups_zero_hamming(spark):
    """max_hamming=0 degenerates to exact phash equality — previously the
    single 64-bit band mask overflowed LongType at plan time (ADVICE r1)."""
    import pandas as pd

    from sis_spark.operators.imageops import phash_near_dups

    df = spark.createDataFrame(
        pd.DataFrame({"image_id": [1, 2, 3, 4],
                      "phash": [-123456789, -123456789, 42, 7]}),
        schema="image_id long, phash long",
    )
    rows = phash_near_dups(df, max_hamming=0).collect()
    assert [(r["image_id"], r["image_id_2"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def test_images_table_column_pruning_parity(spark):
    # the pruned generator must produce byte-identical values for the
    # selected columns (it skips only the codec work, not the semantics)
    from sis_spark.sources.images import images_table

    full = (
        images_table(spark, 200)
        .select("image_id", "w", "h", "fmt", "caption", "lon", "lat")
        .orderBy("image_id").toPandas()
    )
    pruned = (
        images_table(spark, 200,
                     columns=["image_id", "w", "h", "fmt", "caption", "lon", "lat"])
        .orderBy("image_id").toPandas()
    )
    assert full.equals(pruned)

    import pytest

    with pytest.raises(ValueError):
        images_table(spark, 10, columns=["nope"])


def test_frame_diffs_scene_cuts(spark):
    """Scene-structured clips cut exactly at scene boundaries (f % 5 == 0),
    and SAD is the exact integer sum of absolute differences."""
    import numpy as np
    import pandas as pd

    from sis_spark.operators.media import (
        VIDEO_SCHEMA, frame_diffs, make_scene_video,
    )

    video = spark.createDataFrame(
        pd.DataFrame([make_scene_video(c) for c in range(3)]),
        schema=VIDEO_SCHEMA,
    )
    out = frame_diffs(video, cut_threshold=5000).collect()
    assert len(out) == 3 * 11
    for r in out:
        m = int(r["media_id"].split("-")[1])
        v = make_scene_video(m)
        arr = np.frombuffer(v["payload"], np.uint8).reshape(12, 12, 16, 3).astype(np.int64)
        f = r["frame"]
        exp = int(np.abs(arr[f] - arr[f - 1]).sum())
        assert r["sad"] == exp
        assert r["is_cut"] == (f % 5 == 0)
