"""RIFF codecs (sources/riff.py): WAV/PCM16 + AVI/MJPG, and the media
pipeline stages running on the real bitstreams."""

import numpy as np
import pytest

from sis_spark.operators import media
from sis_spark.raster import codec
from sis_spark.sources import riff


def tones(n=8000, sr=8000):
    t = np.arange(n) / sr
    return 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 97 * t)


def test_wav_roundtrip_mono_and_stereo():
    x = tones()
    y, rate = riff.decode_wav(riff.encode_wav(x, 8000))
    assert rate == 8000 and y.shape == x.shape
    # int16 bound: 0.5/32767 rounding + |x|/32768 scale asymmetry
    assert np.abs(x - y).max() < 1.5 / 32768
    st = np.stack([x, -x], axis=1)
    y2, _ = riff.decode_wav(riff.encode_wav(st, 8000))
    assert y2.shape == st.shape and np.abs(st - y2).max() < 1.5 / 32768


def test_wav_rejects_non_pcm():
    buf = bytearray(riff.encode_wav(tones(100), 8000))
    i = buf.find(b"fmt ") + 8
    buf[i] = 3  # IEEE float fmt tag
    with pytest.raises(ValueError, match="PCM16"):
        riff.decode_wav(bytes(buf))
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        riff.decode_wav(b"garbage bytes here")


def frames_for(n=8, w=32, h=24):
    x = np.arange(w)[None, None, :, None]
    y = np.arange(h)[None, :, None, None]
    f = np.arange(n)[:, None, None, None]
    ch = np.arange(3)[None, None, None, :]
    return ((x * 5 + y * 11 + f * 17 + ch * 29) % 256).astype(np.uint8)


def test_avi_mjpg_roundtrip_and_header():
    frames = frames_for()
    avi = riff.encode_avi_mjpg(frames, fps=6.0, quality=98)
    info = riff.parse_avi(avi)
    assert (info["n_frames"], info["w"], info["h"]) == (8, 32, 24)
    assert abs(info["fps"] - 6.0) < 0.01
    assert len(info["frames"]) == 8
    dec = riff.decode_avi_frames(avi, np.arange(8))
    assert dec.shape == frames.shape
    for i in range(8):
        assert codec.psnr(frames[i], dec[i]) >= 40.0


def test_avi_frame_seek_decodes_only_requested():
    """Seek path: decoding a subset equals the corresponding full decodes,
    and each frame chunk is a standalone JPEG (SOI/EOI delimited)."""
    frames = frames_for(12)
    avi = riff.encode_avi_mjpg(frames, fps=4.0, quality=98)
    info = riff.parse_avi(avi)
    off, size = info["frames"][5]
    assert avi[off:off + 2] == b"\xff\xd8" and avi[off + size - 2:off + size] == b"\xff\xd9"
    sub = riff.decode_avi_frames(avi, np.array([2, 5, 11]))
    full = riff.decode_avi_frames(avi, np.arange(12))
    assert np.array_equal(sub, full[[2, 5, 11]])


def test_media_pipeline_on_real_codecs(spark):
    """audio_features + sample_frames end-to-end over wav-pcm16 / mjpg-avi
    payloads, and parity with the fake-codec plumbing (same content)."""
    import pandas as pd

    audio = spark.createDataFrame(
        pd.DataFrame([media.make_wav_audio(i) for i in range(4)]),
        schema=media.AUDIO_SCHEMA)
    feats = audio_rows = media.audio_features(audio).collect()
    assert len(audio_rows) == 4 * 40  # 1s @ 8kHz, 25ms frames
    fake = spark.createDataFrame(
        pd.DataFrame([media.make_fake_audio(i) for i in range(4)]),
        schema=media.AUDIO_SCHEMA)
    fake_feats = media.audio_features(fake).collect()
    by_key = {(r["media_id"], r["frame"]): r for r in fake_feats}
    for r in feats:
        ref = by_key[(r["media_id"], r["frame"])]
        assert abs(r["rms"] - ref["rms"]) < 1e-4  # int16 quantization only

    video = spark.createDataFrame(
        pd.DataFrame([media.make_mjpg_video(i) for i in range(3)]),
        schema=media.VIDEO_SCHEMA)
    sampled = media.sample_frames(video, every_n=4).collect()
    assert len(sampled) == 3 * 3  # frames 0, 4, 8 of 12
    fakev = spark.createDataFrame(
        pd.DataFrame([media.make_fake_video(i) for i in range(3)]),
        schema=media.VIDEO_SCHEMA)
    fake_sampled = {(r["media_id"], r["frame"]): r for r in
                    media.sample_frames(fakev, every_n=4).collect()}
    for r in sampled:
        ref = fake_sampled[(r["media_id"], r["frame"])]
        assert abs(r["mean_intensity"] - ref["mean_intensity"]) < 3.0  # lossy MJPG
