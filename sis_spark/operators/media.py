"""Audio/video column plumbing (decode STUBBED — no codec libs in this image).

Driver mandate: multimodal columns are opaque ``binary`` + typed metadata;
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) must be real even where the codec itself cannot be.  Real decoders
(libsndfile/ffmpeg) drop into ``register_audio_decoder`` /
``register_video_decoder`` without touching any plan code.

The deterministic FAKE payloads let every pipeline stage be tested
end-to-end: frame sampling, windowed audio features, and the metadata
bookkeeping all run on synthesized streams whose content is a pure function
of the media id (FIXTURES.md determinism rule).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_SCHEMA = (
    "media_id string, payload binary, sample_rate int, n_samples long, codec string"
)
VIDEO_SCHEMA = (
    "media_id string, payload binary, fps double, n_frames int, w int, h int, codec string"
)

_AUDIO_DECODERS: dict = {}
_VIDEO_DECODERS: dict = {}


def register_audio_decoder(codec: str, fn) -> None:
    """fn(payload: bytes) -> np.ndarray (n_samples,) float32 in [-1, 1]."""
    _AUDIO_DECODERS[codec] = fn


def register_video_decoder(codec: str, fn) -> None:
    """fn(payload: bytes, frame_idx: np.ndarray) -> (len(idx), h, w, 3) uint8."""
    _VIDEO_DECODERS[codec] = fn


def _decode_audio(payload: bytes, codec: str) -> np.ndarray:
    if codec in _AUDIO_DECODERS:
        return _AUDIO_DECODERS[codec](payload)
    if codec == "fake-pcm":  # deterministic stand-in: i16 little-endian PCM
        return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
    raise NotImplementedError(
        f"no audio decoder for codec {codec!r}: register one via register_audio_decoder"
    )


def _decode_video_frames(payload: bytes, codec: str, idx: np.ndarray, w: int, h: int) -> np.ndarray:
    if codec in _VIDEO_DECODERS:
        return _VIDEO_DECODERS[codec](payload, idx)
    if codec == "fake-raw":  # frame-major raw RGB — supports true frame seeks
        frame_bytes = w * h * 3
        out = np.empty((len(idx), h, w, 3), dtype=np.uint8)
        for k, i in enumerate(idx):
            off = int(i) * frame_bytes
            out[k] = np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=off).reshape(h, w, 3)
        return out
    raise NotImplementedError(
        f"no video decoder for codec {codec!r}: register one via register_video_decoder"
    )


def make_fake_audio(media_id: int, sample_rate: int = 8000, seconds: float = 1.0) -> dict:
    """Deterministic PCM: two mixed tones keyed by the id."""
    n = int(sample_rate * seconds)
    t = np.arange(n, dtype=np.float64) / sample_rate
    f1 = 200.0 + (media_id * 37) % 1800
    f2 = 100.0 + (media_id * 101) % 900
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    return {
        "media_id": f"aud-{media_id:09d}", "payload": pcm.tobytes(),
        "sample_rate": sample_rate, "n_samples": n, "codec": "fake-pcm",
    }


def make_fake_video(media_id: int, n_frames: int = 12, w: int = 16, h: int = 12) -> dict:
    x = np.arange(w)[None, None, :, None]
    y = np.arange(h)[None, :, None, None]
    f = np.arange(n_frames)[:, None, None, None]
    ch = np.arange(3)[None, None, None, :]
    arr = ((x * 5 + y * 11 + f * 17 + ch * 29 + media_id * 7) % 256).astype(np.uint8)
    return {
        "media_id": f"vid-{media_id:09d}", "payload": arr.tobytes(),
        "fps": 6.0, "n_frames": n_frames, "w": w, "h": h, "codec": "fake-raw",
    }


def audio_features(audio: DataFrame, frame_ms: int = 25) -> DataFrame:
    """Windowed audio features: RMS energy + zero-crossing rate per frame
    (the token-counting analog for audio rows).  One output row per frame."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                x = _decode_audio(bytes(r["payload"]), r["codec"])
                sr = int(r["sample_rate"])
                flen = max(1, sr * frame_ms // 1000)
                n_frames = len(x) // flen
                if n_frames == 0:
                    continue
                frames = x[: n_frames * flen].reshape(n_frames, flen)
                rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
                zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                for i in range(n_frames):
                    rows.append({
                        "media_id": r["media_id"], "frame": i,
                        "rms": float(rms[i]), "zcr": float(zcr[i]),
                    })
            if rows:
                yield pd.DataFrame(rows)

    return audio.mapInPandas(fn, schema="media_id string, frame int, rms double, zcr double")


def sample_frames(video: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: decode every Nth frame only (a seekable codec never
    touches the rest — the AT_GET_TILE_TIME discipline applied to time),
    emit per-frame mean intensity + the raw frame bytes."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                idx = np.arange(0, int(r["n_frames"]), every_n)
                frames = _decode_video_frames(
                    bytes(r["payload"]), r["codec"], idx, int(r["w"]), int(r["h"])
                )
                for k, i in enumerate(idx):
                    rows.append({
                        "media_id": r["media_id"], "frame": int(i),
                        "mean_intensity": float(frames[k].astype(np.float64).mean()),
                        "frame_bytes": frames[k].tobytes(),
                    })
            if rows:
                yield pd.DataFrame(rows)

    return video.mapInPandas(
        fn, schema="media_id string, frame int, mean_intensity double, frame_bytes binary"
    )
