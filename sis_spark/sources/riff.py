"""RIFF containers: WAV (PCM) audio and Motion-JPEG AVI video — pure stdlib.

Upgrades the engine's audio/video columns from deterministic stand-ins to
REAL bitstreams, the same step raster/jpeg.py took for the image column:

* ``wav``  — RIFF/WAVE, PCM 16-bit little-endian, mono or interleaved
  multi-channel.  Lossless round trip at int16 resolution.
* ``avi``  — RIFF/AVI with one 'vids' stream of MJPG frames (each frame a
  baseline JPEG from raster/jpeg.py) and an idx1 index.  The index makes the
  container FRAME-SEEKABLE: decoding frame k touches only that frame's chunk
  — the time-axis analog of deferred tile decode (AT_GET_TILE_TIME,
  S/RasterLoadingStrategy.java:50-77), which is what operators/media.py's
  sample_frames needs to avoid decoding the 96% of frames it skips.

Both formats are the real on-disk layouts (a WAV here opens in any player;
the AVI layout follows the public AVI RIFF spec), so external files of the
same shape parse too — within the PCM-16/MJPG baseline envelope.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- WAV (PCM16)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float in [-1, 1] (n,) or (n, ch) -> RIFF/WAVE PCM16 bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = 2 * ch
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (float32 samples in [-1, 1], (n,) mono or (n, ch)),
    sample_rate."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8: pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif tag == b"data":
            data = payload
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    pcm = np.frombuffer(data, dtype="<i2")
    x = pcm.astype(np.float32) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch)
    return x, rate


# --------------------------------------------------------------- AVI (MJPG)

def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpg(frames: np.ndarray, fps: float = 6.0, quality: int = 95) -> bytes:
    """(n, h, w, 3) or (n, h, w) uint8 -> AVI/MJPG bytes (one vids stream,
    idx1 index for frame seeks)."""
    from ..raster import jpeg

    frames = np.asarray(frames, dtype=np.uint8)
    n = frames.shape[0]
    h, w = frames.shape[1], frames.shape[2]
    encoded = [jpeg.encode(f, quality=quality) for f in frames]

    usec = int(round(1e6 / fps))
    max_bytes = max(len(e) for e in encoded) if encoded else 0
    avih = struct.pack("<14I", usec, max_bytes * int(fps) if encoded else 0, 0,
                       0x10,  # AVIF_HASINDEX
                       n, 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    # strh: fccType 'vids', handler 'MJPG', rate/scale = fps
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIIhhhh",
        0, 0, 0, 0, 1, int(round(fps)), 0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, w, h)
    # strf: BITMAPINFOHEADER with biCompression 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = b"movi"
    offsets = []  # offset of each 00dc chunk RELATIVE to the start of 'movi'
    for e in encoded:
        offsets.append(len(movi_payload))
        movi_payload += _chunk(b"00dc", e)
    movi = _chunk(b"LIST", movi_payload)

    idx = b""
    for off, e in zip(offsets, encoded):
        # AVIINDEXENTRY: ckid, flags (AVIIF_KEYFRAME), offset (from 'movi'), size
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(e))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(buf: bytes) -> dict:
    """Parse header + index: {n_frames, w, h, fps, frames: [(abs_off, size)]}.
    Only the idx1/header bytes are touched — frame payloads stay unread."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    pos = 12
    info: dict = {"frames": []}
    movi_start = None
    idx_entries = []
    while pos + 8 <= len(buf):
        tag = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == b"LIST":
            kind = buf[pos + 8:pos + 12]
            if kind == b"movi":
                movi_start = pos + 8  # offsets in idx1 are relative to here
            elif kind == b"hdrl":
                # walk the header list for avih + strh
                p = pos + 12
                end = pos + 8 + ln
                while p + 8 <= end:
                    t2 = buf[p:p + 4]
                    (l2,) = struct.unpack_from("<I", buf, p + 4)
                    if t2 == b"avih":
                        vals = struct.unpack_from("<14I", buf, p + 8)
                        info["usec_per_frame"] = vals[0]
                        info["n_frames"] = vals[4]
                        info["w"], info["h"] = vals[8], vals[9]
                    if t2 == b"LIST":
                        p += 12
                        continue
                    p += 8 + l2 + (l2 & 1)
                pos += 8 + ln + (ln & 1)
                continue
        elif tag == b"idx1":
            p = pos + 8
            for _ in range(ln // 16):
                ckid = buf[p:p + 4]
                flags, off, size = struct.unpack_from("<III", buf, p + 4)
                if ckid == b"00dc":
                    idx_entries.append((off, size))
                p += 16
        pos += 8 + ln + (ln & 1)
    if movi_start is None:
        raise ValueError("no movi list")
    # idx1 offsets point at the chunk HEADER relative to 'movi'; payload is +8
    info["frames"] = [(movi_start + off + 8, size) for off, size in idx_entries]
    info["fps"] = 1e6 / info["usec_per_frame"] if info.get("usec_per_frame") else 0.0
    return info


def decode_avi_frames(buf: bytes, idx: np.ndarray) -> np.ndarray:
    """Seek-decode the requested frame indices only -> (len(idx), h, w, 3)."""
    from ..raster import jpeg

    info = parse_avi(buf)
    out = []
    for i in np.asarray(idx, dtype=np.int64):
        off, size = info["frames"][int(i)]
        f = jpeg.decode(buf[off:off + size])
        if f.shape[2] == 1:
            f = np.repeat(f, 3, axis=2)
        out.append(f)
    return np.stack(out) if out else np.empty((0, info["h"], info["w"], 3), np.uint8)
