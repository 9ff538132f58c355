"""Image codecs (pure numpy + stdlib zlib — no PIL/libjpeg in this image).

Formats:
* ``raw``  — little-endian header (w, h, channels) + uint8 pixel bytes.
* ``png``  — real, standards-compliant PNG (8-bit RGB/gray, filter 0,
  zlib-deflate), pure Python encoder/decoder.  Lossless.
* ``jpeg`` — REAL baseline JPEG (ITU-T T.81), pure-numpy encoder/decoder in
  jpeg.py: 8x8 DCT, Annex-K quantization with IJG quality scaling, canonical
  Huffman entropy coding, JFIF markers.  Deterministic.  The default quality
  (98) keeps decode(encode(x)) at PSNR >= 40 dB even on the synthetic
  sawtooth pixel pattern (worst case for DCT ringing); smooth natural
  content round-trips near-losslessly.

The decoded-pixel invariant mirrors the reference's raster read-consistency
testing style (St/test/CoverageReadConsistency.java:57-194): decode(encode(x))
must be pixel-exact for lossless formats and PSNR-bounded for lossy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_raw(arr: np.ndarray) -> bytes:
    h, w, c = _shape3(arr)
    return struct.pack("<III", w, h, c) + arr.astype(np.uint8).tobytes()


def decode_raw(buf: bytes) -> np.ndarray:
    w, h, c = struct.unpack_from("<III", buf, 0)
    arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * c, offset=12)
    return arr.reshape(h, w, c)


def _shape3(arr: np.ndarray):
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return h, w, c


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit grayscale (c=1) or RGB (c=3) PNG, filter type 0 per scanline."""
    h, w, c = _shape3(arr)
    arr = arr.reshape(h, w, c).astype(np.uint8)
    color_type = {1: 0, 3: 2}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter 0 (None)
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 1)  # speed over size: synthetic data, hot path
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    """Minimal PNG decoder: 8-bit gray/RGB, filters 0-4 (full Paeth set)."""
    assert buf[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    w = h = c = None
    idat = b""
    while pos < len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, *_ = struct.unpack(">IIBBBBB", payload)
            assert depth == 8, "only 8-bit supported"
            c = {0: 1, 2: 3}[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * c)
    filters = raw[:, 0]
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros_like(data)
    bpp = c
    for y in range(h):
        f = filters[y]
        line = data[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros_like(line)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(len(line)):
                line[x] = (line[x] + (line[x - bpp] if x >= bpp else 0)) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[x] = (line[x] + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8).reshape(h, w, c)


JPEG_QUALITY = 98  # default: >= 40 dB PSNR even on sawtooth synthetic content


def encode_jpeg(arr: np.ndarray) -> bytes:
    from . import jpeg
    h, w, c = _shape3(arr)
    return jpeg.encode(arr.reshape(h, w, c), quality=JPEG_QUALITY)


def decode_jpeg(buf: bytes) -> np.ndarray:
    from . import jpeg
    return jpeg.decode(buf)


CODECS = {
    "raw": (encode_raw, decode_raw),
    "png": (encode_png, decode_png),
    "jpeg": (encode_jpeg, decode_jpeg),
}


def encode(arr: np.ndarray, fmt: str) -> bytes:
    return CODECS[fmt][0](arr)


def decode(buf: bytes, fmt: str) -> np.ndarray:
    return CODECS[fmt][1](buf)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(arr: np.ndarray) -> int:
    """Stable 64-bit perceptual-ish hash: sign bits of an 8x8 block-mean
    grid vs the global mean (deterministic, pure numpy)."""
    h, w, c = _shape3(arr)
    g = arr.reshape(h, w, c).astype(np.float64).mean(axis=2)
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = 0
    for i, b in enumerate(bits):
        v |= int(b) << i
    return v - (1 << 64) if v >= (1 << 63) else v
