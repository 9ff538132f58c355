"""Baseline JPEG codec (raster/jpeg.py) + GeoTIFF compression-7 integration.

Mirrors the reference's raster read-consistency testing style
(St/test/CoverageReadConsistency.java): decode(encode(x)) must be
PSNR-bounded for the lossy path, with the distributed read equal to the
in-memory one."""

import numpy as np
import pytest

from sis_spark.raster import codec, jpeg
from sis_spark.sources import geotiff as gt
from sis_spark.sources import images as img_src


def smooth_rgb(h=48, w=70):
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    ch = np.arange(3)[None, None, :]
    return ((x * 2 + y * 3 + ch * 40) % 256).astype(np.uint8)


# --------------------------------------------------------------- round trips

def test_roundtrip_rgb_shapes_and_psnr():
    arr = smooth_rgb()
    for q, floor in ((90, 30.0), (95, 33.0), (98, 40.0)):
        dec = jpeg.decode(jpeg.encode(arr, quality=q))
        assert dec.shape == arr.shape
        assert codec.psnr(arr, dec) >= floor


def test_roundtrip_gray_and_odd_sizes():
    rng = np.random.default_rng(11)
    for h, w in ((8, 8), (7, 5), (33, 17), (64, 1), (1, 64)):
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        dec = jpeg.decode(jpeg.encode(g, quality=98))
        assert dec.shape == (h, w, 1)
        assert codec.psnr(g[:, :, None], dec) >= 30.0


def test_subsample_420_roundtrip():
    arr = smooth_rgb(40, 56)
    buf = jpeg.encode(arr, subsample=True, quality=95)
    dec = jpeg.decode(buf)
    assert dec.shape == arr.shape
    # chroma is quartered; luma survives — bound is looser but real
    assert codec.psnr(arr, dec) >= 24.0
    # 4:2:0 must be smaller than 4:4:4 at equal quality
    assert len(buf) < len(jpeg.encode(arr, subsample=False, quality=95))


def test_restart_markers_roundtrip_and_presence():
    arr = smooth_rgb(48, 48)
    plain = jpeg.encode(arr, quality=95)
    rst = jpeg.encode(arr, quality=95, restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(jpeg.decode(rst), jpeg.decode(plain))


def test_encode_deterministic():
    arr = smooth_rgb()
    assert jpeg.encode(arr) == jpeg.encode(arr.copy())


def test_abbreviated_streams_tables_separate():
    arr = smooth_rgb()
    tables = jpeg.encode(arr, tables_only=True)
    scan = jpeg.encode(arr, omit_tables=True)
    full = jpeg.encode(arr)
    assert len(tables) + len(scan) < len(full) + len(tables)  # scan carries no tables
    dec = jpeg.decode(scan, tables=tables)
    assert np.array_equal(dec, jpeg.decode(full))
    with pytest.raises(Exception):
        jpeg.decode(scan)  # tables missing -> must fail, not misdecode


def test_progressive_marker_with_sequential_scan_rejected():
    """SOF2 now decodes (test_jpeg_progressive.py), but a stream whose SOF2
    framing carries a baseline full-band scan is malformed progressive
    (a Ss=0 scan must have Se=0, T.81 G.1) and must error, not misdecode."""
    arr = smooth_rgb(16, 16)
    buf = bytearray(jpeg.encode(arr))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(ValueError, match="Se == 0"):
        jpeg.decode(bytes(buf))


def test_codec_registry_uses_real_bitstream():
    arr = img_src.pixels_for(5, 32, 32)
    buf = codec.encode(arr, "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert codec.psnr(arr, codec.decode(buf, "jpeg")) >= 40.0


def test_huffman_tables_valid():
    """Generated canonical tables: prefix-free, <=16 bits, Kraft margin."""
    for cls in ("dc", "ac"):
        bits, syms, codes = jpeg._HUFF[cls]
        assert sum(bits) == len(syms)
        assert all(1 <= L <= 16 for _, L in codes.values())
        kraft = sum(2.0 ** -L for _, L in codes.values())
        assert kraft <= 1.0 - 2.0 ** -16 + 1e-12
        seen = set()
        for code, L in codes.values():
            assert (code, L) not in seen
            seen.add((code, L))
            # prefix-freeness vs all shorter codes
            for c2, L2 in codes.values():
                if L2 < L:
                    assert (code >> (L - L2)) != c2


# ----------------------------------------------------------- GeoTIFF JPEG

AFFINE = (0.1, 0.0, 10.0, 0.0, -0.1, 60.0)


def tiff_img(h=90, w=150):
    return smooth_rgb(h, w)


def test_geotiff_jpeg_tiled_roundtrip():
    arr = tiff_img()
    buf = gt.encode_geotiff(arr, affine=AFFINE, tile_size=64,
                            compression="jpeg", jpeg_quality=95)
    info = gt.parse_ifd(buf)
    assert info["compression"] == gt.COMP_JPEG
    assert info["jpeg_tables"] is not None
    # blocks are abbreviated: no DQT marker inside tile payloads
    blk = info["blocks"][0]
    payload = buf[blk["offset"]: blk["offset"] + blk["count"]]
    assert b"\xff\xdb" not in payload and b"\xff\xdb" in info["jpeg_tables"]
    dec, aff = gt.decode_geotiff(buf)
    assert aff == AFFINE
    assert codec.psnr(arr, dec) >= 40.0


def test_geotiff_jpeg_stripped_roundtrip():
    arr = tiff_img(70, 100)
    buf = gt.encode_geotiff(arr, tile_size=None, compression="jpeg", jpeg_quality=95)
    dec, _ = gt.decode_geotiff(buf)
    assert codec.psnr(arr, dec) >= 40.0


def test_geotiff_jpeg_predictor_rejected():
    with pytest.raises(ValueError, match="predictor"):
        gt.encode_geotiff(tiff_img(16, 16), compression="jpeg", predictor=2)


def test_geotiff_jpeg_distributed_tiles_match_inmemory(spark):
    arr = tiff_img(96, 128)
    buf = gt.encode_geotiff(arr, affine=AFFINE, tile_size=64,
                            compression="jpeg", jpeg_quality=95)
    dense, _ = gt.decode_geotiff(buf)
    tiles_df, gg = gt.geotiff_tiles(spark, buf, tile_size=64)
    rows = tiles_df.collect()
    h, w = arr.shape[:2]
    out = np.zeros((-(-h // 64) * 64, -(-w // 64) * 64, 3), dtype=np.uint8)
    for r in rows:
        t = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(64, 64)
        out[r["ty"] * 64:(r["ty"] + 1) * 64, r["tx"] * 64:(r["tx"] + 1) * 64, r["band"]] = t
    assert np.array_equal(out[:h, :w], dense)
