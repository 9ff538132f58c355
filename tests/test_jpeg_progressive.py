"""Progressive (SOF2) JPEG decode: round-trip parity with the baseline path.

The progressive encoder (test/tooling, libjpeg default scan script) and the
baseline encoder quantize identical coefficients, so decoding both streams
must give IDENTICAL pixels — any defect in spectral-selection banding,
successive-approximation bit planes, EOB-run coding, or the AC correction-bit
procedure (T.81 G.1.2.3) breaks exact equality.  No Spark needed.

Reference behavior: the reference accepts progressive JPEG via Java ImageIO
(S/storage/geotiff inflater delegation); web corpora are ~10-20% SOF2.
"""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.raster import jpeg


def _image(h, w, nc, seed=0, noise=8.0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = np.sin(x / 11.0) * np.cos(y / 13.0) * 90.0 + 128.0
    img = base[:, :, None].repeat(nc, axis=2) + rng.normal(0, noise, (h, w, nc))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img if nc == 3 else img[:, :, 0]


@pytest.mark.parametrize("h,w,nc,sub", [
    (77, 101, 3, True),    # 4:2:0 — interleaved DC MCUs + distinct comp grids
    (77, 101, 3, False),   # 4:4:4
    (64, 64, 1, False),    # grayscale
    (9, 17, 3, True),      # smaller than one 4:2:0 MCU in one axis
    (8, 8, 1, False),      # single block
])
def test_progressive_equals_baseline(h, w, nc, sub):
    img = _image(h, w, nc, seed=h + w)
    pb = jpeg.encode_progressive(img, quality=88, subsample=sub)
    bb = jpeg.encode(img, quality=88, subsample=sub)
    assert pb[3] != bb[3] or pb != bb  # distinct streams
    dp, db = jpeg.decode(pb), jpeg.decode(bb)
    assert np.array_equal(dp, db)


def test_sof2_marker_present():
    img = _image(24, 24, 3)
    pb = jpeg.encode_progressive(img)
    assert b"\xff\xc2" in pb and b"\xff\xc0" not in pb
    # more than one scan: count SOS markers
    assert pb.count(b"\xff\xda") >= 5


def test_spectral_selection_only():
    """Scan script with Al=0 everywhere: pure spectral selection, no
    successive approximation (exercises _ac_first EOB runs without the
    refinement path)."""
    img = _image(40, 56, 3, seed=5)
    scans = [([0, 1, 2], 0, 0, 0, 0),
             ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0),
             ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    pb = jpeg.encode_progressive(img, quality=90, scans=scans)
    assert np.array_equal(jpeg.decode(pb), jpeg.decode(jpeg.encode(img, quality=90)))


def test_deep_successive_approximation():
    """Al=3 first pass then three refinement scans per band — many correction
    bits and newly-nonzero insertions per scan."""
    img = _image(48, 48, 1, seed=9, noise=25.0)
    scans = [([0], 0, 0, 0, 3), ([0], 1, 63, 0, 3),
             ([0], 0, 0, 1, 2), ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 1),
             ([0], 1, 63, 1, 0), ([0], 0, 0, 1, 0)]
    # DC refinements must step Al one at a time; chain 3->2->1->0
    scans = [([0], 0, 0, 0, 3), ([0], 1, 63, 0, 3),
             ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
             ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    pb = jpeg.encode_progressive(img, quality=85, scans=scans)
    assert np.array_equal(jpeg.decode(pb), jpeg.decode(jpeg.encode(img, quality=85)))


def test_sparse_highfreq_zrl_refinement():
    """Near-flat image with isolated high-frequency spikes: long zero runs
    (ZRL) inside refinement scans and long EOB runs across blocks."""
    img = np.full((96, 96), 128, np.uint8)
    rng = np.random.default_rng(2)
    ii = rng.integers(0, 96, 40)
    jj = rng.integers(0, 96, 40)
    img[ii, jj] = 255
    pb = jpeg.encode_progressive(img, quality=92)
    assert np.array_equal(jpeg.decode(pb), jpeg.decode(jpeg.encode(img, quality=92)))


def test_fidelity_contract():
    """North-rule check on the progressive path too: PSNR >= 40 dB at
    quality >= 90 for smooth content."""
    y, x = np.mgrid[0:64, 0:64]
    img = np.clip(np.sin(x / 15.0) * 80 + 128 + y * 0.2, 0, 255).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode_progressive(img, quality=95))[:, :, 0]
    mse = ((dec.astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) >= 40.0
