"""resample_gather (distributed per-tile gather warp) must match the dense
broadcast ``resample`` pixel-exactly wherever both emit a tile — the
randomized read-consistency style of St/test/CoverageReadConsistency.java
applied across two independent execution strategies."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster import tiles as rt


def _src(seed: int, h: int, w: int, nb: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, nb), dtype=np.uint8)


def _collect(df, gg, tile_size, present_only=False):
    return rt.tiles_to_raster(df, gg, tile_size=tile_size)


@pytest.mark.parametrize(
    "name,dst_affine,dst_wh",
    [
        ("identity", (1.0, 0.0, 0.0, 0.0, 1.0, 0.0), (130, 190)),
        ("shift_frac", (1.0, 0.0, 7.25, 0.0, 1.0, -3.75), (130, 190)),
        ("downscale_3x", (3.0, 0.0, 0.0, 0.0, 3.0, 0.0), (44, 64)),
        ("upscale_2x", (0.5, 0.0, 10.0, 0.0, 0.5, 5.0), (120, 160)),
    ],
)
@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_gather_matches_dense(spark, name, dst_affine, dst_wh, method):
    tile = 64
    arr = _src(42, 130, 190)
    src_gg = GridGeometry((0, 0, 189, 129), (1.0, 0.0, 0.0, 0.0, 1.0, 0.0), "EPSG:3857")
    dh, dw = dst_wh
    dst_gg = GridGeometry((0, 0, dw - 1, dh - 1), dst_affine, "EPSG:3857")
    tiles = rt.raster_to_tiles(spark, arr, src_gg, tile_size=tile)

    dense = rt.resample(tiles, src_gg, dst_gg, method=method, tile_size=tile)
    gather = rt.resample_gather(tiles, src_gg, dst_gg, method=method, tile_size=tile)

    d_rows = {(r["tx"], r["ty"], r["band"]): r["data"] for r in dense.collect()}
    g_rows = {(r["tx"], r["ty"], r["band"]): r["data"] for r in gather.collect()}
    assert g_rows, "gather produced no tiles"
    for key, gdata in g_rows.items():
        assert gdata == d_rows[key], f"tile {key} differs ({name}/{method})"
    # tiles the gather path omitted must be pure fill in the dense output
    fill_block = bytes(tile * tile)
    for key in set(d_rows) - set(g_rows):
        assert d_rows[key] == fill_block, f"missing tile {key} not pure fill"


def test_overview_pyramid_is_stride_exact(spark):
    """Every overview level must equal arr[::2^z, ::2^z] bit-exactly
    (integer-stride subsampling, no interpolation)."""
    tile = 32
    arr = _src(13, 130, 190, nb=2)
    gg = GridGeometry((0, 0, 189, 129), (1.0, 0.0, 5.0, 0.0, -1.0, 130.0), "EPSG:4326")
    tiles = rt.raster_to_tiles(spark, arr, gg, tile_size=tile)
    levels = rt.build_overviews(tiles, gg, 3, tile_size=tile)
    for z, df, lgg in levels:
        want = arr[:: 2**z, :: 2**z]
        assert (lgg.height, lgg.width) == want.shape[:2]
        got = rt.tiles_to_raster(df, lgg, tile_size=tile)
        assert np.array_equal(got, want), f"level {z} differs"
        # affine composes: level pixel 0 center maps like base pixel 0 scaled
        assert lgg.affine[0] == 2.0**z and lgg.affine[4] == -(2.0**z)


def test_gather_multiband_and_memory_bound(spark):
    """3-band source; a strong downscale makes each dst tile gather many src
    tiles — the per-group mosaic stays bounded by the dst tile's footprint."""
    tile = 32
    arr = _src(7, 96, 128, nb=3)
    src_gg = GridGeometry((0, 0, 127, 95), (1.0, 0.0, 0.0, 0.0, 1.0, 0.0), "EPSG:3857")
    dst_gg = GridGeometry((0, 0, 31, 23), (4.0, 0.0, 0.0, 0.0, 4.0, 0.0), "EPSG:3857")
    tiles = rt.raster_to_tiles(spark, arr, src_gg, tile_size=tile)
    dense = rt.resample(tiles, src_gg, dst_gg, method="bilinear", tile_size=tile)
    gather = rt.resample_gather(tiles, src_gg, dst_gg, method="bilinear", tile_size=tile)
    d = {(r["tx"], r["ty"], r["band"]): r["data"] for r in dense.collect()}
    g = {(r["tx"], r["ty"], r["band"]): r["data"] for r in gather.collect()}
    assert set(g) == set(d)
    assert all(g[k] == d[k] for k in g)


def test_gather_manifest_matches_driver_reference(spark):
    """The codegen manifest (_gather_manifest_df) must equal a driver-side
    reference evaluation of the same floor/ceil/margin expressions —
    including a rotated affine chain (least/greatest over all 4 corners)."""
    import numpy as np

    from sis_spark.raster.tiles import _gather_manifest_df

    cases = [
        (0.5, 0.0, -3.0, 0.0, 0.5, 2.0),          # axis-aligned downscale
        (1.7, 0.0, 11.0, 0.0, 2.1, -5.0),         # upscale + offset
        (0.9, 0.4, 1.0, -0.4, 0.9, 3.0),          # rotation + shear
    ]
    for center in cases:
        n_tx, n_ty, s_ntx, s_nty, ts = 5, 4, 7, 6, 64
        a, b, c, d, e, f = center
        exp = set()
        for dty in range(n_ty):
            for dtx in range(n_tx):
                fx, fy = [], []
                for x in (dtx * ts, (dtx + 1) * ts):
                    for y in (dty * ts, (dty + 1) * ts):
                        fx.append(a * x + b * y + c)
                        fy.append(d * x + e * y + f)
                sx0 = int(np.floor(min(fx) - 1.5))
                sx1 = int(np.ceil(max(fx) + 1.5))
                sy0 = int(np.floor(min(fy) - 1.5))
                sy1 = int(np.ceil(max(fy) + 1.5))
                for sty in range(max(0, sy0 // ts), min(s_nty - 1, sy1 // ts) + 1):
                    for stx in range(max(0, sx0 // ts), min(s_ntx - 1, sx1 // ts) + 1):
                        exp.add((dtx, dty, stx, sty))
        got = {(r["dtx"], r["dty"], r["stx"], r["sty"])
               for r in _gather_manifest_df(spark, center, n_tx, n_ty, s_ntx, s_nty, ts).collect()}
        assert got == exp, f"manifest mismatch for affine {center}"
