"""CRS warp: distributed gather warp vs a dense numpy reference, both
directions 4326<->3857, nearest + bilinear; missing-tile and
outside-domain behavior."""

import numpy as np
import pytest

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.tiles import _interp, raster_to_tiles, tiles_to_raster
from sis_spark.raster.warp import dst_to_src_frac, warp_crs


def _dense_reference(src, src_gg, dst_gg, method, fill=0.0):
    h_d, w_d = dst_gg.height, dst_gg.width
    gy, gx = np.mgrid[0:h_d, 0:w_d]
    fx, fy = dst_to_src_frac(gx.ravel(), gy.ravel(), src_gg, dst_gg)
    v = _interp(src.astype(np.float64), fx, fy, method, fill)
    if method == "nearest":
        outside = ((np.rint(fx) < 0) | (np.rint(fx) >= src.shape[1])
                   | (np.rint(fy) < 0) | (np.rint(fy) >= src.shape[0]))
    else:
        outside = ((np.floor(fx) < 0) | (np.floor(fx) >= src.shape[1])
                   | (np.floor(fy) < 0) | (np.floor(fy) >= src.shape[0]))
    v[outside] = fill
    return np.clip(np.rint(v), 0, 255).astype(np.uint8).reshape(h_d, w_d)


SRC_GG = GridGeometry((0, 0, 179, 99),
                      (0.2, 0.0, -18.037, 0.0, -0.2, 10.043), "EPSG:4326")
DST_GG = GridGeometry((0, 0, 127, 127),
                      (24000.0, 0.0, -1.6e6, 0.0, -24000.0, 1.1e6), "EPSG:3857")


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_forward_matches_dense(spark, method):
    gy, gx = np.mgrid[0:100, 0:180]
    src = ((gx * 7 + gy * 13) % 256).astype(np.uint8)
    tiles = raster_to_tiles(spark, src[..., None], SRC_GG)
    out = warp_crs(tiles, SRC_GG, DST_GG, method=method)
    got = tiles_to_raster(out, DST_GG)[..., 0]
    assert (got == _dense_reference(src, SRC_GG, DST_GG, method)).all()


def test_inverse_direction(spark):
    # 3857 source -> 4326 destination exercises the other transform leg
    gy, gx = np.mgrid[0:128, 0:128]
    src = ((gx * 3 + gy * 11) % 256).astype(np.uint8)
    dst_gg = GridGeometry((0, 0, 149, 89),
                          (0.17, 0.0, -13.11, 0.0, -0.17, 9.47), "EPSG:4326")
    tiles = raster_to_tiles(spark, src[..., None], DST_GG.__class__(
        DST_GG.extent, DST_GG.affine, "EPSG:3857"))
    out = warp_crs(tiles, DST_GG, dst_gg, method="bilinear")
    got = tiles_to_raster(out, dst_gg)[..., 0]
    assert (got == _dense_reference(src, DST_GG, dst_gg, "bilinear")).all()


def test_missing_tiles_read_fill(spark):
    gy, gx = np.mgrid[0:100, 0:180]
    src = ((gx + gy) % 256).astype(np.uint8)
    tiles = raster_to_tiles(spark, src[..., None], SRC_GG)
    # drop one source tile: dst pixels mapping into it must read fill
    holed = tiles.filter("NOT (tx = 1 AND ty = 0)")
    out = warp_crs(holed, SRC_GG, DST_GG, method="nearest", fill=0.0)
    got = tiles_to_raster(out, DST_GG)[..., 0]
    full = _dense_reference(src, SRC_GG, DST_GG, "nearest")
    gy, gx = np.mgrid[0:128, 0:128]
    fx, fy = dst_to_src_frac(gx.ravel(), gy.ravel(), SRC_GG, DST_GG)
    in_hole = ((np.rint(fx) // 64 == 1) & (np.rint(fy) // 64 == 0)).reshape(128, 128)
    assert (got[~in_hole] == full[~in_hole]).all()
    assert (got[in_hole] == 0).all()
    assert in_hole.any()
