"""ESRI ASCII grid store: header variants (corner/center registration,
CELLSIZE vs DX/DY), nodata -> NaN, round-trip, and the non-line-per-row
fallback parse."""

import numpy as np

from sis_spark.raster.grid import GridGeometry
from sis_spark.raster.tiles import tiles_to_raster
from sis_spark.sources.ascii_grid import (
    format_ascii_grid, grid_geometry_of, parse_ascii_header, read_ascii_grid,
)


def test_header_corner_vs_center():
    h, n = parse_ascii_header(
        ["NCOLS 4", "NROWS 3", "XLLCORNER 10", "YLLCORNER 20",
         "CELLSIZE 2", "NODATA_VALUE -1", "1 2 3 4"])
    assert n == 6
    gg, nodata = grid_geometry_of(h)
    assert nodata == -1.0
    # top edge = yll + cellsize*h; y scale negative (north->south rows)
    assert gg.affine == (2.0, 0.0, 10.0, 0.0, -2.0, 26.0)
    assert (gg.width, gg.height) == (4, 3)

    h2, _ = parse_ascii_header(
        ["ncols 4", "nrows 3", "xllcenter 11", "yllcenter 21", "dx 2", "dy 1"])
    gg2, nodata2 = grid_geometry_of(h2)
    assert np.isnan(nodata2)
    # center registration shifts each axis by half a cell
    assert gg2.affine == (2.0, 0.0, 10.0, 0.0, -1.0, 23.5)


def test_roundtrip_distributed(spark, tmp_path):
    w, h = 100, 70  # ragged tiles both axes
    gy, gx = np.mgrid[0:h, 0:w]
    arr = ((gx * 3 + gy * 11) % 50).astype(np.float64)
    arr[10, 20] = np.nan
    gg = GridGeometry((0, 0, w - 1, h - 1), (0.5, 0.0, 5.0, 0.0, -0.5, 100.0))
    p = tmp_path / "g.asc"
    p.write_text(format_ascii_grid(arr, gg, nodata=-9999.0))

    tiles, gg2 = read_ascii_grid(spark, str(p))
    assert gg2.affine == gg.affine
    back = tiles_to_raster(tiles, gg2, dtype=np.float64)[..., 0]
    assert back.shape == (h, w)
    assert np.isnan(back[10, 20])
    m = ~np.isnan(arr)
    assert (back[m] == arr[m]).all()


def test_fallback_multirow_lines(spark, tmp_path):
    # body NOT one-line-per-row -> driver fallback parse
    p = tmp_path / "g.asc"
    p.write_text(
        "NCOLS 3\nNROWS 2\nXLLCORNER 0\nYLLCORNER 0\nCELLSIZE 1\n"
        "1 2\n3 4\n5 6\n")
    tiles, gg = read_ascii_grid(spark, str(p))
    back = tiles_to_raster(tiles, gg, dtype=np.float64)[..., 0]
    assert back.tolist() == [[1, 2, 3], [4, 5, 6]]
