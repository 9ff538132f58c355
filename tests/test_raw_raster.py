"""ESRI raw raster store: BIL/BIP/BSQ layouts, byte order, signed/float
dtypes, padded BIL rows, header defaults."""

import numpy as np
import pytest

from sis_spark.raster.grid import GridGeometry
from sis_spark.sources.raw_raster import (
    format_raw_raster, hdr_geometry, parse_hdr, read_raw_raster,
)


def _collect(tiles, gg, dtype, tile_size=64):
    rows = tiles.collect()
    nb = max(r["band"] for r in rows) + 1
    out = np.zeros((gg.height, gg.width, nb), dtype=dtype)
    for r in rows:
        blk = np.frombuffer(r["data"], dtype=dtype).reshape(tile_size, tile_size)
        y0, x0 = r["ty"] * tile_size, r["tx"] * tile_size
        sub = blk[: max(0, min(tile_size, gg.height - y0)),
                  : max(0, min(tile_size, gg.width - x0))]
        out[y0:y0 + sub.shape[0], x0:x0 + sub.shape[1], r["band"]] = sub
    return out


@pytest.mark.parametrize("layout", ["BIL", "BIP", "BSQ"])
@pytest.mark.parametrize("byteorder,dtype", [
    ("I", np.uint16), ("M", np.int16), ("I", np.float32)])
def test_roundtrip(spark, tmp_path, layout, byteorder, dtype):
    h, w, nb = 70, 100, 3
    gy, gx = np.mgrid[0:h, 0:w]
    arr = np.stack([(gx * 3 + gy * 7 + b * 11) % 120 for b in range(nb)],
                   axis=-1).astype(dtype)
    gg = GridGeometry((0, 0, w - 1, h - 1), (0.5, 0.0, 10.0, 0.0, -0.5, 90.0))
    data, hdr = format_raw_raster(arr, gg, layout=layout, byteorder=byteorder)
    (tmp_path / "r.bil").write_bytes(data)
    (tmp_path / "r.hdr").write_text(hdr)

    tiles, gg2, dt2 = read_raw_raster(spark, str(tmp_path / "r.bil"))
    assert gg2.affine == gg.affine
    assert dt2.kind == np.dtype(dtype).kind and dt2.itemsize == np.dtype(dtype).itemsize
    back = _collect(tiles, gg2, dt2)
    assert (back == arr).all()


def test_padded_bil_rows(spark, tmp_path):
    # BANDROWBYTES larger than ncols*bps (row padding) must be honored
    h, w, nb, pad = 5, 7, 2, 3
    arr = (np.arange(h * w * nb).reshape(h, w, nb) % 250).astype(np.uint8)
    br = w + pad
    buf = bytearray()
    for y in range(h):
        for b in range(nb):
            buf += arr[y, :, b].tobytes() + b"\0" * pad
    (tmp_path / "p.bil").write_bytes(bytes(buf))
    (tmp_path / "p.hdr").write_text(
        f"NROWS {h}\nNCOLS {w}\nNBANDS {nb}\nNBITS 8\nLAYOUT BIL\n"
        f"BANDROWBYTES {br}\nTOTALROWBYTES {nb * br}\n")
    tiles, gg, dt = read_raw_raster(spark, str(tmp_path / "p.bil"))
    assert (_collect(tiles, gg, dt) == arr).all()


def test_header_defaults():
    h = parse_hdr("NROWS 4\nNCOLS 6\n")
    gg, dtype, info = hdr_geometry(h)
    # defaults: 1 band uint8, xdim=ydim=1, ULXMAP=0, ULYMAP=NROWS-1,
    # cell-CENTER anchor -> corner affine shifted by half a cell
    assert dtype == np.dtype("<u1") and info["nbands"] == 1
    assert gg.affine == (1.0, 0.0, -0.5, 0.0, -1.0, 3.5)
    assert info["layout"] == "BIL" and info["total_row"] == 6
