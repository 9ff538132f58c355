"""netCDF classic store: header parse, writer round-trip, CF unpacking,
coordinate-derived grid geometry, time-slice reads."""

import numpy as np

from sis_spark.raster.tiles import tiles_to_raster
from sis_spark.sources.netcdf import (
    format_netcdf, netcdf_variable_tiles, parse_netcdf_header,
)


def _scene(tmp_path):
    t, h, w = 2, 70, 100
    tt, gy, gx = np.mgrid[0:t, 0:h, 0:w]
    raw = ((gx * 3 + gy * 7 + tt * 29) % 500 - 100).astype(np.int16)
    lat = (20.0 + 0.5 * np.arange(h)).astype(np.float64)
    lon = (-10.0 + 0.5 * np.arange(w)).astype(np.float64)
    buf = format_netcdf(
        dims=[("time", t), ("lat", h), ("lon", w)],
        variables={
            "lat": (["lat"], lat, {"units": "degrees_north"}),
            "lon": (["lon"], lon, {"units": "degrees_east"}),
            "temp": (["time", "lat", "lon"], raw,
                     {"scale_factor": np.float64(0.25),
                      "add_offset": np.float64(10.5),
                      "_FillValue": np.int16(-100)}),
        },
        gattrs={"title": "synthetic scene"},
    )
    p = tmp_path / "s.nc"
    p.write_bytes(buf)
    return str(p), raw


def test_header_roundtrip(tmp_path):
    p, raw = _scene(tmp_path)
    hdr = parse_netcdf_header(open(p, "rb").read())
    assert hdr["version"] == 1
    assert dict(hdr["dims"]) == {"time": 2, "lat": 70, "lon": 100}
    assert hdr["attrs"]["title"] == "synthetic scene"
    v = hdr["vars"]["temp"]
    assert v["dims"] == ["time", "lat", "lon"] and v["shape"] == (2, 70, 100)
    assert v["attrs"]["scale_factor"] == 0.25
    assert v["attrs"]["_FillValue"] == -100


def test_slice_read_unpack(spark, tmp_path):
    p, raw = _scene(tmp_path)
    tiles, gg = netcdf_variable_tiles(spark, p, "temp", index=(1,))
    # coordinate vars are regular -> affine derived (centers -> corners)
    assert gg is not None
    assert gg.affine == (0.5, 0.0, -10.25, 0.0, 0.5, 19.75)
    back = tiles_to_raster(tiles, gg, dtype=np.float64)[..., 0]
    expect = raw[1].astype(np.float64) * 0.25 + 10.5
    expect[raw[1] == -100] = np.nan
    m = ~np.isnan(expect)
    assert (back[m] == expect[m]).all() and np.isnan(back[~m]).all()


def test_raw_read_no_unpack(spark, tmp_path):
    p, raw = _scene(tmp_path)
    tiles, gg = netcdf_variable_tiles(spark, p, "temp", index=(0,), unpack=False)
    back = tiles_to_raster(tiles, gg, dtype=np.float64)[..., 0]
    assert (back == raw[0]).all()


def test_cdf5_roundtrip_and_types():
    """CDF-5: INT64 counts, 64-bit begin offsets, and the unsigned/64-bit
    external types round-trip through the store's own writer/reader."""
    import numpy as np

    from sis_spark.sources.netcdf import _DTYPES, format_netcdf, parse_netcdf_header

    arrs = {
        "u8": np.arange(6, dtype=np.uint8).reshape(2, 3) * 40,
        "u16": np.arange(6, dtype=np.uint16).reshape(2, 3) * 10000,
        "i64": (np.arange(6, dtype=np.int64).reshape(2, 3) - 3) * 10**15,
        "u64": np.arange(6, dtype=np.uint64).reshape(2, 3) * np.uint64(10**17),
    }
    buf = format_netcdf(
        [("y", 2), ("x", 3)],
        {k: (["y", "x"], v, {"n": np.int64(7)}) for k, v in arrs.items()},
        {"title": "cdf5"},
        version=5,
    )
    hdr = parse_netcdf_header(buf)
    assert hdr["version"] == 5
    for k, v in arrs.items():
        var = hdr["vars"][k]
        data = np.frombuffer(
            buf[var["begin"]:var["begin"] + v.nbytes], dtype=var["dtype"]
        ).reshape(2, 3)
        assert np.array_equal(data.astype(v.dtype), v)
        assert var["attrs"]["n"] == 7


def test_cdf5_types_rejected_in_classic():
    import numpy as np
    import pytest

    from sis_spark.sources.netcdf import format_netcdf

    with pytest.raises(ValueError, match="CDF-5"):
        format_netcdf([("x", 2)], {"v": (["x"], np.arange(2, dtype=np.int64), {})})


def test_cdf2_roundtrip():
    """CDF-2 (64-bit offset classic): version byte 2, 64-bit begin."""
    import numpy as np

    from sis_spark.sources.netcdf import format_netcdf, parse_netcdf_header

    arr = (np.arange(20, dtype=np.float32) * 3.5).reshape(4, 5)
    buf = format_netcdf([("y", 4), ("x", 5)], {"v": (["y", "x"], arr, {})},
                        version=2)
    hdr = parse_netcdf_header(buf)
    assert hdr["version"] == 2
    var = hdr["vars"]["v"]
    data = np.frombuffer(buf[var["begin"]:var["begin"] + arr.nbytes],
                         dtype=var["dtype"]).reshape(4, 5)
    assert np.array_equal(data.astype(np.float32), arr)
