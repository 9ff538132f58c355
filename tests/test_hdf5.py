"""Minimal HDF5 (netCDF-4 profile) reader: structural round-trips via the
module's own writer — the JPEG-codec precedent (no HDF5 library in the
sandbox).  Distributed chunk read parity is in the `netcdf4_grid` gate."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.sources import hdf5 as h5


def _file(tmp_path, compress=True, chunk=None, name="t.h5"):
    arr = ((np.arange(150 * 260).reshape(150, 260) * 7) % 1000).astype(np.int32)
    lat = 40.0 + 0.5 * np.arange(150)
    lon = 5.0 + 0.5 * np.arange(260)
    buf = h5.format_hdf5(
        {
            "lat": (lat, {"units": "degrees_north"}),
            "lon": (lon, {"units": "degrees_east"}),
            "temp": (arr, {"scale_factor": 0.25, "add_offset": 10.0,
                           "_FillValue": np.int32(-999)}),
        },
        gattrs={"Conventions": "CF-1.6"},
        compress=compress, chunk=chunk,
    )
    p = tmp_path / name
    p.write_bytes(buf)
    return str(p), arr, lat, lon


def test_roundtrip_chunked_deflate(tmp_path):
    p, arr, lat, lon = _file(tmp_path)
    f = h5.H5File(p)
    assert sorted(f.datasets) == ["/lat", "/lon", "/temp"]
    d = f.datasets["/temp"]
    assert d.shape == (150, 260) and d.dtype == np.dtype("int32")
    assert d.layout["class"] == "chunked" and d.filters == [(1, [6])]
    assert d.attrs["scale_factor"] == 0.25
    assert d.attrs["_FillValue"] == -999
    assert np.array_equal(d.read(), arr)
    assert np.array_equal(f.datasets["/lat"].read(), lat)
    assert f.groups["/"]["attrs"]["Conventions"] == "CF-1.6"


def test_roundtrip_uncompressed_and_odd_chunks(tmp_path):
    p, arr, _lat, _lon = _file(tmp_path, compress=False, chunk=(37, 53))
    f = h5.H5File(p)
    d = f.datasets["/temp"]
    assert d.filters == []
    assert d.layout["chunk"] == (37, 53)
    assert np.array_equal(d.read(), arr)


def test_chunk_manifest_covers_grid(tmp_path):
    p, arr, _lat, _lon = _file(tmp_path, chunk=(64, 64))
    d = h5.H5File(p).datasets["/temp"]
    man = d.chunk_manifest()
    assert len(man) == 3 * 5  # ceil(150/64) x ceil(260/64)
    coords = {c["coords"] for c in man}
    assert (0, 0) in coords and (128, 256) in coords
    # executor kernel reads one chunk standalone
    c = next(c for c in man if c["coords"] == (64, 64))
    block = h5.read_chunk(p, c["addr"], c["nbytes"], d.filters, d.dtype, (64, 64))
    assert np.array_equal(block, arr[64:128, 64:128])


def test_float_and_unsigned_dtypes(tmp_path):
    arrs = {
        "f32": np.linspace(0, 1, 96, dtype=np.float32).reshape(8, 12),
        "f64": np.linspace(-5, 5, 96).reshape(8, 12),
        "u16": (np.arange(96, dtype=np.uint16) * 501).reshape(8, 12),
        "i64": (np.arange(96, dtype=np.int64) - 48).reshape(8, 12) * 10 ** 12,
    }
    buf = h5.format_hdf5({k: (v, {}) for k, v in arrs.items()})
    p = tmp_path / "types.h5"
    p.write_bytes(buf)
    f = h5.H5File(str(p))
    for k, v in arrs.items():
        assert np.array_equal(f.datasets[f"/{k}"].read(), v), k


def test_bad_signature_rejected(tmp_path):
    p = tmp_path / "bad.h5"
    p.write_bytes(b"not an hdf5 file at all, definitely")
    with pytest.raises(h5.H5Error, match="signature"):
        h5.H5File(str(p))


def test_netcdf4_tiles_distributed(spark, tmp_path):
    """Chunk-manifest distributed read == driver-side read (CF unpack +
    fill -> NaN), grid geometry derived from the coordinate variables."""
    p, arr, _lat, _lon = _file(tmp_path, chunk=(64, 64))
    # punch fill values in: rewrite the file with some -999
    arr2 = arr.copy()
    arr2[3, ::7] = -999
    buf = h5.format_hdf5(
        {
            "lat": (40.0 + 0.5 * np.arange(150), {}),
            "lon": (5.0 + 0.5 * np.arange(260), {}),
            "temp": (arr2, {"scale_factor": 0.25, "add_offset": 10.0,
                            "_FillValue": np.int32(-999)}),
        },
    )
    p2 = tmp_path / "fill.h5"
    p2.write_bytes(buf)
    tiles, gg, (ch, cw) = h5.netcdf4_variable_tiles(spark, str(p2), "temp")
    assert (ch, cw) == (64, 64)
    assert gg is not None
    assert gg.affine[0] == 0.5 and gg.affine[2] == 5.0 - 0.25

    want = np.where(arr2 == -999, np.nan, arr2.astype(np.float64) * 0.25 + 10.0)
    got = np.full((192, 320), np.inf)  # padded grid
    for r in tiles.collect():
        block = np.frombuffer(bytes(r["data"]), np.float64).reshape(ch, cw)
        got[r["ty"] * ch:(r["ty"] + 1) * ch, r["tx"] * cw:(r["tx"] + 1) * cw] = block
    got = got[:150, :260]
    assert np.array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    assert np.array_equal(got[m], want[m])


def test_v2_superblock_ohdr_link_messages(tmp_path):
    """libver-latest shape: superblock v2, OHDR root with compact link
    messages, v3 attributes — the reader's new-style paths."""
    arr = np.arange(24, dtype=np.float64).reshape(4, 6) * 1.5
    iarr = (np.arange(10, dtype=np.int16) - 5) * 100
    buf = h5.format_hdf5_v2(
        {"v": (arr, {"units": "K", "n": np.int32(3)}),
         "i": (iarr, {"fill": np.int16(-1)})},
        {"title": "v2 profile"},
    )
    p = tmp_path / "v2.h5"
    p.write_bytes(buf)
    f = h5.H5File(str(p))
    assert sorted(f.datasets) == ["/i", "/v"]
    assert np.array_equal(f.datasets["/v"].read(), arr)
    assert np.array_equal(f.datasets["/i"].read(), iarr)
    assert f.datasets["/v"].attrs == {"units": "K", "n": 3}
    assert f.groups["/"]["attrs"]["title"] == "v2 profile"


def test_fill_value_absent_chunks(tmp_path):
    """Chunks entirely equal to the fill value are omitted from the B-tree
    (real netCDF-4 writer behavior); the reader must reconstruct them from
    the version-3 Fill Value message instead of zero-filling."""
    arr = np.full((100, 130), -999, np.int32)
    arr[:40, :50] = (np.arange(40 * 50).reshape(40, 50) % 700).astype(np.int32)
    buf = h5.format_hdf5(
        {"v": (arr, {"_FillValue": np.int32(-999)})},
        chunk=(40, 50), fill=-999,
    )
    p = tmp_path / "fill.h5"
    p.write_bytes(buf)
    f = h5.H5File(p)
    d = f.datasets["/v"]
    assert d.fill == -999
    # only the one non-fill chunk is materialized
    assert len(d.chunk_manifest()) == 1
    assert np.array_equal(d.read(), arr)


def test_fill_value_distributed_tiles(spark, tmp_path):
    """netcdf4_variable_tiles synthesizes fill tiles for absent chunks and
    maps the CF _FillValue to NaN like the materialized ones."""
    arr = np.full((80, 80), -999.0, np.float64)
    arr[:40, :40] = np.arange(40 * 40, dtype=np.float64).reshape(40, 40)
    buf = h5.format_hdf5(
        {"v": (arr, {"_FillValue": -999.0})}, chunk=(40, 40), fill=-999.0)
    p = tmp_path / "fill_tiles.h5"
    p.write_bytes(buf)
    tiles, _gg, (ch, cw) = h5.netcdf4_variable_tiles(spark, str(p), "v")
    rows = {(r["tx"], r["ty"]): np.frombuffer(r["data"], np.float64).reshape(ch, cw)
            for r in tiles.collect()}
    assert set(rows) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    assert np.array_equal(rows[(0, 0)], arr[:40, :40])
    for k in [(1, 0), (0, 1), (1, 1)]:
        assert np.isnan(rows[k]).all()
