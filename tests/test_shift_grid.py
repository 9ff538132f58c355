"""Grid-interpolation datum shift (DatumShiftGrid.java machinery) + NTv2
.gsb format round-trip.  No Spark needed — the gate (`ntv2_shift`) drives
the distributed path."""

from __future__ import annotations

import numpy as np

from sis_spark.functions.datums import ShiftGrid
from sis_spark.sources.ntv2 import format_ntv2, read_ntv2


def test_bilinear_matches_naive():
    g = ShiftGrid.synthetic()
    rng = np.random.default_rng(3)
    lon = rng.uniform(g.lon0, g.lon0 + g.dlon * (g.nx - 1), 500)
    lat = rng.uniform(g.lat0, g.lat0 + g.dlat * (g.ny - 1), 500)
    sx, sy = g.interpolate(lon, lat)
    for i in range(0, 500, 37):
        gx = (lon[i] - g.lon0) / g.dlon
        gy = (lat[i] - g.lat0) / g.dlat
        ix = min(max(int(np.floor(gx)), 0), g.nx - 2)
        iy = min(max(int(np.floor(gy)), 0), g.ny - 2)
        fx, fy = gx - ix, gy - iy
        want = ((g.slon[iy, ix] * (1 - fx) + g.slon[iy, ix + 1] * fx) * (1 - fy)
                + (g.slon[iy + 1, ix] * (1 - fx) + g.slon[iy + 1, ix + 1] * fx) * fy)
        assert sx[i] == want


def test_node_values_exact_at_nodes():
    g = ShiftGrid.synthetic()
    # at grid nodes the bilinear returns the node value exactly
    lon = g.lon0 + g.dlon * np.arange(g.nx - 1)
    lat = np.full(g.nx - 1, g.lat0 + g.dlat * 3)
    sx, sy = g.interpolate(lon, lat)
    assert np.array_equal(sx, g.slon[3, :g.nx - 1])
    assert np.array_equal(sy, g.slat[3, :g.nx - 1])


def test_forward_inverse_roundtrip():
    g = ShiftGrid.synthetic()
    rng = np.random.default_rng(4)
    lon = rng.uniform(g.lon0 + 1, g.lon0 + g.dlon * (g.nx - 2), 200)
    lat = rng.uniform(g.lat0 + 1, g.lat0 + g.dlat * (g.ny - 2), 200)
    wlon, wlat = g.to_wgs84(lon, lat)
    blon, blat = g.from_wgs84(wlon, wlat)
    # fixed-point inverse: sub-micrometer (degrees ~1e-11) for real-world
    # shift magnitudes
    assert np.abs(blon - lon).max() < 1e-10
    assert np.abs(blat - lat).max() < 1e-10


def test_ntv2_roundtrip_bit_exact():
    g = ShiftGrid.synthetic()
    buf = format_ntv2(g)
    h = read_ntv2(buf)
    # dyadic node values survive float32 exactly; header floats are doubles
    assert (h.lon0, h.lat0, h.dlon, h.dlat) == (g.lon0, g.lat0, g.dlon, g.dlat)
    assert np.array_equal(h.slon, g.slon)
    assert np.array_equal(h.slat, g.slat)


def test_ntv2_conventions():
    """Positive-west / east-to-west scan: a grid with a single nonzero
    node must land at the same geographic position after the round-trip."""
    slon = np.zeros((3, 4)); slat = np.zeros((3, 4))
    slon[1, 2] = 0.5   # positive-east arcsec at (iy=1, ix=2)
    slat[2, 0] = -0.25
    g = ShiftGrid(10.0, 40.0, 1.0, 1.0, slon, slat)
    h = read_ntv2(format_ntv2(g))
    assert h.slon[1, 2] == 0.5 and np.count_nonzero(h.slon) == 1
    assert h.slat[2, 0] == -0.25 and np.count_nonzero(h.slat) == 1
