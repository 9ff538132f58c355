"""Property-based fuzzing of the r5 projection kernels: random
parameters within each family's validity envelope, random points within
the family's working window -> forward/inverse roundtrip must close.
Complements the published-point fixtures in test_proj_tail.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sis_spark.functions import proj_tail as PT

ELLS = [
    (6378137.0, 1 / 298.257223563),   # WGS84
    (6378137.0, 1 / 298.257222101),   # GRS80
    (6377397.155, 1 / 299.1528128),   # Bessel
    (6378388.0, 1 / 297.0),           # International
    (6371000.0, 0.0),                 # sphere
]

ell_s = st.sampled_from(ELLS)
lon_s = st.floats(-179.0, 179.0)
lat_s = st.floats(-84.0, 84.0)


def _rt(proj, lon, lat, tol=1e-6):
    x, y = proj.forward(np.array([lon]), np.array([lat]))
    assert np.isfinite(x[0]) and np.isfinite(y[0])
    lo, la = proj.inverse(x, y)
    assert abs(lo[0] - lon) < tol, (lo[0], lon)
    assert abs(la[0] - lat) < tol, (la[0], lat)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, lat1=st.floats(-60.0, 60.0), lon0=st.floats(-150.0, 150.0),
       lon=lon_s, lat=lat_s)
def test_eqc_roundtrip(ell, lat1, lon0, lon, lat):
    _rt(PT.EquidistantCylindrical(lat1, lon0, 10.0, -20.0, ell),
        lon, lat, 1e-6)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, lat_ts=st.floats(-60.0, 60.0), lon=lon_s,
       lat=st.floats(-80.0, 80.0))
def test_cea_roundtrip(ell, lat_ts, lon, lat):
    _rt(PT.CylindricalEqualArea(lat_ts, 0.0, 0.0, 0.0, ell), lon, lat, 1e-6)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, lat0=st.floats(-50.0, 50.0),
       dlon=st.floats(-5.0, 5.0), lat=st.floats(-55.0, 55.0))
def test_cassini_roundtrip_near_meridian(ell, lat0, dlon, lat):
    # series truncation grows with meridian distance: ~1e-5 deg at 5 deg
    # (Cassini is a narrow-zone cadastral projection by design)
    p = PT.CassiniSoldner(lat0, 20.0, 1000.0, 2000.0, ell)
    _rt(p, 20.0 + dlon, lat, 1e-5)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, lat0=st.floats(-40.0, 40.0),
       dlon=st.floats(-25.0, 25.0), lat=st.floats(-60.0, 60.0))
def test_polyconic_roundtrip(ell, lat0, dlon, lat):
    if abs(lat) < 1e-3:
        lat = 1.0  # the phi=0 branch is pinned separately
    p = PT.Polyconic(lat0, -50.0, 0.0, 0.0, ell)
    _rt(p, -50.0 + dlon, lat, 1e-5)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, latc=st.floats(-60.0, 60.0),
       az=st.floats(5.0, 175.0), dlon=st.floats(-20.0, 20.0),
       dlat=st.floats(-20.0, 20.0), vb=st.booleans())
def test_oblique_mercator_roundtrip(ell, latc, az, dlon, dlat, vb):
    if abs(latc) < 0.5:
        latc = 5.0  # latc = 0 makes D = B/cos(0)... fine but keep margin
    lat = np.clip(latc + dlat, -80.0, 80.0)
    p = PT.ObliqueMercator(latc, 30.0, az, None, 0.9996, 0.0, 0.0, ell,
                           variant_b=vb)
    _rt(p, 30.0 + dlon, float(lat), 1e-6)


@settings(max_examples=150, deadline=None)
@given(ell=ell_s, k0=st.floats(0.95, 1.0), lon=lon_s,
       lat=st.floats(-80.0, 80.0))
def test_mercator_roundtrip(ell, k0, lon, lat):
    _rt(PT.Mercator(k0, None, 0.0, 0.0, 0.0, ell), lon, lat, 1e-6)


@settings(max_examples=100, deadline=None)
@given(ell=ell_s, lat0=st.floats(-55.0, 55.0), dlon=st.floats(-8.0, 8.0),
       dlat=st.floats(-8.0, 8.0))
def test_mae_roundtrip_local(ell, lat0, dlon, dlat):
    # the Guam series is a LOCAL projection: ~1e-6 deg truncation at
    # 10 deg offsets is by design
    p = PT.ModifiedAzimuthalEquidistant(lat0, 140.0, 40000.0, 60000.0, ell)
    lat = float(np.clip(lat0 + dlat, -80.0, 80.0))
    _rt(p, 140.0 + dlon, lat, 1e-5)


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, lat=st.floats(-69.0, 69.0))
def test_satellite_tracking_roundtrip(lon, lat):
    c = PT.SatelliteTracking(-90.0, 0.0, 30.0, -30.0, 99.092,
                             103.267 / 1440.0, R=6371007.0)
    _rt(c, lon, lat, 1e-5)


@settings(max_examples=100, deadline=None)
@given(lon=lon_s, lat=st.floats(-75.0, 75.0))
def test_zoned_tm_roundtrip(lon, lat):
    _rt(PT.ZonedTransverseMercator(), lon, lat, 1e-6)
