"""Exact geodesic inverse (functions/geodesic.py) — the auxiliary-sphere
integral solver that replaces the haversine fallback for Vincenty's
divergence region.

Validation strategy (two independent algorithms + published values):
Vincenty (series-free iteration) and the integral solver are independent
implementations of the same exact curve — agreement to 0.1 mm over random
pairs cross-validates both.  The near-antipodal region is checked against
the worked example published in Karney 2013 (sec. 5) and by the solver's
own verifiable lambda-residual."""

import numpy as np

from sis_spark.functions import geodesic as gd
from sis_spark.functions.geometry import geodesic_inverse_m


def test_agrees_with_vincenty_on_random_pairs():
    rng = np.random.default_rng(3)
    n = 200
    lon1, lat1 = rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)
    lon2, lat2 = rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)
    dv, ok = geodesic_inverse_m(lon1, lat1, lon2, lat2)
    dk, _, res = gd.inverse_m(lon1, lat1, lon2, lat2)
    assert res.max() < 1e-10
    assert np.abs(dk[ok] - dv[ok]).max() < 1e-3  # two independent algorithms


def test_karney_2013_worked_example():
    """(0, 0) -> (0.5, 179.5): s12 = 19,936,288.579 m (Karney 2013, sec. 5 —
    the canonical nearly-antipodal case)."""
    d, a, res = gd.inverse_m([0.0], [0.0], [179.5], [0.5])
    assert abs(float(d[0]) - 19936288.579) < 0.01
    assert res[0] < 1e-12


def test_antipodal_sweep_all_solve():
    """100 near-antipodal pairs: Vincenty mostly diverges; the integral
    solver must solve every one with verifiable residual."""
    rng = np.random.default_rng(5)
    n = 100
    lat1, lon1 = rng.uniform(-80, 80, n), rng.uniform(-180, 180, n)
    lat2 = -lat1 + rng.uniform(-0.2, 0.2, n)
    lon2 = lon1 + 180 + rng.uniform(-0.2, 0.2, n)
    dk, _, res = gd.inverse_m(lon1, lat1, lon2, lat2)
    assert res.max() < 1e-12
    # all antipodal distances live in the narrow band between the polar
    # diameter path and half the equatorial circumference
    assert dk.min() > 19_900_000 and dk.max() < 20_010_000


def test_equatorial_and_meridional_arcs():
    # equatorial cap: geodesic IS the equator, s = a * lam
    d, a, res = gd.inverse_m([0.0], [0.0], [10.0], [0.0])
    assert abs(float(d[0]) - 6378137.0 * np.radians(10.0)) < 1e-6
    # beyond the cap ((1-f)*180 deg) the geodesic leaves the equator and is
    # SHORTER than the equatorial arc
    d2, _, res2 = gd.inverse_m([0.0], [0.0], [179.7], [0.0])
    assert res2[0] < 1e-12
    assert float(d2[0]) < 6378137.0 * np.radians(179.7)
    # meridional (matches Vincenty, which converges on meridians)
    dv, ok = geodesic_inverse_m(np.array([0.0]), np.array([10.0]),
                                np.array([0.0]), np.array([80.0]))
    dk, _, _ = gd.inverse_m([0.0], [10.0], [0.0], [80.0])
    assert bool(ok[0]) and abs(float(dk[0]) - float(dv[0])) < 1e-4
    # over the pole
    dv, ok = geodesic_inverse_m(np.array([0.0]), np.array([80.0]),
                                np.array([180.0]), np.array([70.0]))
    dk, _, _ = gd.inverse_m([0.0], [80.0], [180.0], [70.0])
    assert bool(ok[0]) and abs(float(dk[0]) - float(dv[0])) < 1e-4


def test_near_equatorial_apex_conditioning():
    """Pairs whose endpoint sits near the geodesic apex (tiny latitudes,
    long arcs) — the regime where a naive arcsin(sigma2) loses half the
    mantissa.  The alpha1 parameterization itself bottoms out at a few mm
    here (d lambda / d alpha1 ~ 1e5, so float64 alpha1 resolves lambda only
    to ~1e-10 rad); bound is 5 mm, vs the ~0.6 m of the naive arcsin."""
    rng = np.random.default_rng(9)
    n = 40
    lat1, lat2 = rng.uniform(-0.01, 0.01, n), rng.uniform(-0.01, 0.01, n)
    lon1 = rng.uniform(-180, 180, n)
    lon2 = lon1 + rng.uniform(1, 170, n)
    dv, ok = geodesic_inverse_m(lon1, lat1, lon2, lat2)
    dk, _, res = gd.inverse_m(lon1, lat1, lon2, lat2)
    assert ok.all()
    assert np.abs(dk - dv).max() < 5e-3
    assert res.max() < 1e-8


def test_coincident_and_mirror_symmetry():
    d, _, _ = gd.inverse_m([5.0], [5.0], [5.0], [5.0])
    assert float(d[0]) == 0.0
    # east vs west mirror gives the same distance
    de, _, _ = gd.inverse_m([0.0], [20.0], [60.0], [-35.0])
    dw, _, _ = gd.inverse_m([0.0], [20.0], [-60.0], [-35.0])
    assert abs(float(de[0]) - float(dw[0])) < 1e-6


def test_direct_roundtrips_inverse():
    import numpy as np

    from sis_spark.functions.geodesic import direct_m, inverse_m

    rng = np.random.default_rng(17)
    n = 40
    lat1 = rng.uniform(-80, 80, n)
    lon1 = rng.uniform(-180, 180, n)
    az = rng.uniform(0.05, np.pi - 0.05, n)
    s = rng.uniform(1e3, 1.9e7, n)
    lon2, lat2, _ = direct_m(lon1, lat1, az, s)
    d, a1, res = inverse_m(lon1, lat1, lon2, lat2)
    assert np.abs(d - s).max() < 1e-6          # sub-micrometer round-trip
    assert np.abs(a1 - az).max() < 1e-12
    assert res.max() < 1e-12


def test_direct_equator_and_meridian():
    import numpy as np

    from sis_spark.functions.geodesic import direct_m

    a = 6378137.0
    lon2, lat2, _ = direct_m(10.0, 0.0, np.pi / 2, a * 0.25)
    assert abs(lon2[0] - (10.0 + np.degrees(0.25))) < 1e-9
    assert abs(lat2[0]) < 1e-9
    # due north along the meridian keeps longitude
    lon2, lat2, _ = direct_m(45.0, 10.0, 0.0, 3_000_000.0)
    assert abs(lon2[0] - 45.0) < 1e-9 and lat2[0] > 36.0


def test_spherical_destination_and_azimuth_sanity(spark):
    """Semantic checks of the codegen spherical formulas used by the
    st_azimuth / geodesic_destination gates."""
    import numpy as np
    from pyspark.sql import functions as F

    R = 6371000.0
    df = spark.createDataFrame(
        [(10.0, 45.0, 0.0, 100000.0), (10.0, 45.0, 90.0, 100000.0)],
        ["lon", "lat", "bear", "d"],
    )
    p1 = F.radians("lat")
    th = F.radians("bear")
    dl = F.col("d") / R
    p2 = F.asin(F.sin(p1) * F.cos(dl) + F.cos(p1) * F.sin(dl) * F.cos(th))
    l2 = F.radians("lon") + F.atan2(
        F.sin(th) * F.sin(dl) * F.cos(p1),
        F.cos(dl) - F.sin(p1) * F.sin(p2),
    )
    rows = df.select(
        "bear", F.degrees(p2).alias("lat2"), F.degrees(l2).alias("lon2")
    ).collect()
    north = next(r for r in rows if r.bear == 0.0)
    east = next(r for r in rows if r.bear == 90.0)
    # due north: lat increases by ~ d / (R * pi/180) degrees, lon fixed
    assert abs(north.lat2 - (45.0 + np.degrees(100000.0 / R))) < 1e-9
    assert abs(north.lon2 - 10.0) < 1e-9
    # due east at 45N: lat2 slightly BELOW 45 on a great circle, lon grows
    assert east.lon2 > 10.5 and east.lat2 < 45.0
    # haversine back-distance equals d
    for r in rows:
        ph1, ph2 = np.radians(45.0), np.radians(r.lat2)
        dlmb = np.radians(r.lon2 - 10.0)
        h = np.sin((ph2 - ph1) / 2) ** 2 + np.cos(ph1) * np.cos(ph2) * np.sin(dlmb / 2) ** 2
        dist = 2 * R * np.arcsin(np.sqrt(h))
        assert abs(dist - 100000.0) < 1e-4


def test_spherical_excess_small_polygon_matches_planar(spark):
    import math

    import numpy as np

    from sis_spark.functions.geodesic import spherical_excess_angles

    # small CCW star at the equator: excess ~ planar shoelace area (rad^2)
    th = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    rad = np.where(np.arange(10) % 2 == 0, 2.0, 0.8)
    lons = rad * np.cos(th)
    lats = rad * np.sin(th)
    rows = [(1, k, 10, float(lons[k]), float(lats[k])) for k in range(10)]
    df = spark.createDataFrame(rows, "key long, k long, nv long, vx double, vy double")
    (r,) = spherical_excess_angles(df).collect()
    excess = r["sum_ang_q"] / 1e9 - (10 - 2) * math.pi
    xs, ys = np.radians(lons), np.radians(lats)
    planar = 0.5 * abs(sum(
        xs[i] * ys[(i + 1) % 10] - xs[(i + 1) % 10] * ys[i] for i in range(10)
    ))
    assert abs(excess - planar) / planar < 0.01
    # CW orientation: angles complement -> excess becomes 4*pi - area
    rows_cw = [(1, k, 10, float(lons[::-1][k]), float(lats[::-1][k]))
               for k in range(10)]
    df_cw = spark.createDataFrame(
        rows_cw, "key long, k long, nv long, vx double, vy double"
    )
    (rc,) = spherical_excess_angles(df_cw).collect()
    excess_cw = rc["sum_ang_q"] / 1e9 - (10 - 2) * math.pi
    assert abs(excess_cw - (4 * math.pi - planar)) < 1e-3
