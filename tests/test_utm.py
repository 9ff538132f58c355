"""UTM / Transverse Mercator / MGRS against the reference's own fixtures
(Gt/MilitaryGridReferenceSystemTest.java:230-271 testEncodeUTM/testDecodeUTM)
plus round-trip and series-accuracy checks."""

from __future__ import annotations

import numpy as np
import pytest

from sis_spark.functions import utm


def test_utm_forward_fixture_41N_10E():
    # reference: 41N 10E ~ zone 32, E 584102.x, N 4539239.  The projected
    # fixture (584102, 4539239) is a rounded neighborhood point — the exact
    # geographic fixture is the southern twin (N_south = 1e7 - N_north),
    # which pins our northing to 1e-?m of 10,000,000 - 5460761.x
    zone, E, N = utm.utm_forward(np.array([10.0]), np.array([41.0]))
    assert zone[0] == 32
    assert int(E[0]) == 584102
    assert abs(N[0] - 4539239) < 1.0


def test_utm_forward_fixture_41S_10E():
    # reference geographic case: -41, 10 -> "32GNV8410260761"
    zone, E, N = utm.utm_forward(np.array([10.0]), np.array([-41.0]))
    assert zone[0] == 32
    assert int(E[0]) == 584102
    assert int(N[0]) == 5460761


def test_mgrs_encode_fixtures():
    # Gt/MilitaryGridReferenceSystemTest.java testEncodeUTM geographic cases
    assert utm.mgrs_encode(10.0, -41.0) == "32GNV8410260761"
    assert utm.mgrs_encode(10.0, 82.0) == "33XVM2240608183"
    assert utm.mgrs_encode(10.0, 41.0).startswith("32TNL84102")


def test_mgrs_encode_svalbard_norway_zones():
    # Svalbard: zone forced odd (31/33/35/37) in band X
    assert utm.mgrs_encode(5.0, 78.0).startswith("31X")
    assert utm.mgrs_encode(15.0, 78.0).startswith("33X")
    assert utm.mgrs_encode(25.0, 78.0).startswith("35X")
    assert utm.mgrs_encode(35.0, 78.0).startswith("37X")
    # Norway: 32V widened westward
    assert utm.mgrs_encode(4.0, 60.0).startswith("32V")


def test_mgrs_decode_fixture():
    # reference testDecodeUTM: "32TNL8410239239" -> E 584102.5, N 4539239.5
    lon, lat, (e, n) = utm.mgrs_decode("32TNL8410239239")
    assert e == pytest.approx(584102.5)
    assert n == pytest.approx(4539239.5)
    # and the geographic position is ~41N 10E
    assert lat == pytest.approx(41.0, abs=0.01)
    assert lon == pytest.approx(10.0, abs=0.01)


def test_mgrs_roundtrip_grid():
    rng = np.random.default_rng(11)
    lons = rng.uniform(-179, 179, 60)
    lats = rng.uniform(-79, 83, 60)
    for lon, lat in zip(lons, lats):
        ref = utm.mgrs_encode(float(lon), float(lat), precision=5)
        dlon, dlat, _ = utm.mgrs_decode(ref)
        # 1 m cell center: decode within ~1.5 m of the encoded point
        from sis_spark.functions.geometry import haversine_m

        d = haversine_m(np.array([lon]), np.array([lat]), np.array([dlon]), np.array([dlat]))
        assert d[0] < 1.6, (lon, lat, ref, d[0])


def test_spark_utm_and_mgrs_udfs(spark, sf_dir):
    from pyspark.sql import functions as F

    from sis_spark.queries import _events_points

    # MGRS covers -80..84 (polar caps are UPS, out of scope like the
    # reference's gazetteer which delegates them to a different scheme)
    pts = _events_points(spark, sf_dir).filter("lat > -79 AND lat < 83").limit(200)
    u = utm.st_transform_utm_udf()(F.col("lon"), F.col("lat"))
    rows = pts.select("event_id", "lon", "lat", u.alias("u"),
                      utm.mgrs_udf()(F.col("lon"), F.col("lat")).alias("mgrs")).collect()
    assert len(rows) == 200
    for r in rows[:50]:
        zone, E, N = utm.utm_forward(np.array([r["lon"]]), np.array([r["lat"]]))
        assert r["u"]["zone"] == int(zone[0])
        assert r["u"]["e"] == pytest.approx(float(E[0]))
        assert r["u"]["n"] == pytest.approx(float(N[0]))
        assert r["mgrs"] == utm.mgrs_encode(r["lon"], r["lat"])


def test_tm_forward_inverse_roundtrip_accuracy():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-3.0, 3.0, 2000) + 9.0  # zone 32-ish domain
    lat = rng.uniform(-84.0, 84.0, 2000)
    x, y = utm.tm_forward(lon, lat, 9.0)
    lon2, lat2 = utm.tm_inverse(x, y, 9.0)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_mgrs_polar_golden_vectors():
    """The reference's own UPS fixtures
    (Gt/MilitaryGridReferenceSystemTest.java:398 testEncodeUPS /
    :436 testDecodeUPS), fed as UPS coordinates exactly like the
    reference test."""
    from sis_spark.functions.utm import (
        mgrs_decode_polar, mgrs_encode_polar_ups,
    )

    cases = [
        (False, 2000010, 2000010, "BAN0001000010"),
        (False, 1999990, 1999990, "AZM9999099990"),
        (False, 2806727, 1602814, "BLJ0672702814"),
        (True, 2000010, 2000010, "ZAH0001000010"),
        (True, 1999990, 1999990, "YZG9999099990"),
        (True, 1386727, 2202814, "YRK8672702814"),
    ]
    for north, e, n, want in cases:
        west = e < 2_000_000
        assert mgrs_encode_polar_ups(e, n, north, west) == want
        _lon, _lat, (de, dn) = mgrs_decode_polar(want)
        assert (de, dn) == (e + 0.5, n + 0.5)


def test_mgrs_polar_latlon_roundtrip():
    """encode(lon, lat) -> decode -> the same cell (1 m precision)."""
    import numpy as np

    from sis_spark.functions.utm import mgrs_decode, mgrs_encode

    rng = np.random.default_rng(5)
    pts = [(float(lo), float(la)) for lo, la in zip(
        rng.uniform(-179.9, 179.9, 40),
        np.concatenate([rng.uniform(84.05, 89.9, 20), rng.uniform(-89.9, -80.05, 20)]),
    )]
    for lon, lat in pts:
        ref = mgrs_encode(lon, lat)
        assert ref[0] in "ABYZ"
        lo2, la2, _ = mgrs_decode(ref)
        ref2 = mgrs_encode(lo2, la2)
        assert ref2 == ref  # decode lands inside the same 1 m cell


def test_mgrs_polar_zone_letters():
    from sis_spark.functions.utm import mgrs_encode

    assert mgrs_encode(10.0, 87.0)[0] == "Z"
    assert mgrs_encode(-10.0, 87.0)[0] == "Y"
    assert mgrs_encode(10.0, -87.0)[0] == "B"
    assert mgrs_encode(-10.0, -87.0)[0] == "A"
