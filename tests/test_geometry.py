"""PIP / distance / envelope / WKB kernel tests.

The PIP boundary convention is pinned by explicit fixtures; correctness is
cross-checked against an independent matplotlib-free brute force (angle sum
is avoided — we use a second even-odd implementation with different edge
iteration order) and against the DuckDB SQL re-derivation."""

import numpy as np
import pytest

from sis_spark.functions import geometry as geo
from sis_spark import synth


def _pip_reference(px, py, vx, vy):
    """Scalar PNPOLY (W. Randolph Franklin's published algorithm) as an
    independent check of the vectorized kernel."""
    out = []
    n = len(vx)
    for x, y in zip(px, py):
        inside = False
        j = n - 1
        for i in range(n):
            if (vy[i] > y) != (vy[j] > y) and x < (vx[j] - vx[i]) * (y - vy[i]) / (
                vy[j] - vy[i]
            ) + vx[i]:
                inside = not inside
            j = i
        out.append(inside)
    return np.array(out)


def test_pip_square_and_boundary():
    vx = np.array([0.0, 2.0, 2.0, 0.0])
    vy = np.array([0.0, 0.0, 2.0, 2.0])
    px = np.array([1.0, 3.0, -1.0, 1.0, 1.0])
    py = np.array([1.0, 1.0, 1.0, 3.0, -1.0])
    got = geo.points_in_polygon(px, py, vx, vy)
    assert list(got) == [True, False, False, False, False]
    # boundary rule: left edge in, right edge out; bottom in, top out
    bx = np.array([0.0, 2.0, 1.0, 1.0])
    by = np.array([1.0, 1.0, 0.0, 2.0])
    got = geo.points_in_polygon(bx, by, vx, vy)
    assert list(got) == [True, False, True, False]


def test_pip_concave_and_random_vs_reference():
    rng = np.random.default_rng(21)
    for key in (1, 7, 13, 42, 99):
        vx, vy = synth.polygon_vertices_np(key)
        cx, cy = vx.mean(), vy.mean()
        px = rng.uniform(cx - 4, cx + 4, 500)
        py = rng.uniform(cy - 4, cy + 4, 500)
        got = geo.points_in_polygon(px, py, vx, vy)
        ref = _pip_reference(px, py, vx, vy)
        assert np.array_equal(got, ref)


def test_pip_with_holes():
    outer = (np.array([0.0, 10.0, 10.0, 0.0]), np.array([0.0, 0.0, 10.0, 10.0]))
    hole = (np.array([4.0, 6.0, 6.0, 4.0]), np.array([4.0, 4.0, 6.0, 6.0]))
    px = np.array([5.0, 2.0, 11.0])
    py = np.array([5.0, 2.0, 5.0])
    got = geo.points_in_polygon_with_holes(px, py, [outer, hole])
    assert list(got) == [False, True, False]


def test_haversine_known_and_sql_parity():
    # NYC -> London ~ 5570 km
    d = geo.haversine_m(np.array([-74.006]), np.array([40.7128]), np.array([-0.1276]), np.array([51.5074]))
    assert 5.55e6 < d[0] < 5.60e6
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "lon1": rng.uniform(-180, 180, 1000), "lat1": rng.uniform(-89, 89, 1000),
        "lon2": rng.uniform(-180, 180, 1000), "lat2": rng.uniform(-89, 89, 1000),
    })
    expected = geo.haversine_m(df.lon1, df.lat1, df.lon2, df.lat2)
    con = duckdb.connect()
    con.register("t", df)
    sql = geo.haversine_sql("lon1", "lat1", "lon2", "lat2")
    got = con.execute(f"SELECT {sql} AS d FROM t").fetchnumpy()["d"]
    # libm implementations may differ in the last ulps only
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_envelope_wraparound():
    # plain overlap
    assert geo.envelope_intersects(0, 0, 10, 10, 5, 5, 20, 20)
    assert not geo.envelope_intersects(0, 0, 10, 10, 11, 0, 20, 10)
    # wraparound box [170, -170] crosses the anti-meridian
    assert geo.envelope_intersects(170, 0, -170, 10, 175, 5, 178, 8)
    assert geo.envelope_intersects(170, 0, -170, 10, -178, 5, -175, 8)
    assert not geo.envelope_intersects(170, 0, -170, 10, -160, 5, -150, 8)
    assert geo.split_wraparound(170, 0, -170, 10) == [
        (170, 0, 180.0, 10), (-180.0, 0, -170, 10)]


def test_wkb_roundtrip():
    typ, (x, y) = geo.wkb_parse(geo.wkb_point(1.5, -2.5))
    assert typ == "point" and (x, y) == (1.5, -2.5)
    vx, vy = synth.polygon_vertices_np(17)
    typ, rings = geo.wkb_parse(geo.wkb_polygon([(vx, vy)]))
    assert typ == "polygon" and len(rings) == 1
    rvx, rvy = rings[0]
    np.testing.assert_array_equal(rvx[:-1], vx)  # closing vertex appended
    np.testing.assert_array_equal(rvy[:-1], vy)


def test_synth_points_sql_parity():
    """Spark/DuckDB shared SQL text == numpy twin, bit-exact."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    ids = np.arange(1, 20001, dtype=np.int64)
    elon, elat = synth.point_lonlat_np(ids)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": ids}))
    got = con.execute(
        f"SELECT {synth.point_lon_sql('id')} AS lon, {synth.point_lat_sql('id')} AS lat FROM t"
    ).fetchnumpy()
    assert np.array_equal(got["lon"], elon)
    assert np.array_equal(got["lat"], elat)
    # skew: ~80% of points within 1 deg of a hot center
    hot = (ids % 10) < 8
    assert 0.75 < hot.mean() < 0.85


def test_synth_polygon_vertices_sql_parity():
    """DuckDB vertex CTE == numpy polygon vertices, bit-exact."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    keys = np.arange(1, 101, dtype=np.int64)
    con = duckdb.connect()
    con.register("supplier", pd.DataFrame({"s_suppkey": keys}))
    sql = f"WITH {synth.polygon_vertices_sql()} SELECT key, k, vx, vy FROM verts ORDER BY key, k"
    got = con.execute(sql).fetch_df()
    for key in keys:
        vx, vy = synth.polygon_vertices_np(int(key))
        sub = got[got.key == key]
        assert np.array_equal(sub.vx.to_numpy(), vx), f"vx mismatch key={key}"
        assert np.array_equal(sub.vy.to_numpy(), vy), f"vy mismatch key={key}"


# ------------------------------------------------- ellipsoidal geodesics (r2)

def test_vincenty_canonical_value():
    """Vincenty's own published test line (Flinders Peak -> Buninyong,
    Survey Review 1975): 54,972.271 m."""
    from sis_spark.functions.geometry import geodesic_inverse_m

    d, ok = geodesic_inverse_m(
        np.array([144.42486789]), np.array([-37.95103342]),
        np.array([143.92649553]), np.array([-37.65282114]))
    assert bool(ok[0]) and abs(float(d[0]) - 54972.271) < 0.01


def test_geodesic_known_arcs_and_fallback():
    from sis_spark.functions.geometry import geodesic_inverse_m, haversine_m

    d, ok = geodesic_inverse_m(np.array([0.0, 0.0]), np.array([0.0, 0.0]),
                               np.array([0.0, 1.0]), np.array([1.0, 0.0]))
    assert abs(float(d[0]) - 110574.39) < 1.0   # 1 deg meridian arc at equator
    assert abs(float(d[1]) - 111319.49) < 1.0   # 1 deg equatorial arc
    assert ok.all()
    # coincident -> exactly 0
    d, ok = geodesic_inverse_m(np.array([5.0]), np.array([5.0]),
                               np.array([5.0]), np.array([5.0]))
    assert float(d[0]) == 0.0
    # near-antipodal: Vincenty diverges (flagged), but the value now comes
    # from the exact integral solver — within the antipodal distance band
    # and NOT the (wrong-by-km) haversine number
    d, ok = geodesic_inverse_m(np.array([0.0]), np.array([0.0]),
                               np.array([179.7]), np.array([0.3]))
    assert not bool(ok[0])
    hav = float(haversine_m(
        np.array([0.0]), np.array([0.0]), np.array([179.7]), np.array([0.3]))[0])
    assert 19_900_000 < float(d[0]) < 20_010_000
    assert abs(float(d[0]) - hav) > 1000.0


def test_geodesic_vs_haversine_bounded_divergence():
    """Ellipsoidal vs spherical differ by at most ~0.56% (the WGS84
    flattening bound) — a distributional sanity check incl. wraparound."""
    from sis_spark.functions.geometry import geodesic_inverse_m, haversine_m

    rng = np.random.RandomState(3)
    lon1, lat1 = rng.uniform(-180, 180, 5000), rng.uniform(-85, 85, 5000)
    lon2, lat2 = rng.uniform(-180, 180, 5000), rng.uniform(-85, 85, 5000)
    dv, ok = geodesic_inverse_m(lon1, lat1, lon2, lat2)
    assert ok.mean() > 0.999
    dh = haversine_m(lon1, lat1, lon2, lat2)
    rel = np.abs(dv[ok] - dh[ok]) / np.maximum(dh[ok], 1.0)
    assert rel.max() < 0.006


def test_helmert_identity_and_roundtrip(spark):
    from sis_spark.functions.transforms import helmert_cols
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(1, 6_000_000_000, -3_000_000_000, 2_000_000_000),
         (2, -6_378_137_000, 0, 0)],
        "id long, x long, y long, z long")
    # identity parameters: output is exactly 1e6 * input
    ident = {"tx": 0, "ty": 0, "tz": 0, "rx": 0, "ry": 0, "rz": 0, "ds": 0}
    xs, ys, zs = helmert_cols(F.col("x"), F.col("y"), F.col("z"), ident)
    for r in pts.select("x", "y", "z", xs, ys, zs).collect():
        assert (r["xs"], r["ys"], r["zs"]) == (
            r["x"] * 10**6, r["y"] * 10**6, r["z"] * 10**6)
    # small-angle consistency: applying +rz then -rz returns ~identity
    # up to the quadratic term (exact bookkeeping, bounded drift)
    p = {"tx": 0, "ty": 0, "tz": 0, "rx": 0, "ry": 0, "rz": 50, "ds": 0}
    q = {"tx": 0, "ty": 0, "tz": 0, "rx": 0, "ry": 0, "rz": -50, "ds": 0}
    xs, ys, zs = helmert_cols(F.col("x"), F.col("y"), F.col("z"), p)
    step1 = pts.select("id", "x", "y", "z", xs, ys, zs)
    xs2, ys2, zs2 = helmert_cols(
        (F.col("xs") / F.lit(10**6)).cast("long"),
        (F.col("ys") / F.lit(10**6)).cast("long"),
        (F.col("zs") / F.lit(10**6)).cast("long"), q)
    for r in step1.select("x", "y", "z", xs2, ys2, zs2).collect():
        for a, b in (("x", "xs"), ("y", "ys"), ("z", "zs")):
            # second-order error: (rz * 1e-6)^2 * |v| ~ 1.6e-8 relative
            assert abs(r[b] / 10**6 - r[a]) <= abs(r[a]) * 1e-7 + 2
