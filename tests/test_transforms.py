"""TransformTestCase-style tolerance checks (pattern of
Rt/referencing/operation/transform/TransformTestCase.java and
Rt/.../projection/MercatorTest.java:141-161,238)."""

import numpy as np
import pytest

from sis_spark.functions import transforms as tr


def test_mercator_epsg_known_point():
    # EPSG Guidance Note 7-2 Pseudo-Mercator sample (MercatorTest.java:238):
    # 24°22'54.433"N, 100°20'00"W  ->  (-11169055.58, 2800000.00) m
    lat = 24.0 + 22.0 / 60.0 + 54.433 / 3600.0
    lon = -(100.0 + 20.0 / 60.0)
    x, y = tr.mercator_forward(np.array([lon]), np.array([lat]))
    assert abs(x[0] - -11169055.58) < 1e-2
    assert abs(y[0] - 2800000.00) < 1e-2


def test_mercator_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89.9, 89.9, 5000)
    x, y = tr.mercator_forward(lon, lat)
    lon2, lat2 = tr.mercator_inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_mercator_special_latitudes():
    # MercatorTest.java:141-161: poles -> +-inf, beyond range -> NaN, NaN -> NaN
    x, y = tr.mercator_forward(
        np.array([0.0, 0.0, 0.0, 0.0]), np.array([90.0, -90.0, 91.0, np.nan])
    )
    assert y[0] == np.inf and y[1] == -np.inf
    assert np.isnan(y[2]) and np.isnan(y[3])


def test_affine_concat_invert():
    rng = np.random.default_rng(5)
    f = tuple(rng.uniform(-2, 2, 6))
    g = tuple(rng.uniform(-2, 2, 6))
    x = rng.uniform(-10, 10, 100)
    y = rng.uniform(-10, 10, 100)
    gx, gy = tr.affine_apply(g, x, y)
    fx, fy = tr.affine_apply(f, gx, gy)
    cx, cy = tr.affine_apply(tr.affine_concat(f, g), x, y)
    np.testing.assert_allclose((cx, cy), (fx, fy), rtol=1e-12)
    inv = tr.affine_invert(f)
    rx, ry = tr.affine_apply(inv, *tr.affine_apply(f, x, y))
    np.testing.assert_allclose((rx, ry), (x, y), atol=1e-9)


def test_tile_assign_fixtures():
    # floorDiv convention (S/tiling/TiledGridCoverage.java:326,489):
    # lon=0 at zoom 1 is exactly the tile edge -> belongs to tile 1 (inclusive low)
    tx, ty = tr.tile_assign(np.array([0.0]), np.array([0.0]), 1)
    assert (tx[0], ty[0]) == (1, 1)
    # world corners clamp into edge tiles
    tx, ty = tr.tile_assign(np.array([-180.0, 180.0]), np.array([85.06, -85.06]), 3)
    assert (tx[0], ty[0]) == (0, 0)
    assert (tx[1], ty[1]) == (7, 7)
    # golden: Empire State Building at zoom 12 -> OSM slippy tile (1206, 1539)
    tx, ty = tr.tile_assign(np.array([-73.985656]), np.array([40.748433]), 12)
    assert (tx[0], ty[0]) == (1206, 1539)
    # pixel/tile consistency: tile == floorDiv(pixel, 256)
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    tx, ty = tr.tile_assign(lon, lat, 10)
    px, py = tr.pixel_assign(lon, lat, 10)
    assert np.array_equal(tx, px // 256)
    assert np.array_equal(ty, py // 256)


def test_tile_sql_matches_numpy():
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    rng = np.random.default_rng(13)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-88, 88, 2000)
    for zoom in (4, 12):
        etx, ety = tr.tile_assign(lon, lat, zoom)
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
        sx, sy = tr.tile_sql("lon", "lat", zoom)
        res = con.execute(f"SELECT {sx} AS tx, {sy} AS ty FROM pts").fetchnumpy()
        assert np.array_equal(res["tx"].astype(np.int64), etx)
        assert np.array_equal(res["ty"].astype(np.int64), ety)


def test_grid_registration_half_pixel():
    # CELL_CENTER adds the +0.5 shift (PixelTranslation off-by-half trap)
    a = (2.0, 0.0, 100.0, 0.0, -2.0, 50.0)
    corner_x, corner_y = tr.affine_apply(a, np.array([0.0]), np.array([0.0]))
    center = tr.grid_to_crs(a, cell_center=True)
    cx, cy = tr.affine_apply(center, np.array([0.0]), np.array([0.0]))
    assert (corner_x[0], corner_y[0]) == (100.0, 50.0)
    assert (cx[0], cy[0]) == (101.0, 49.0)
