"""SQL-callable SQLMM surface (sis_spark.functions.register).

Reference: F/filter/sqlmm/Registry.java:62 registers every SQLMM enum
constant with the filter factory so queries can call them by name; the
Spark analog is spark.udf.register, after which the whole surface works
from spark.sql(...) strings over WKB columns.
"""

import pytest

from sis_spark.functions.geometry import wkb_point, wkb_polygon
from sis_spark.functions.register import register_sqlmm


@pytest.fixture(scope="module")
def sql_spark(spark):
    register_sqlmm(spark)
    return spark


def _shapes_view(spark):
    sq = wkb_polygon([([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0])])
    tri = wkb_polygon([([2.0, 8.0, 2.0, 2.0], [2.0, 2.0, 8.0, 2.0])])
    pt_in = wkb_point(1.0, 1.0)
    pt_out = wkb_point(9.0, 9.0)
    df = spark.createDataFrame(
        [("sq", sq), ("tri", tri), ("pin", pt_in), ("pout", pt_out)],
        ["gid", "wkb"],
    )
    df.createOrReplaceTempView("shapes")
    return {"sq": sq, "tri": tri}


def test_registration_returns_names(sql_spark):
    names = register_sqlmm(sql_spark)  # idempotent re-register
    assert "ST_Area" in names and "ST_Intersects" in names
    assert len(names) >= 70


def test_sql_accessors_and_measures(sql_spark):
    _shapes_view(sql_spark)
    rows = {
        r.gid: r
        for r in sql_spark.sql(
            "SELECT gid, ST_GeometryType(wkb) AS t, ST_Area(wkb) AS a,"
            " ST_AsText(ST_Centroid(wkb)) AS c FROM shapes"
        ).collect()
    }
    assert rows["sq"].t == "ST_Polygon" and rows["sq"].a == pytest.approx(16.0)
    assert rows["pin"].t == "ST_Point"
    assert rows["sq"].c.startswith("POINT")


def test_sql_predicate_in_where_clause(sql_spark):
    _shapes_view(sql_spark)
    got = sorted(
        r.gid
        for r in sql_spark.sql(
            "SELECT a.gid FROM shapes a JOIN shapes b ON b.gid = 'sq'"
            " WHERE a.gid <> b.gid AND ST_Intersects(a.wkb, b.wkb)"
        ).collect()
    )
    # the triangle overlaps the square; pin is inside it; pout is outside
    assert got == ["pin", "tri"]


def test_sql_constructors_and_casts(sql_spark):
    _shapes_view(sql_spark)
    row = sql_spark.sql(
        "SELECT ST_AsText(ST_Point(3.0D, 4.0D)) AS p,"
        " ST_X(ST_PointFromText('POINT (7 8)')) AS x,"
        " ST_NumPoints(ST_ExteriorRing(wkb)) AS n"
        " FROM shapes WHERE gid = 'sq'"
    ).collect()[0]
    assert row.p in ("POINT (3 4)", "POINT (3.0 4.0)")
    assert row.x == 7.0 and row.n == 5


def test_sql_overlay_roundtrip(sql_spark):
    _shapes_view(sql_spark)
    area = sql_spark.sql(
        "SELECT ST_Area(ST_Intersection(a.wkb, b.wkb)) AS ia"
        " FROM shapes a, shapes b WHERE a.gid = 'sq' AND b.gid = 'tri'"
    ).collect()[0].ia
    # square [0,4]^2 ∩ triangle {x>=2, y>=2, x+y<=10} = the [2,4]^2 square
    assert area == pytest.approx(4.0, rel=1e-9)


def test_sql_typed_ctor_rejects_wrong_type(sql_spark):
    _shapes_view(sql_spark)
    row = sql_spark.sql(
        "SELECT ST_PolyFromText('POINT (1 2)') AS g"
    ).collect()[0]
    assert row.g is None


def test_sql_transform_crs(sql_spark):
    """ST_TransformCRS: per-row CRS pair over a WKB geometry column; the
    4326->3857 leg must equal the dedicated mercator kernel and the round
    trip must return the input to float tolerance."""
    import numpy as np

    from sis_spark.functions import transforms as tr

    _shapes_view(sql_spark)
    row = sql_spark.sql(
        "SELECT ST_AsText(ST_TransformCRS(ST_Point(10.0D, 45.0D),"
        " 'EPSG:4326', 'EPSG:3857')) AS merc,"
        " ST_AsText(ST_TransformCRS(ST_TransformCRS(ST_Point(10.0D, 45.0D),"
        " 'EPSG:4326', 'EPSG:3035'), 'EPSG:3035', 'EPSG:4326')) AS rt"
    ).collect()[0]
    mx, my = tr.mercator_forward(np.array([10.0]), np.array([45.0]))
    gx, gy = (float(t) for t in row.merc[len("POINT ("):-1].split())
    assert gx == pytest.approx(float(mx[0]), rel=1e-12)
    assert gy == pytest.approx(float(my[0]), rel=1e-12)
    rx, ry = (float(t) for t in row.rt[len("POINT ("):-1].split())
    assert rx == pytest.approx(10.0, abs=1e-9) and ry == pytest.approx(45.0, abs=1e-9)


def test_sql_buffer_and_simplify_take_arguments(sql_spark):
    """ST_Buffer / ST_Simplify accept their scalar as a SQL argument
    (SQLMM signatures ST_Buffer(g, r) / ST_Simplify(g, tol))."""
    _shapes_view(sql_spark)
    row = sql_spark.sql(
        "SELECT ST_Area(ST_Buffer(ST_Point(0.0D, 0.0D), 2.0D)) AS a2,"
        " ST_Area(ST_Buffer(ST_Point(0.0D, 0.0D), 4.0D)) AS a4,"
        " ST_NumPoints(ST_ExteriorRing(ST_Simplify(wkb, 100.0D))) AS nsimp,"
        " ST_NumPoints(ST_ExteriorRing(ST_Simplify(wkb, 0.0D))) AS nfull"
        " FROM shapes WHERE gid = 'sq'"
    ).collect()[0]
    import math
    # inscribed 24-gon areas: r^2 * n/2 * sin(2*pi/n) <= area <= pi r^2
    assert 0.9 * math.pi * 4 <= row.a2 <= math.pi * 4
    assert row.a4 == pytest.approx(row.a2 * 4.0, rel=1e-6)  # scales as r^2
    assert row.nsimp < row.nfull  # huge tolerance collapses vertices
