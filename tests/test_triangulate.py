"""Ear-clipping triangulation: area invariant, brute parity, SQL oracle."""

import numpy as np

_DIRS = [
    (100, 0), (92, 38), (71, 71), (38, 92), (0, 100), (-38, 92),
    (-71, 71), (-92, 38), (-100, 0), (-92, -38), (-71, -71), (-38, -92),
    (0, -100), (38, -92), (71, -71), (92, -38),
]


def _star_polygon(k, m):
    """Simple CCW star polygon: vertex j on direction floor(16j/m)
    with modular radius — general position, integer coords."""
    pts = []
    for j in range(m):
        dx, dy = _DIRS[(16 * j) // m]
        r = 50 + (k * 31 + j * 17) % 40
        pts.append((r * dx, r * dy))
    return pts


def _shoelace2(pts):
    s = 0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        s += x1 * y2 - x2 * y1
    return s


def test_ear_clip_py_area_and_count():
    from sis_spark.functions.triangulate import ear_clip_py

    for k in range(8):
        m = 5 + k
        pts = _star_polygon(k, m)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        tris = ear_clip_py(list(range(m)), xs, ys)
        assert len(tris) == m - 2
        assert sum(t[3] for t in tris) == _shoelace2(pts)
        assert all(t[3] > 0 for t in tris)  # CCW, non-degenerate


def test_triangulate_spark_matches_py(spark):
    from sis_spark.functions.triangulate import ear_clip_py, triangulate

    rows = []
    exp = set()
    for k in range(6):
        m = 4 + (k * 3) % 8
        pts = _star_polygon(k + 3, m)
        rows += [(k, i, x, y) for i, (x, y) in enumerate(pts)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        for a, b, c, s in ear_clip_py(list(range(m)), xs, ys):
            exp.add((k, a, b, c, s))
    df = spark.createDataFrame(rows, ["key", "i", "x", "y"])
    got = {(r.key, r.i0, r.i1, r.i2, r.area2)
           for r in triangulate(df).collect()}
    assert got == exp


def test_triangulate_sql_oracle_parity():
    import duckdb

    from sis_spark.functions.triangulate import ear_clip_py, triangulate_sql

    rows = []
    exp = set()
    maxm = 0
    for k in range(5):
        m = 5 + (k * 2) % 7
        maxm = max(maxm, m)
        pts = _star_polygon(k + 11, m)
        rows += [(k, i, x, y) for i, (x, y) in enumerate(pts)]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        for a, b, c, s in ear_clip_py(list(range(m)), xs, ys):
            exp.add((k, a, b, c, s))
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(key BIGINT, i BIGINT, x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?, ?)", rows)
    sql = triangulate_sql("SELECT key, i, x, y FROM pts", max_rounds=maxm - 3)
    got = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == exp
