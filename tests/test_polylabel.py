"""Polylabel: DuckDB oracle vs unpruned Python brute, then Spark engine
parity (the pruned search must return the global argmax — cells that
contain an optimum point can never be pruned)."""

import math

import numpy as np

_DIRS = [
    (100, 0), (92, 38), (71, 71), (38, 92), (0, 100), (-38, 92),
    (-71, 71), (-92, 38), (-100, 0), (-92, -38), (-71, -71), (-38, -92),
    (0, -100), (38, -92), (71, -71), (92, -38),
]

Q = 1 << 20


def _star_edges(k, m):
    pts = []
    for j in range(m):
        dx, dy = _DIRS[(16 * j) // m]
        r = 50 + (k * 31 + j * 17) % 40
        pts.append((r * dx, r * dy))
    return [(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]


def _signed_dq(px, py, edges):
    best = math.inf
    ncr = 0
    for (ax, ay), (bx, by) in edges:
        dot = (px - ax) * (bx - ax) + (py - ay) * (by - ay)
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        if dot <= 0:
            d2 = float((px - ax) ** 2 + (py - ay) ** 2)
        elif dot >= len2:
            d2 = float((px - bx) ** 2 + (py - by) ** 2)
        else:
            cr = float((bx - ax) * (py - ay) - (by - ay) * (px - ax))
            d2 = cr * cr / float(len2)
        best = min(best, d2)
        e = (px - ax) * (by - ay) - (py - ay) * (bx - ax)
        if (ay > py) != (by > py) and (
            (by > ay and e < 0) or (by < ay and e > 0)
        ):
            ncr += 1
    sign = 1 if ncr % 2 == 1 else -1
    return sign * math.floor(float(Q) * math.sqrt(best))


def _brute(edges_raw, depth):
    sc = 1 << (depth + 1)
    edges = [((ax * sc, ay * sc), (bx * sc, by * sc))
             for (ax, ay), (bx, by) in edges_raw]
    xs = [p for e in edges for p in (e[0][0], e[1][0])]
    ys = [p for e in edges for p in (e[0][1], e[1][1])]
    x0, y0 = min(xs), min(ys)
    side = 1 << math.ceil(math.log2(max(max(xs) - x0, max(ys) - y0)))
    s = side >> depth
    best = None
    n = 1 << depth
    for i in range(n):
        for j in range(n):
            cx = x0 + i * s + s // 2
            cy = y0 + j * s + s // 2
            dq = _signed_dq(cx, cy, edges)
            key = (-dq, cx, cy)
            if best is None or key < best:
                best = key
    return (best[1], best[2], -best[0])


def test_polylabel_oracle_matches_brute():
    import duckdb

    from sis_spark.functions.polylabel import polylabel_sql

    rows = []
    exp = {}
    for k in range(4):
        m = 6 + (k * 5) % 7
        edges = _star_edges(k + 2, m)
        rows += [(k, ax, ay, bx, by) for (ax, ay), (bx, by) in edges]
        exp[k] = _brute(edges, depth=5)
    con = duckdb.connect()
    con.execute("CREATE TABLE pe(key BIGINT, ax BIGINT, ay BIGINT, "
                "bx BIGINT, by BIGINT)")
    con.executemany("INSERT INTO pe VALUES (?, ?, ?, ?, ?)", rows)
    sql = polylabel_sql("SELECT key, ax, ay, bx, by FROM pe", depth=5)
    got = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == exp
    # pole of a star polygon around the origin is near the origin and
    # strictly inside
    for k, (cx, cy, dq) in got.items():
        assert dq > 0


def test_polylabel_engine_matches_oracle(spark):
    import duckdb

    from sis_spark.functions.polylabel import polylabel, polylabel_sql

    rows = []
    for k in range(4):
        m = 6 + (k * 3) % 7
        edges = _star_edges(k + 9, m)
        rows += [(k, ax, ay, bx, by) for (ax, ay), (bx, by) in edges]
    df = spark.createDataFrame(rows, ["key", "ax", "ay", "bx", "by"])
    got = {r.key: (r.cx, r.cy, r.dq)
           for r in polylabel(df, depth=5).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE pe(key BIGINT, ax BIGINT, ay BIGINT, "
                "bx BIGINT, by BIGINT)")
    con.executemany("INSERT INTO pe VALUES (?, ?, ?, ?, ?)", rows)
    sql = polylabel_sql("SELECT key, ax, ay, bx, by FROM pe", depth=5)
    oracle = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == oracle
