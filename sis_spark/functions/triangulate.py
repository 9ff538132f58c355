"""Ear-clipping polygon triangulation (the fan-out step before any
per-triangle raster/area work on general polygons).

Re-derivation of the classic O(n^2) ear-clipping algorithm (van Gogh /
Meisters 1975 "two ears" theorem; the reference reaches triangulation
through JTS delegation, F/geometry/wrapper/GeometryWrapper.java) in
EXACT integer arithmetic:

* polygons arrive as vertex rows (key, i, x, y), CCW, simple;
* an EAR is a convex corner (cross > 0) whose triangle contains no
  other remaining vertex STRICTLY inside (three cross products > 0);
* each round clips the ear at the smallest current position — a total
  order, so the triangulation is unique and the DuckDB oracle replays
  the same rounds as window/anti-join event-loop CTEs.

The engine clips each polygon independently inside one applyInPandas
group (polygons are small; the DATASET is what's large), emitting
(key, i0, i1, i2, area2) with area2 = the exact doubled triangle area;
sum(area2) per key equals the doubled polygon area — the invariant the
tests pin."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRI_SCHEMA = "key long, i0 long, i1 long, i2 long, area2 long"


def _cross(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def ear_clip_py(idx, xs, ys):
    """Pure-Python ear clip over vertex indices -> [(i0, i1, i2, area2)].
    Deterministic: always clips the valid ear at the smallest position."""
    order = list(range(len(idx)))
    tris = []
    while len(order) > 3:
        n = len(order)
        pick = None
        for j in range(n):
            a, b, c = order[j - 1], order[j], order[(j + 1) % n]
            cr = _cross(xs[a], ys[a], xs[b], ys[b], xs[c], ys[c])
            if cr <= 0:
                continue
            ok = True
            for k in order:
                if k in (a, b, c):
                    continue
                if (
                    _cross(xs[a], ys[a], xs[b], ys[b], xs[k], ys[k]) > 0
                    and _cross(xs[b], ys[b], xs[c], ys[c], xs[k], ys[k]) > 0
                    and _cross(xs[c], ys[c], xs[a], ys[a], xs[k], ys[k]) > 0
                ):
                    ok = False
                    break
            if ok:
                pick = (j, a, b, c, cr)
                break
        if pick is None:  # degenerate input; stop rather than loop
            break
        j, a, b, c, cr = pick
        tris.append((idx[a], idx[b], idx[c], int(cr)))
        order.pop(j)
    if len(order) == 3:
        a, b, c = order
        cr = _cross(xs[a], ys[a], xs[b], ys[b], xs[c], ys[c])
        tris.append((idx[a], idx[b], idx[c], int(cr)))
    return tris


def triangulate(
    vertices: DataFrame,
    key_col: str = "key",
    i_col: str = "i",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(key, i, x, y) CCW simple polygons -> (key, i0, i1, i2, area2)."""
    v = vertices.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(i_col).cast("long").alias("i"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )

    def clip(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        idx = pdf["i"].to_numpy(np.int64)
        xs = pdf["x"].to_numpy(object)  # python ints: no overflow
        ys = pdf["y"].to_numpy(object)
        tris = ear_clip_py(list(idx), list(xs), list(ys))
        key = int(pdf["key"].iloc[0])
        return pd.DataFrame(
            [{"key": key, "i0": a, "i1": b, "i2": c, "area2": s}
             for a, b, c, s in tris]
        )

    return v.groupBy("key").applyInPandas(clip, TRI_SCHEMA)


def triangulate_sql(points_select: str, max_rounds: int) -> str:
    """DuckDB oracle for ``triangulate``: the clip rounds unrolled as
    MATERIALIZED CTEs — per round, cyclic prev/next by position join,
    the ear predicate as NOT EXISTS over strictly-inside vertices, the
    smallest-position pick, and state shrink with positions renumbered.
    ``points_select`` must yield (key, i, x, y); ``max_rounds`` >=
    (largest polygon size - 3)."""
    blocks = [
        f"""s0 AS MATERIALIZED (
  SELECT key, CAST(row_number() OVER (PARTITION BY key ORDER BY i)
              AS BIGINT) AS pos, i, x, y
  FROM ({points_select}) pts)"""
    ]
    emits = []
    for r in range(int(max_rounds) + 1):
        last = r == int(max_rounds)
        blocks.append(f"""t{r} AS MATERIALIZED (
  SELECT key, pos, i, x, y, count(*) OVER (PARTITION BY key) AS n
  FROM s{r})""")
        blocks.append(f"""c{r} AS MATERIALIZED (
  SELECT s.key, s.pos, s.n, p.i AS ia, s.i AS ib, q.i AS ic,
         p.x AS ax, p.y AS ay, s.x AS bx, s.y AS byy,
         q.x AS cx, q.y AS cy,
         (s.x - p.x) * (q.y - p.y) - (s.y - p.y) * (q.x - p.x) AS cr
  FROM t{r} s
  JOIN t{r} p ON p.key = s.key
   AND p.pos = CASE WHEN s.pos = 1 THEN s.n ELSE s.pos - 1 END
  JOIN t{r} q ON q.key = s.key
   AND q.pos = CASE WHEN s.pos = s.n THEN 1 ELSE s.pos + 1 END)""")
        if last:
            blocks.append(f"""fin AS MATERIALIZED (
  SELECT key, ia AS i0, ib AS i1, ic AS i2, cr AS area2
  FROM c{r} WHERE n = 3 AND pos = 2)""")
            break
        blocks.append(f"""ear{r} AS MATERIALIZED (
  SELECT c.* FROM c{r} c
  WHERE c.n > 3 AND c.cr > 0 AND NOT EXISTS (
    SELECT 1 FROM t{r} o
    WHERE o.key = c.key AND o.i <> c.ia AND o.i <> c.ib AND o.i <> c.ic
      AND (c.bx - c.ax) * (o.y - c.ay) - (c.byy - c.ay) * (o.x - c.ax) > 0
      AND (c.cx - c.bx) * (o.y - c.byy) - (c.cy - c.byy) * (o.x - c.bx) > 0
      AND (c.ax - c.cx) * (o.y - c.cy) - (c.ay - c.cy) * (o.x - c.cx) > 0))""")
        blocks.append(f"""pick{r} AS MATERIALIZED (
  SELECT e.* FROM ear{r} e
  JOIN (SELECT key, min(pos) AS pos FROM ear{r} GROUP BY 1) m
    ON m.key = e.key AND m.pos = e.pos)""")
        emits.append(
            f"SELECT key, ia AS i0, ib AS i1, ic AS i2, cr AS area2 "
            f"FROM pick{r}"
        )
        blocks.append(f"""s{r + 1} AS MATERIALIZED (
  SELECT t.key, CAST(row_number() OVER (PARTITION BY t.key ORDER BY t.pos)
              AS BIGINT) AS pos, t.i, t.x, t.y
  FROM t{r} t
  LEFT JOIN pick{r} pk ON pk.key = t.key AND pk.ib = t.i
  WHERE pk.key IS NULL)""")
    emits.append("SELECT key, i0, i1, i2, area2 FROM fin")
    union = " UNION ALL ".join(emits)
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"\nSELECT key, i0, i1, i2, CAST(area2 AS BIGINT) AS area2 "
        f"FROM ({union}) allt"
    )


def delaunay_triangles(
    pts: DataFrame,
    key_col: str = "k",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Delaunay triangulation by the DEFINITION (empty OPEN circumdisk)
    over integer points -> (k, ax, ay, bx, by, cx, cy), vertices in
    lexicographic order: a non-degenerate triple is emitted iff no other
    point of the group lies STRICTLY inside its circumcircle — on
    cocircular ties both diagonals qualify, which keeps the output a
    deterministic set function of the points.  Exact arbitrary-precision
    integer incircle determinants (Python ints; coordinates up to ~2e7
    push the determinant past int64).

    Shape: one applyInPandas per key over capped point sets — the brute
    O(n^4) *verifier* form (divide-and-conquer is the documented scale
    path; the oracle runs the identical definition in HUGEINT SQL)."""
    from itertools import combinations

    import pandas as pd

    def fn(key, pdf):
        p = sorted(set(zip(
            (int(v) for v in pdf[x_col]), (int(v) for v in pdf[y_col])
        )))
        out = []
        for a, b, c in combinations(p, 3):
            orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if orient == 0:
                continue
            ok = True
            for d in p:
                if d in (a, b, c):
                    continue
                adx, ady = a[0] - d[0], a[1] - d[1]
                bdx, bdy = b[0] - d[0], b[1] - d[1]
                cdx, cdy = c[0] - d[0], c[1] - d[1]
                ad2 = adx * adx + ady * ady
                bd2 = bdx * bdx + bdy * bdy
                cd2 = cdx * cdx + cdy * cdy
                det = (adx * (bdy * cd2 - cdy * bd2)
                       - ady * (bdx * cd2 - cdx * bd2)
                       + ad2 * (bdx * cdy - cdx * bdy))
                if (det > 0) == (orient > 0) and det != 0:
                    ok = False
                    break
            if ok:
                out.append({
                    "k": int(key[0]),
                    "ax": a[0], "ay": a[1], "bx": b[0], "by": b[1],
                    "cx": c[0], "cy": c[1],
                })
        return pd.DataFrame(
            out, columns=["k", "ax", "ay", "bx", "by", "cx", "cy"]
        )

    return (
        pts.select(F.col(key_col).alias("k"), F.col(x_col).alias(x_col),
                   F.col(y_col).alias(y_col))
        .groupBy("k")
        .applyInPandas(
            fn,
            schema="k long, ax long, ay long, bx long, by long, cx long, cy long",
        )
    )


def delaunay_triangles_sql(points_select: str) -> str:
    """DuckDB oracle for ``delaunay_triangles``: the same definition with
    HUGEINT incircle determinants (int64 would overflow at ~2e7
    coordinates); strict-inside = determinant sign equals the
    orientation sign.  ``points_select`` -> (k, x, y)."""

    def h(e):
        return f"CAST({e} AS HUGEINT)"

    det = (
        f"({h('a.x - d.x')} * ({h('b.y - d.y')} * cd2 - {h('c.y - d.y')} * bd2)"
        f" - {h('a.y - d.y')} * ({h('b.x - d.x')} * cd2 - {h('c.x - d.x')} * bd2)"
        f" + ad2 * ({h('b.x - d.x')} * {h('c.y - d.y')}"
        f" - {h('c.x - d.x')} * {h('b.y - d.y')}))"
    )
    return f"""
WITH p AS MATERIALIZED (SELECT DISTINCT k, x, y FROM ({points_select}) s)
SELECT a.k, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by, c.x AS cx, c.y AS cy
FROM p a
JOIN p b ON b.k = a.k AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
JOIN p c ON c.k = a.k AND (b.x < c.x OR (b.x = c.x AND b.y < c.y))
WHERE (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) != 0
  AND NOT EXISTS (
    SELECT 1 FROM p d,
      LATERAL (SELECT {h('a.x - d.x')} * {h('a.x - d.x')}
                      + {h('a.y - d.y')} * {h('a.y - d.y')} AS ad2,
                      {h('b.x - d.x')} * {h('b.x - d.x')}
                      + {h('b.y - d.y')} * {h('b.y - d.y')} AS bd2,
                      {h('c.x - d.x')} * {h('c.x - d.x')}
                      + {h('c.y - d.y')} * {h('c.y - d.y')} AS cd2) q
    WHERE d.k = a.k
      AND (d.x != a.x OR d.y != a.y)
      AND (d.x != b.x OR d.y != b.y)
      AND (d.x != c.x OR d.y != c.y)
      AND {det} != 0
      AND (({det} > 0) = ((b.x - a.x) * (c.y - a.y)
                          - (b.y - a.y) * (c.x - a.x) > 0)))"""


def alpha_shape_edges(
    pts: DataFrame,
    alpha: int,
    key_col: str = "k",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Alpha-shape boundary (Edelsbrunner 1983, public literature) ->
    (k, ax, ay, bx, by): edges of the alpha complex (Delaunay triangles
    with circumradius <= alpha) that bound exactly ONE such triangle —
    the concave-hull outline.  The radius filter is the exact integer
    cross-comparison  a2*b2*c2 <= 4*alpha^2*(2A)^2  (R = abc/4A), in
    arbitrary-precision ints engine-side / HUGEINT oracle-side, so
    coordinates must stay <= ~4e5 for the HUGEINT replay."""
    from itertools import combinations

    import pandas as pd

    a2 = int(alpha) * int(alpha)

    def fn(key, pdf):
        p = sorted(set(zip(
            (int(v) for v in pdf[x_col]), (int(v) for v in pdf[y_col])
        )))
        from collections import Counter

        edges = Counter()
        for a, b, c in combinations(p, 3):
            orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if orient == 0:
                continue
            ok = True
            for d in p:
                if d in (a, b, c):
                    continue
                adx, ady = a[0] - d[0], a[1] - d[1]
                bdx, bdy = b[0] - d[0], b[1] - d[1]
                cdx, cdy = c[0] - d[0], c[1] - d[1]
                ad2 = adx * adx + ady * ady
                bd2 = bdx * bdx + bdy * bdy
                cd2 = cdx * cdx + cdy * cdy
                det = (adx * (bdy * cd2 - cdy * bd2)
                       - ady * (bdx * cd2 - cdx * bd2)
                       + ad2 * (bdx * cdy - cdx * bdy))
                if det != 0 and (det > 0) == (orient > 0):
                    ok = False
                    break
            if not ok:
                continue
            dab = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            dbc = (b[0] - c[0]) ** 2 + (b[1] - c[1]) ** 2
            dca = (c[0] - a[0]) ** 2 + (c[1] - a[1]) ** 2
            if dab * dbc * dca > 4 * a2 * orient * orient:
                continue
            for u, v in ((a, b), (b, c), (a, c)):
                edges[(u, v)] += 1
        out = [
            {"k": int(key[0]), "ax": u[0], "ay": u[1], "bx": v[0], "by": v[1]}
            for (u, v), n in edges.items() if n == 1
        ]
        return pd.DataFrame(out, columns=["k", "ax", "ay", "bx", "by"])

    return (
        pts.select(F.col(key_col).alias("k"), F.col(x_col).alias(x_col),
                   F.col(y_col).alias(y_col))
        .groupBy("k")
        .applyInPandas(fn, schema="k long, ax long, ay long, bx long, by long")
    )


def alpha_shape_edges_sql(points_select: str, alpha: int) -> str:
    """DuckDB oracle for ``alpha_shape_edges``: the Delaunay definition
    plus the HUGEINT circumradius comparison, then the boundary
    count(*) = 1 over normalized triangle edges."""
    a2 = int(alpha) * int(alpha)
    tri = delaunay_triangles_sql(points_select)
    return f"""
WITH tri AS MATERIALIZED ({tri}),
alpha AS MATERIALIZED (
  SELECT * FROM tri
  WHERE CAST((ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS HUGEINT)
        * CAST((bx - cx) * (bx - cx) + (by - cy) * (by - cy) AS HUGEINT)
        * CAST((cx - ax) * (cx - ax) + (cy - ay) * (cy - ay) AS HUGEINT)
        <= 4 * CAST({a2} AS HUGEINT)
           * CAST((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) AS HUGEINT)
           * CAST((bx - ax) * (cy - ay) - (by - ay) * (cx - ax) AS HUGEINT)),
ed AS (
  SELECT k, ax, ay, bx, by FROM alpha
  UNION ALL SELECT k, bx, by, cx, cy FROM alpha
  UNION ALL SELECT k, ax, ay, cx, cy FROM alpha)
SELECT k, ax, ay, bx, by FROM ed
GROUP BY k, ax, ay, bx, by HAVING count(*) = 1"""


def min_enclosing_circle(
    pts: DataFrame,
    key_col: str = "k",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Minimum enclosing circle per key, by the DEFINITION: the MEC of a
    point set is determined by 2 points (diametral) or 3 points
    (circumcircle), so enumerate every pair and non-degenerate triple,
    keep candidates whose circle contains ALL points (exact integer
    rational containment: (d*px - ux)^2 + (d*py - uy)^2 <= r2num with
    center (ux/d, uy/d), radius^2 = r2num/d^2 — Python bigints engine-side,
    HUGEINT oracle-side), then pick the minimum.

    Selection is by the IDENTICAL double triple (r2, cx, cy) both sides —
    each double is one correctly-rounded cast/divide of the same exact
    integers, so engine and oracle mis-rank (if two distinct candidate
    circles round to equal doubles) identically; containment stays exact.
    Groups with a single distinct point emit nothing (no pair exists).

    Shape: one applyInPandas per key over capped point sets — the brute
    O(n^5) *verifier* form (Welzl's randomized O(n) is the documented
    single-machine path; per-key sets here are bounded).  Keep |coords|
    <= ~2e4: the containment product is then < 6e28, inside HUGEINT with
    nine orders of margin.
    """
    from itertools import combinations

    import pandas as pd

    def fn(key, pdf):
        p = sorted(set(zip(
            (int(v) for v in pdf[x_col]), (int(v) for v in pdf[y_col])
        )))
        cands = []
        for a, b in combinations(p, 2):
            ux, uy, d = a[0] + b[0], a[1] + b[1], 2
            r2 = (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
            cands.append((ux, uy, d, r2, a))
        for a, b, c in combinations(p, 3):
            dd = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                      + c[0] * (a[1] - b[1]))
            if dd == 0:
                continue
            na, nb, nc = (a[0] ** 2 + a[1] ** 2, b[0] ** 2 + b[1] ** 2,
                          c[0] ** 2 + c[1] ** 2)
            ux = na * (b[1] - c[1]) + nb * (c[1] - a[1]) + nc * (a[1] - b[1])
            uy = na * (c[0] - b[0]) + nb * (a[0] - c[0]) + nc * (b[0] - a[0])
            if dd < 0:
                ux, uy, dd = -ux, -uy, -dd
            r2 = (dd * a[0] - ux) ** 2 + (dd * a[1] - uy) ** 2
            cands.append((ux, uy, dd, r2, a))
        best = None
        for ux, uy, d, r2, _ in cands:
            if all((d * px - ux) ** 2 + (d * py - uy) ** 2 <= r2
                   for px, py in p):
                fd = float(d)
                trip = (float(r2) / (fd * fd), float(ux) / fd, float(uy) / fd)
                if best is None or trip < best:
                    best = trip
        if best is None:
            return pd.DataFrame(columns=["k", "r2", "cx", "cy"])
        return pd.DataFrame(
            [{"k": int(key[0]), "r2": best[0], "cx": best[1], "cy": best[2]}]
        )

    return (
        pts.select(F.col(key_col).alias("k"), F.col(x_col).alias(x_col),
                   F.col(y_col).alias(y_col))
        .groupBy("k")
        .applyInPandas(fn, "k long, r2 double, cx double, cy double")
    )


def min_enclosing_circle_sql(base_select: str) -> str:
    """DuckDB twin of ``min_enclosing_circle`` over ``(k, x, y)`` rows —
    HUGEINT candidate enumeration + exact containment, double pick."""
    return f"""
WITH p AS (
  SELECT DISTINCT k, CAST(x AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
  FROM ({base_select}) bs),
pair AS (
  SELECT a.k, a.x + b.x AS ux, a.y + b.y AS uy, CAST(2 AS HUGEINT) AS d,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS r2
  FROM p a JOIN p b
    ON a.k = b.k AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
tri0 AS (
  SELECT a.k, a.x AS ax, a.y AS ay,
         (a.x * a.x + a.y * a.y) * (b.y - c.y)
           + (b.x * b.x + b.y * b.y) * (c.y - a.y)
           + (c.x * c.x + c.y * c.y) * (a.y - b.y) AS ux,
         (a.x * a.x + a.y * a.y) * (c.x - b.x)
           + (b.x * b.x + b.y * b.y) * (a.x - c.x)
           + (c.x * c.x + c.y * c.y) * (b.x - a.x) AS uy,
         2 * (a.x * (b.y - c.y) + b.x * (c.y - a.y) + c.x * (a.y - b.y)) AS dd
  FROM p a JOIN p b ON a.k = b.k AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
           JOIN p c ON b.k = c.k AND (b.x < c.x OR (b.x = c.x AND b.y < c.y))),
tri AS (
  SELECT k,
         CASE WHEN dd < 0 THEN -ux ELSE ux END AS ux,
         CASE WHEN dd < 0 THEN -uy ELSE uy END AS uy,
         abs(dd) AS d,
         (abs(dd) * ax - CASE WHEN dd < 0 THEN -ux ELSE ux END)
           * (abs(dd) * ax - CASE WHEN dd < 0 THEN -ux ELSE ux END)
         + (abs(dd) * ay - CASE WHEN dd < 0 THEN -uy ELSE uy END)
           * (abs(dd) * ay - CASE WHEN dd < 0 THEN -uy ELSE uy END) AS r2
  FROM tri0 WHERE dd <> 0),
cands AS (SELECT * FROM pair UNION ALL SELECT * FROM tri),
valid AS (
  SELECT c.k,
         CAST(c.r2 AS DOUBLE) / (CAST(c.d AS DOUBLE) * CAST(c.d AS DOUBLE)) AS r2,
         CAST(c.ux AS DOUBLE) / CAST(c.d AS DOUBLE) AS cx,
         CAST(c.uy AS DOUBLE) / CAST(c.d AS DOUBLE) AS cy
  FROM cands c
  WHERE NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.k = c.k
      AND (c.d * p.x - c.ux) * (c.d * p.x - c.ux)
        + (c.d * p.y - c.uy) * (c.d * p.y - c.uy) > c.r2))
SELECT k, r2, cx, cy FROM (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY r2, cx, cy) AS rn
  FROM valid) r
WHERE rn = 1"""
