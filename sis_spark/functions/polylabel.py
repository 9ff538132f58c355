"""Pole of inaccessibility ("polylabel") — the label-placement point.

Re-derivation of the Mapbox polylabel algorithm (Agafonkin 2016; the
quadtree refinement over signed distance to the polygon boundary) as a
LEVEL-SYNCHRONOUS distributed search instead of a priority queue:

* level 0 is one power-of-two square over the polygon bbox;
* every level splits each surviving cell into 4 and keeps a cell only
  if its upper bound (signed center distance + cell half-diagonal)
  reaches the level's best signed distance;
* after D levels the answer is the argmax cell center, tie-broken by
  (cx, cy).

EXACT replayability: all coordinates are pre-scaled by 2^(D+1) so every
cell center at every level is an integer; point-segment distance picks
its branch by INTEGER dot products and evaluates the interior branch as
the deterministic double cross*cross/len2 (every FP op identical in
Spark and DuckDB — correctly-rounded /, sqrt, and int->double casts);
inside/outside is the exact integer even-odd ray cast.  Everything is
JVM codegen — the per-level plan is one explode + one broadcastable
edge join + two aggregations, no Python and no driver state."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 1 << 20
_HALF_SQRT2 = math.sqrt(2.0) / 2.0


def _dist_exprs(px: str, py: str):
    """(d2_double, crossing_int) SQL expressions for point (px, py)
    against edge columns ax, ay, bx, by — shared text between the Spark
    engine and the DuckDB oracle, so every FP bit matches."""
    dot = f"(({px}) - ax) * (bx - ax) + (({py}) - ay) * (by - ay)"
    len2 = "(bx - ax) * (bx - ax) + (by - ay) * (by - ay)"
    d2a = (f"CAST((({px}) - ax) * (({px}) - ax) "
           f"+ (({py}) - ay) * (({py}) - ay) AS DOUBLE)")
    d2b = (f"CAST((({px}) - bx) * (({px}) - bx) "
           f"+ (({py}) - by) * (({py}) - by) AS DOUBLE)")
    cross = f"CAST((bx - ax) * (({py}) - ay) - (by - ay) * (({px}) - ax) AS DOUBLE)"
    d2 = (f"CASE WHEN ({dot}) <= 0 THEN {d2a} "
          f"WHEN ({dot}) >= ({len2}) THEN {d2b} "
          f"ELSE ({cross}) * ({cross}) / CAST({len2} AS DOUBLE) END")
    e = f"(({px}) - ax) * (by - ay) - (({py}) - ay) * (bx - ax)"
    crossing = (
        f"CASE WHEN ((ay > ({py})) <> (by > ({py}))) AND "
        f"((by > ay AND ({e}) < 0) OR (by < ay AND ({e}) > 0)) "
        f"THEN 1 ELSE 0 END"
    )
    return d2, crossing


def _score_cells(cells: DataFrame, edges: DataFrame) -> DataFrame:
    """(key, cx, cy, s) x edges -> + (dq signed, in) per cell."""
    d2, crossing = _dist_exprs("cx", "cy")
    per = (
        cells.join(F.broadcast(edges), "key")
        .select(
            "key", "cx", "cy", "s",
            F.expr(d2).alias("d2"),
            F.expr(crossing).alias("cr"),
        )
        .groupBy("key", "cx", "cy", "s")
        .agg(F.min("d2").alias("d2"), F.sum("cr").alias("ncr"))
    )
    return per.select(
        "key", "cx", "cy", "s",
        (
            F.when(F.col("ncr") % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
            * F.floor(F.lit(float(_Q)) * F.sqrt(F.col("d2"))).cast("long")
        ).alias("dq"),
    )


def polylabel(
    edges: DataFrame,
    depth: int = 6,
) -> DataFrame:
    """Per-key pole of inaccessibility -> (key, cx, cy, dq): the argmax
    cell center after ``depth`` pruned quadtree levels, coordinates in
    the 2^(depth+1)-scaled integer frame, dq = floor(2^20 * signed
    distance to the boundary) in scaled units.  ``edges``: (key, ax,
    ay, bx, by) raw integer polygon edges (scaled internally)."""
    D = int(depth)
    sc = 1 << (D + 1)
    e = edges.select(
        "key",
        (F.col("ax") * sc).alias("ax"), (F.col("ay") * sc).alias("ay"),
        (F.col("bx") * sc).alias("bx"), (F.col("by") * sc).alias("by"),
    ).localCheckpoint()
    bbox = e.groupBy("key").agg(
        F.least(F.min("ax"), F.min("bx")).alias("x0"),
        F.least(F.min("ay"), F.min("by")).alias("y0"),
        F.greatest(F.max("ax"), F.max("bx")).alias("x1"),
        F.greatest(F.max("ay"), F.max("by")).alias("y1"),
    )
    cells = bbox.select(
        "key",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), "
            "CAST(ceil(log2(CAST(greatest(x1 - x0, y1 - y0) AS DOUBLE))) "
            "AS INT))"
        ).alias("s"),
        "x0", "y0",
    ).select(
        "key",
        (F.col("x0") + F.expr("s div 2")).alias("cx"),
        (F.col("y0") + F.expr("s div 2")).alias("cy"),
        "s",
    )
    scored = _score_cells(cells, e).localCheckpoint()
    for _ in range(D):
        kids = scored.select(
            "key",
            F.explode(F.array(*[
                F.struct(
                    (F.col("cx") + dx * F.expr("s div 4")).alias("cx"),
                    (F.col("cy") + dy * F.expr("s div 4")).alias("cy"),
                )
                for dx in (-1, 1) for dy in (-1, 1)
            ])).alias("c"),
            F.expr("s div 2").alias("s"),
        ).select("key", "c.cx", "c.cy", "s")
        scored = _score_cells(kids, e)
        best = scored.groupBy("key").agg(F.max("dq").alias("best"))
        # +1 absorbs the floor-quantization slack so the cell holding
        # the true optimum can never be pruned by an off-by-one
        rq = F.ceil(
            F.col("s").cast("double") * F.lit(_HALF_SQRT2 * float(_Q))
        ).cast("long") + 1
        scored = (
            scored.join(best, "key")
            .filter(F.col("dq") + rq >= F.col("best"))
            .select("key", "cx", "cy", "s", "dq")
            .localCheckpoint()
        )
    w = Window.partitionBy("key").orderBy(
        F.col("dq").desc(), F.col("cx").asc(), F.col("cy").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "cx", "cy", "dq")
    )


def polylabel_sql(edges_select: str, depth: int = 6) -> str:
    """DuckDB oracle for ``polylabel``: the same levels as chained
    MATERIALIZED CTEs over identical FP/integer expressions.
    ``edges_select`` must yield (key, ax, ay, bx, by) raw coords."""
    D = int(depth)
    sc = 1 << (D + 1)
    d2, crossing = _dist_exprs("c.cx", "c.cy")
    rq = (f"(CAST(ceil(CAST(c.s AS DOUBLE) * "
          f"{_HALF_SQRT2 * float(_Q)!r}) AS BIGINT) + 1)")

    def score(cells, out):
        return f"""{out} AS MATERIALIZED (
  SELECT key, cx, cy, s,
         (CASE WHEN ncr % 2 = 1 THEN 1 ELSE -1 END)
         * CAST(floor({float(_Q)!r} * sqrt(d2)) AS BIGINT) AS dq
  FROM (
    SELECT c.key, c.cx, c.cy, c.s, min({d2}) AS d2, sum({crossing}) AS ncr
    FROM {cells} c JOIN e ON e.key = c.key
    GROUP BY 1, 2, 3, 4) g)"""

    blocks = [
        f"""e AS MATERIALIZED (
  SELECT key, ax * {sc} AS ax, ay * {sc} AS ay,
         bx * {sc} AS bx, by * {sc} AS by
  FROM ({edges_select}) raw)""",
        """c0 AS MATERIALIZED (
  SELECT key, x0 + s // 2 AS cx, y0 + s // 2 AS cy, s FROM (
    SELECT key,
           (CAST(1 AS BIGINT) << CAST(ceil(log2(CAST(
              greatest(x1 - x0, y1 - y0) AS DOUBLE))) AS INT)) AS s,
           x0, y0
    FROM (
      SELECT key, least(min(ax), min(bx)) AS x0,
             least(min(ay), min(by)) AS y0,
             greatest(max(ax), max(bx)) AS x1,
             greatest(max(ay), max(by)) AS y1
      FROM e GROUP BY key) b) t)""",
        score("c0", "s0"),
    ]
    for l in range(1, D + 1):
        p = l - 1
        blocks.append(f"""k{l} AS MATERIALIZED (
  SELECT key, cx + ox * (s // 4) AS cx, cy + oy * (s // 4) AS cy,
         s // 2 AS s
  FROM s{p}, (VALUES (-1, -1), (-1, 1), (1, -1), (1, 1)) o(ox, oy))""")
        blocks.append(score(f"k{l}", f"sc{l}"))
        blocks.append(f"""s{l} AS MATERIALIZED (
  SELECT c.key, c.cx, c.cy, c.s, c.dq
  FROM sc{l} c
  JOIN (SELECT key, max(dq) AS best FROM sc{l} GROUP BY 1) b
    ON b.key = c.key
  WHERE c.dq + {rq} >= b.best)""")
    return (
        "WITH "
        + ",\n".join(blocks)
        + f"""
SELECT key, cx, cy, dq FROM (
  SELECT key, cx, cy, dq,
         row_number() OVER (PARTITION BY key
                            ORDER BY dq DESC, cx, cy) AS rn
  FROM s{D}) t
WHERE rn = 1"""
    )
