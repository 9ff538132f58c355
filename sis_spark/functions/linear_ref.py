"""Linear referencing along polylines — ST_LineInterpolatePoint analog.

The reference's linear-referencing intent lives in its coverage/transfer
machinery (positions along a curve parameterized by arc length); the
PostGIS/SQL-MM surface users actually call is ST_LineInterpolatePoint
(point at fraction t of the line's length).  This module implements it as
PURE DataFrame codegen — no UDF, no geometry object materialization:

    posexplode vertices -> lead() segment endpoints -> quantized segment
    lengths -> integer running sum -> rational-fraction segment pick ->
    one in-segment linear interpolation.

Exactness model (synth.py playbook): each segment length is floor-quantized
to int64 immediately after the one correctly-rounded sqrt (IEEE guarantees
Java's and DuckDB's sqrt agree bit-for-bit on identical doubles), so the
running sums are order-independent integers; the fraction is a RATIONAL
p/q and the segment pick compares q*cum <= p*total as int64 — no float
crosses an inequality anywhere.  Only the final in-segment lerp is floating
point, and it is floor-quantized with the irrational offset for export.

Scale shape: one window partition per line (vertex counts are bounded),
one broadcast of the fraction list, no shuffle beyond the per-line window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OFF = "0.12345678987"
_SCALE = "1.0e6"


def line_interpolate_points(
    pts: DataFrame,
    fracs: list[tuple[int, int]],
    key_col: str = "k",
    order_col: str = "o",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Point at fraction p/q (0 <= p/q < 1) of each polyline's length ->
    (key, p, q, seg, qx, qy).

    ``pts``: integer-quantized vertices (key, order, x, y); ``fracs``:
    rational fractions as (p, q) pairs.  ``seg`` is the 0-based index of
    the segment containing the target arc length; zero-length segments are
    skipped by the strict upper bound.  Lines whose total quantized length
    is zero produce no row.
    """
    w = Window.partitionBy(key_col).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(key_col)
    x, y = F.col(x_col), F.col(y_col)
    dx = F.col("x2") - x
    dy = F.col("y2") - y
    seg = (
        pts.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            x.alias("x"),
            y.alias("y"),
            F.lead(x_col).over(w).alias("x2"),
            F.lead(y_col).over(w).alias("y2"),
        )
        .filter(F.col("x2").isNotNull())
        .withColumn(
            "slen",
            F.floor(
                F.sqrt((dx * dx + dy * dy).cast("double"))
                * F.expr(_SCALE)
                + F.expr(_OFF)
            ).cast("long"),
        )
    )
    w2 = Window.partitionBy("k").orderBy("o")
    seg = (
        seg.withColumn("seg", (F.row_number().over(w2) - 1).cast("long"))
        .withColumn(
            "cum", F.sum("slen").over(w2.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("total", F.sum("slen").over(Window.partitionBy("k")))
        .withColumn("cum_prev", F.col("cum") - F.col("slen"))
        .filter(F.col("total") > 0)
    )
    fr = pts.sparkSession.createDataFrame(
        [(int(p), int(q)) for p, q in fracs], ["p", "q"]
    )
    hit = seg.crossJoin(F.broadcast(fr)).filter(
        (F.col("q") * F.col("cum_prev") <= F.col("p") * F.col("total"))
        & (F.col("p") * F.col("total") < F.col("q") * F.col("cum"))
    )
    t = (
        (F.col("p") * F.col("total") - F.col("q") * F.col("cum_prev"))
        .cast("double")
        / (F.col("q") * F.col("slen")).cast("double")
    )
    px = F.col("x").cast("double") + (F.col("x2") - F.col("x")).cast("double") * t
    py = F.col("y").cast("double") + (F.col("y2") - F.col("y")).cast("double") * t
    qz = lambda c: F.floor(c * F.expr(_SCALE) + F.expr(_OFF)).cast("long")
    return hit.select(
        F.col("k"), "p", "q", "seg", qz(px).alias("qx"), qz(py).alias("qy")
    )


def line_interpolate_sql(
    points_select: str,
    fracs: list[tuple[int, int]],
) -> str:
    """DuckDB replay of ``line_interpolate_points``; ``points_select`` must
    yield (k, o, x, y) integer vertices."""
    vals = ", ".join(f"({int(p)}, {int(q)})" for p, q in fracs)
    return f"""
WITH pts AS ({points_select}),
segr AS (
  SELECT k, o, x, y,
         lead(x) OVER w AS x2, lead(y) OVER w AS y2,
         CAST(row_number() OVER w AS BIGINT) - 1 AS seg
  FROM pts WINDOW w AS (PARTITION BY k ORDER BY o)),
segs AS (
  SELECT *, CAST(floor(sqrt(CAST((x2 - x) * (x2 - x)
                                 + (y2 - y) * (y2 - y) AS DOUBLE))
                       * {_SCALE} + {_OFF}) AS BIGINT) AS slen
  FROM segr WHERE x2 IS NOT NULL),
cums AS (
  SELECT *,
         sum(slen) OVER (PARTITION BY k ORDER BY o
                         ROWS UNBOUNDED PRECEDING) AS cum,
         sum(slen) OVER (PARTITION BY k) AS total
  FROM segs),
fr(p, q) AS (VALUES {vals}),
hit AS (
  SELECT c.*, fr.p, fr.q, c.cum - c.slen AS cum_prev
  FROM cums c CROSS JOIN fr
  WHERE c.total > 0
    AND fr.q * (c.cum - c.slen) <= fr.p * c.total
    AND fr.p * c.total < fr.q * c.cum),
lerp AS (
  SELECT k, p, q, seg,
         CAST(x AS DOUBLE) + CAST(x2 - x AS DOUBLE)
           * (CAST(p * total - q * cum_prev AS DOUBLE)
              / CAST(q * slen AS DOUBLE)) AS px,
         CAST(y AS DOUBLE) + CAST(y2 - y AS DOUBLE)
           * (CAST(p * total - q * cum_prev AS DOUBLE)
              / CAST(q * slen AS DOUBLE)) AS py
  FROM hit)
SELECT k, p, q, seg,
       CAST(floor(px * {_SCALE} + {_OFF}) AS BIGINT) AS qx,
       CAST(floor(py * {_SCALE} + {_OFF}) AS BIGINT) AS qy
FROM lerp"""
