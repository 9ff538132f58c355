"""Moving-feature trajectory operators over the MF-CSV fragmented shape
(sources/mf_csv.py): position-at-time sampling, per-segment length and
mean speed.

The reference stores trajectories but ships no sampling operator (the
`DefaultEvaluator` analog exists only for rasters); OGC 14-084r2 defines
the linear foliation these operators implement: within one CSV line's
segment the N trajectory vertices are uniformly spaced in time over
[startTime, endTime], and positions between vertices interpolate
linearly.  All math is whole-stage-codegen Column expressions — the only
shuffle in ``position_at`` is the per-feature top-1 segment pick, and
``segment_metrics`` is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Per-edge planar lengths are quantized to int64 (floor(len * 1e9 + 0.5))
# before summing: integer sums are order-independent, so the distributed
# sum matches a sequential oracle bit-exactly (NOTES bit-exactness rule 4).
_LEN_SCALE = 1e9


def _n_points(traj="trajectory"):
    return F.expr(f"size({traj}) / 2").cast("int")


def _us(c):
    # unix_micros only accepts TIMESTAMP; MF times are TIMESTAMP_NTZ.  The
    # session timezone is pinned to UTC (session.py), so the ntz->ltz cast
    # is the identity on the underlying microsecond value.
    return F.unix_micros(c.cast("timestamp"))


def position_at(df: DataFrame, t, keys=("path", "mfidref")) -> DataFrame:
    """Sample each moving feature's position at timestamp ``t``.

    Picks the covering segment (latest start_time <= t with end_time >= t),
    maps ``t`` to the vertex parameter u = frac * (n-1), and interpolates
    between the two bounding vertices.  Features with no segment covering
    ``t`` drop out (the evaluator's nullIfOutside analog).
    """
    from pyspark.sql import Column

    t = t if isinstance(t, Column) else F.lit(t)
    # MF-CSV times are timestamp_ntz; align the probe type so a plain
    # datetime literal (TIMESTAMP_LTZ) doesn't trip strict ntz comparison
    t = t.cast(df.schema["start_time"].dataType)
    cand = df.filter((F.col("start_time") <= t) & (F.col("end_time") >= t))
    w = Window.partitionBy(*keys).orderBy(
        F.col("start_time").desc(), F.col("line_id").desc()
    )
    cand = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)

    n = _n_points()
    frac = (
        (_us(t) - _us(F.col("start_time"))).cast("double")
        / (_us(F.col("end_time")) - _us(F.col("start_time"))).cast("double")
    )
    u = frac * (n - F.lit(1)).cast("double")
    k = F.least(F.floor(u).cast("int"), n - F.lit(2))
    lf = u - k.cast("double")
    xk = F.element_at("trajectory", k * 2 + 1)
    yk = F.element_at("trajectory", k * 2 + 2)
    xk1 = F.element_at("trajectory", k * 2 + 3)
    yk1 = F.element_at("trajectory", k * 2 + 4)
    return cand.select(
        *keys,
        F.col("start_time").alias("seg_start"),
        (xk + lf * (xk1 - xk)).alias("x"),
        (yk + lf * (yk1 - yk)).alias("y"),
    )


def segment_metrics(df: DataFrame) -> DataFrame:
    """Per segment row: quantized planar length (int64, exact in any
    evaluation order) and mean speed in units/second derived from it."""
    edge_len_q = F.expr(
        f"""aggregate(
  sequence(0, cast(size(trajectory) / 2 as int) - 2),
  cast(0 as bigint),
  (acc, j) -> acc + cast(floor(sqrt(
      (trajectory[2*j+2] - trajectory[2*j]) * (trajectory[2*j+2] - trajectory[2*j])
    + (trajectory[2*j+3] - trajectory[2*j+1]) * (trajectory[2*j+3] - trajectory[2*j+1])
  ) * {_LEN_SCALE:.0e} + 5e-1) as bigint))"""
    )
    dur_s = (
        (_us(F.col("end_time")) - _us(F.col("start_time")))
        .cast("double") / F.lit(1e6)
    )
    return df.select(
        "path", "line_id", "mfidref", "start_time", "end_time",
        _n_points().alias("n_points"),
        edge_len_q.alias("len_q"),
        ((edge_len_q.cast("double") / F.lit(_LEN_SCALE)) / dur_s).alias("speed"),
    )
