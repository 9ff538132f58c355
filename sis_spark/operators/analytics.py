"""Product-analytics operators: skyline, funnel, retention cohorts.

OUR addition (the reference's query algebra stops at filter/sort/aggregate;
these are the event-analytics staples a warehouse user expects on top).
All three are exact-integer and oracle-replicable:

- ``skyline2d``: the Pareto frontier (maximize both dims) via the classic
  two-phase distributed skyline — a per-partition prune (each partition's
  local skyline is a provable superset member set of the global one:
  removing a point needs a dominator, and dominators survive locally) then
  the same exact sweep once over the tiny survivor set.  No nested-loop
  join anywhere; the sweep is a sort + one pass.
- ``funnel``: ordered-stage conversion (first A, first B strictly after
  that A, first C strictly after that B) as chained min-aggregations —
  each stage one join + one agg, no sequence scan.
- ``retention``: cohort-week x week-offset active-user counts from integer
  epoch-day buckets (no calendar/timezone semantics to diverge on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _skyline_pass(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One exact dominance sweep WITHIN each partition: sort by (x desc,
    y desc), drop p iff some strictly-greater-x point has y >= p.y or a
    same-x point has y > p.y."""
    import numpy as np
    import pandas as pd

    cols = df.columns

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([x_col, y_col], ascending=False,
                                  kind="mergesort").reset_index(drop=True)
            x = pdf[x_col].to_numpy(dtype=np.int64)
            y = pdf[y_col].to_numpy(dtype=np.int64)
            keep = np.zeros(len(pdf), dtype=bool)
            max_y_higher_x = -(1 << 62)
            i = 0
            while i < len(pdf):
                j = i
                while j < len(pdf) and x[j] == x[i]:
                    j += 1
                gmax = int(y[i:j].max())
                for t in range(i, j):
                    dominated = (max_y_higher_x >= y[t]) or (gmax > y[t])
                    keep[t] = not dominated
                max_y_higher_x = max(max_y_higher_x, gmax)
                i = j
            out = pdf[keep]
            if len(out):
                yield out[cols]

    return df.mapInPandas(fn, df.schema)


def skyline2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Global 2-D skyline (maximize x AND y; a point survives unless some
    other point is >= in both dims and > in at least one; exact
    duplicates all survive).  Phase 1 prunes per partition; phase 2 runs
    the same exact sweep over the survivors in one partition — survivor
    count is the local skyline union, typically O(partitions * skyline)."""
    local = _skyline_pass(df, x_col, y_col)
    return _skyline_pass(local.repartition(1), x_col, y_col)


def funnel(
    events: DataFrame,
    stage_col: str,
    stages: tuple,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Ordered-funnel timestamps per user -> (user, t0, t1, ..., tk) with
    t_i = first occurrence of stages[i] STRICTLY after t_{i-1} (NULL once
    a stage is never reached).  Each stage: one equi-join on user + one
    min-agg — no per-user sequence scan."""
    cur = (
        events.filter(F.col(stage_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    for i, st in enumerate(stages[1:], 1):
        nxt = (
            events.filter(F.col(stage_col) == st)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, F.col(f"t{i - 1}").alias("_prev")), user_col)
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    day_col: str = "day",
) -> DataFrame:
    """Cohort retention counts -> (cohort_week, week_offset, n_users):
    cohort_week = floor(first active day / 7); a user counts once per
    distinct active week.  Integer day buckets only — no calendar
    semantics to diverge across engines."""
    first = events.groupBy(user_col).agg(
        F.expr(f"min({day_col}) div 7").alias("cohort_week")
    )
    active = events.select(
        user_col, F.expr(f"{day_col} div 7").alias("week")
    ).distinct()
    return (
        active.join(first, user_col)
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_num: int = 7,
    z_den: int = 2,
) -> DataFrame:
    """Median/MAD outlier detection per group, exact-integer ->
    (group, n, med, mad, n_outliers, outlier_sum).

    med = the element at 0-based rank (n-1) div 2 of the sorted multiset
    (the group_quantiles convention — no FP interpolation), MAD = the
    same rule over |x - med|, and x is an outlier iff
    z_den * |x - med| > z_num * MAD (default 3.5x).  Two window passes
    on the same group key; robust against the skewed heavy tails that
    break mean/stddev z-scores."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = (
        df.select(group_col, value_col)
        .withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    med = ranked.filter(F.expr("__rn = (__n - 1) div 2")).select(
        group_col, F.col(value_col).alias("med")
    )
    dev = df.select(group_col, value_col).join(med, group_col).withColumn(
        "__dev", F.abs(F.col(value_col) - F.col("med"))
    )
    wd = Window.partitionBy(group_col).orderBy("__dev")
    dranked = (
        dev.withColumn("__rn", F.row_number().over(wd) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    mad = dranked.filter(F.expr("__rn = (__n - 1) div 2")).select(
        group_col, F.col("__dev").alias("mad")
    )
    flagged = dev.join(mad, group_col).withColumn(
        "__out",
        (F.lit(z_den) * F.col("__dev") > F.lit(z_num) * F.col("mad")).cast("long"),
    )
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum("__out").alias("n_outliers"),
            F.sum(F.col("__out") * F.col(value_col)).alias("outlier_sum"),
        )
    )


def theil_sen(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    cap: int = 25,
) -> DataFrame:
    """Theil-Sen robust trend per key -> (key, n, n_pairs, dy, dx, slope_q).

    The estimator is the MEDIAN of all pairwise slopes (y_j - y_i)/(t_j -
    t_i) over the first ``cap`` points (rank positions as t, so dx > 0
    always).  The median slope is selected as a sorted-multiset ELEMENT
    under the total order (double quotient, dy, dx, ti) — the IEEE quotient
    of identical int64 operands is identical in any engine, so the selected
    (dy, dx) pair replicates exactly; slope_q is the floor-quantized export.

    Scale shape: pair generation is a rank band self-join bounded by
    cap^2/2 rows per key; one rank window picks the median element.  The
    cap is the documented O(n^2) guard — callers with long series subsample
    first (weighted_sample / stratified_sample are the companions)."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            F.col(value_col).alias("y"),
        )
        .withColumn("t", F.row_number().over(w).cast("long"))
        .filter(F.col("t") <= int(cap))
    )
    lhs = b.select("k", F.col("t").alias("ti"), F.col("y").alias("yi"))
    rhs = b.select(
        F.col("k").alias("k2"), F.col("t").alias("tj"), F.col("y").alias("yj")
    )
    pairs = (
        lhs.join(rhs, (F.col("k") == F.col("k2")) & (F.col("ti") < F.col("tj")))
        .select(
            "k",
            "ti",
            (F.col("yj") - F.col("yi")).alias("dy"),
            (F.col("tj") - F.col("ti")).alias("dx"),
        )
        .withColumn(
            "q", F.col("dy").cast("double") / F.col("dx").cast("double")
        )
    )
    ws = Window.partitionBy("k").orderBy("q", "dy", "dx", "ti")
    ranked = pairs.withColumn(
        "pos", F.row_number().over(ws).cast("long")
    ).withColumn(
        "n_pairs", F.count(F.lit(1)).over(Window.partitionBy("k"))
    )
    med = ranked.filter(F.expr("pos - 1 = (n_pairs - 1) div 2"))
    npts = b.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    return med.join(npts, "k").select(
        "k", "n", "n_pairs", "dy", "dx",
        F.floor(F.col("q") * F.expr("1.0e6") + F.expr("0.12345678987"))
        .cast("long")
        .alias("slope_q"),
    )


def theil_sen_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    value_col: str,
    cap: int = 25,
) -> str:
    """DuckDB replay of ``theil_sen`` — identical band join, total order,
    element pick and quantized export."""
    return f"""
WITH b0 AS (
  SELECT {key_col} AS k, {order_col} AS o, {value_col} AS y,
         CAST(row_number() OVER (PARTITION BY {key_col}
                                 ORDER BY {order_col}) AS BIGINT) AS t
  FROM ({base_select}) s),
b AS (SELECT * FROM b0 WHERE t <= {int(cap)}),
pairs AS (
  SELECT l.k, l.t AS ti, r.y - l.y AS dy, r.t - l.t AS dx,
         CAST(r.y - l.y AS DOUBLE) / CAST(r.t - l.t AS DOUBLE) AS q
  FROM b l JOIN b r ON r.k = l.k AND l.t < r.t),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY k
                ORDER BY q, dy, dx, ti) AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_pairs
  FROM pairs),
med AS (SELECT * FROM ranked WHERE pos - 1 = (n_pairs - 1) // 2),
npts AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1)
SELECT med.k, npts.n, med.n_pairs, med.dy, med.dx,
       CAST(floor(med.q * 1.0e6 + 0.12345678987) AS BIGINT) AS slope_q
FROM med JOIN npts ON npts.k = med.k"""


def ols_trend(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Exact-rational least-squares trend per key -> (key, n, slope_num,
    slope_den, icept_num, icept_den).

    With t = rank position and y the integer value: slope = (n*Sty -
    St*Sy) / (n*Stt - St^2) and intercept = (Sy*slope_den - slope_num*St)
    / (n*slope_den) — every quantity an int64 sum, the estimate an exact
    rational.  ONE window pass for ranks + ONE keyed aggregation; the
    closed form needs no iteration (contrast theil_sen's pair join)."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(value_col).alias("y"),
    ).withColumn("t", F.row_number().over(w).cast("long"))
    agg = b.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    num = F.col("n") * F.col("sty") - F.col("st") * F.col("sy")
    den = F.col("n") * F.col("stt") - F.col("st") * F.col("st")
    return agg.select(
        "k",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        (F.col("sy") * den - num * F.col("st")).alias("icept_num"),
        (F.col("n") * den).alias("icept_den"),
    )


def ols_trend_sql(
    base_select: str, key_col: str, order_col: str, value_col: str
) -> str:
    """DuckDB replay of ``ols_trend``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {value_col} AS y,
         CAST(row_number() OVER (PARTITION BY {key_col}
                                 ORDER BY {order_col}) AS BIGINT) AS t
  FROM ({base_select}) s),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n, sum(t) AS st, sum(y) AS sy,
         sum(t * y) AS sty, sum(t * t) AS stt
  FROM b GROUP BY 1)
SELECT k, n,
       CAST(n * sty - st * sy AS BIGINT) AS slope_num,
       CAST(n * stt - st * st AS BIGINT) AS slope_den,
       CAST(sy * (n * stt - st * st)
            - (n * sty - st * sy) * st AS BIGINT) AS icept_num,
       CAST(n * (n * stt - st * st) AS BIGINT) AS icept_den
FROM agg"""


def rank_sum_u(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mann-Whitney U (doubled, tie-corrected) per key ->
    (key, n1, n2, r1_2, u1_2).

    ``group_col`` is 0/1.  Tied values take the AVERAGE rank; doubling
    keeps it integer: 2*avgrank = 2*rank() + ties - 1 (rank() is the
    1-based lower bound of the tie block, ties its size).  Then
    U1*2 = R1*2 - n1*(n1+1).  All window + agg codegen, exact int64 —
    the nonparametric two-sample location test of the robust-stats
    family (robust_outliers / theil_sen are the companions)."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(group_col).alias("g"),
        F.col(value_col).alias("y"),
    )
    wr = Window.partitionBy("k").orderBy("y")
    wt = Window.partitionBy("k", "y")
    b = b.withColumn(
        "rank2",
        2 * F.rank().over(wr).cast("long")
        + F.count(F.lit(1)).over(wt).cast("long")
        - 1,
    )
    agg = b.groupBy("k").agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("rank2")).otherwise(0)).alias(
            "r1_2"
        ),
    )
    return agg.select(
        "k",
        "n1",
        "n2",
        "r1_2",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2"),
    )


def rank_sum_u_sql(
    base_select: str, key_col: str, group_col: str, value_col: str
) -> str:
    """DuckDB replay of ``rank_sum_u``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {group_col} AS g, {value_col} AS y
  FROM ({base_select}) s),
r AS (
  SELECT k, g,
         2 * CAST(rank() OVER (PARTITION BY k ORDER BY y) AS BIGINT)
         + CAST(count(*) OVER (PARTITION BY k, y) AS BIGINT) - 1 AS rank2
  FROM b),
agg AS (
  SELECT k,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN g = 1 THEN rank2 ELSE 0 END) AS BIGINT) AS r1_2
  FROM r GROUP BY 1)
SELECT k, n1, n2, r1_2, r1_2 - n1 * (n1 + 1) AS u1_2 FROM agg"""


def group_mode(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Deterministic mode per key -> (key, mode, n_mode): the most
    frequent value, smallest value on frequency ties.  One count agg +
    one rank window."""
    from pyspark.sql import Window

    cnt = df.groupBy(
        F.col(key_col).alias("k"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("k").orderBy(F.col("c").desc(), F.col("v"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", F.col("v").alias("mode"), F.col("c").alias("n_mode"))
    )


def group_mode_sql(base_select: str, key_col: str, value_col: str) -> str:
    """DuckDB replay of ``group_mode``."""
    return f"""
WITH cnt AS (
  SELECT {key_col} AS k, {value_col} AS v, CAST(count(*) AS BIGINT) AS c
  FROM ({base_select}) s GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY c DESC, v) AS rn
  FROM cnt)
SELECT k, v AS mode, c AS n_mode FROM r WHERE rn = 1"""


def weighted_median(
    df: DataFrame,
    key_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Weighted lower median per key -> (key, wmed, w_total): the smallest
    value whose running weight (in (value, …) order) reaches half the
    total, i.e. 2*cumw >= totw — exact int64 comparisons for integer
    weights, one sort window + one filter."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).alias("v"),
        F.col(weight_col).alias("w"),
    )
    wo = Window.partitionBy("k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy("k")
    r = (
        b.withColumn("cumw", F.sum("w").over(wo))
        .withColumn("totw", F.sum("w").over(tot))
        .filter(2 * F.col("cumw") >= F.col("totw"))
    )
    wpick = Window.partitionBy("k").orderBy("v")
    return (
        r.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select("k", F.col("v").alias("wmed"), F.col("totw").alias("w_total"))
    )


def weighted_median_sql(
    base_select: str, key_col: str, value_col: str, weight_col: str
) -> str:
    """DuckDB replay of ``weighted_median``.  NOTE: the running sum must
    use an explicit ROWS frame — the default RANGE frame would merge tied
    values (lumping a tie block's weight into its first row), which is a
    DIFFERENT (also valid) definition; ROWS matches the engine."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {value_col} AS v, {weight_col} AS w
  FROM ({base_select}) s),
r AS (
  SELECT k, v,
         sum(w) OVER (PARTITION BY k ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY k) AS totw
  FROM b),
f AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY v) AS rn
  FROM r WHERE 2 * cumw >= totw)
SELECT k, v AS wmed, CAST(totw AS BIGINT) AS w_total FROM f WHERE rn = 1"""


def rle_segments(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """Run-length encoding of a per-key ordered state sequence ->
    (key, seg, state, o_start, o_end, run_len): maximal runs of equal
    consecutive states.  The one-window-pass formulation (change flag =
    state <> lag(state), segment id = running flag sum) — the
    interval_union pattern applied to categorical runs."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(state_col).alias("st"),
    )
    flagged = b.withColumn(
        "f",
        F.when(
            F.lag("st").over(w).isNull()
            | (F.lag("st").over(w) != F.col("st")),
            1,
        ).otherwise(0),
    ).withColumn(
        "seg",
        F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("k", "seg").agg(
        F.min("st").alias("state"),
        F.min("o").alias("o_start"),
        F.max("o").alias("o_end"),
        F.count(F.lit(1)).alias("run_len"),
    )


def rle_segments_sql(
    base_select: str, key_col: str, order_col: str, state_col: str
) -> str:
    """DuckDB replay of ``rle_segments``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {order_col} AS o, {state_col} AS st
  FROM ({base_select}) s),
fl AS (
  SELECT *, CASE WHEN lag(st) OVER w IS NULL OR lag(st) OVER w <> st
                 THEN 1 ELSE 0 END AS f
  FROM b WINDOW w AS (PARTITION BY k ORDER BY o)),
g AS (
  SELECT *, sum(f) OVER (PARTITION BY k ORDER BY o
                         ROWS UNBOUNDED PRECEDING) AS seg
  FROM fl)
SELECT k, CAST(seg AS BIGINT) AS seg, min(st) AS state,
       min(o) AS o_start, max(o) AS o_end,
       CAST(count(*) AS BIGINT) AS run_len
FROM g GROUP BY k, seg"""


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attrs: list[str],
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log ->
    (key, *attrs, valid_from, valid_to, is_current): each change event
    opens a version valid until the NEXT change (lead), the last version
    open-ended (valid_to NULL).  Consecutive duplicates (no attribute
    actually changed) are collapsed first — the warehouse-standard
    compaction.  One window pass end to end."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("ts")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("ts"),
        *[F.col(a) for a in attrs],
    )
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.lag(a).over(w).eqNullSafe(F.col(a))
    b = b.withColumn(
        "f", F.when(F.lag("ts").over(w).isNull() | changed, 1).otherwise(0)
    ).filter(F.col("f") == 1)
    w2 = Window.partitionBy("k").orderBy("ts")
    return (
        b.withColumn("valid_to", F.lead("ts").over(w2))
        .select(
            "k",
            *attrs,
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_intervals_sql(
    base_select: str, key_col: str, ts_col: str, attrs: list[str]
) -> str:
    """DuckDB replay of ``scd2_intervals`` (IS DISTINCT FROM mirrors the
    null-safe change test)."""
    chg = " OR ".join(
        f"lag({a}) OVER w IS DISTINCT FROM {a}" for a in attrs
    )
    alist = ", ".join(attrs)
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {ts_col} AS ts, {alist}
  FROM ({base_select}) s),
fl AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL OR {chg}
                 THEN 1 ELSE 0 END AS f
  FROM b WINDOW w AS (PARTITION BY k ORDER BY ts)),
c AS (SELECT * FROM fl WHERE f = 1),
v AS (
  SELECT *, lead(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
  FROM c)
SELECT k, {alist}, ts AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM v"""


def corr_moments(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pearson correlation in exact integer moments per key ->
    (key, n, cov_n2, varx_n2, vary_n2, corr_q).

    cov_n2 = n*Sxy - Sx*Sy and var*_n2 = n*Sxx - Sx^2 are the covariance
    and variances scaled by n^2 — exact int64 from ONE aggregation.
    corr_q = floor(cov / sqrt(varx*vary) * 1e6 + offset) is the quantized
    export (identical IEEE sequence in both engines: one multiply, one
    sqrt, one divide)."""
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    agg = b.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = cov.cast("double") / F.sqrt(
        vx.cast("double") * vy.cast("double")
    )
    return agg.select(
        "k",
        "n",
        cov.alias("cov_n2"),
        vx.alias("varx_n2"),
        vy.alias("vary_n2"),
        F.floor(corr * F.expr("1.0e6") + F.expr("0.12345678987"))
        .cast("long")
        .alias("corr_q"),
    )


def corr_moments_sql(
    base_select: str, key_col: str, x_col: str, y_col: str
) -> str:
    """DuckDB replay of ``corr_moments``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {x_col} AS x, {y_col} AS y
  FROM ({base_select}) s),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM b GROUP BY 1)
SELECT k, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_n2,
       CAST(n * sxx - sx * sx AS BIGINT) AS varx_n2,
       CAST(n * syy - sy * sy AS BIGINT) AS vary_n2,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE))
                  * 1.0e6 + 0.12345678987) AS BIGINT) AS corr_q
FROM agg"""


def gini(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Gini concentration per key -> (key, n, gini_num, gini_den):
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over values sorted
    ascending (``id_col`` breaks ties) — an exact int64 rational for
    non-negative integer values.  One rank window + one aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("v", "i")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("i"),
    ).withColumn("r", F.row_number().over(w).cast("long"))
    agg = b.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("r") * F.col("v")).alias("srv"),
    )
    return agg.select(
        "k",
        "n",
        (2 * F.col("srv") - (F.col("n") + 1) * F.col("sv")).alias("gini_num"),
        (F.col("n") * F.col("sv")).alias("gini_den"),
    )


def gini_sql(
    base_select: str, key_col: str, value_col: str, id_col: str
) -> str:
    """DuckDB replay of ``gini``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {value_col} AS v, {id_col} AS i,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {value_col}, {id_col}) AS BIGINT) AS r
  FROM ({base_select}) s),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n, sum(v) AS sv,
         sum(r * v) AS srv
  FROM b GROUP BY 1)
SELECT k, n,
       CAST(2 * srv - (n + 1) * sv AS BIGINT) AS gini_num,
       CAST(n * sv AS BIGINT) AS gini_den
FROM agg"""


def kendall_tau(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    cap: int = 25,
) -> DataFrame:
    """Kendall rank-correlation counts per key -> (key, n, n_pairs, nc,
    nd, n_tie): concordant / discordant / value-tied pair counts over the
    first ``cap`` points — exact int64; tau-a = (nc-nd)/n_pairs and tau-b
    follow from the counts, computed by the caller in whatever precision
    they need.  Same capped band self-join shape as theil_sen."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            F.col(value_col).alias("y"),
        )
        .withColumn("t", F.row_number().over(w).cast("long"))
        .filter(F.col("t") <= int(cap))
    )
    lhs = b.select("k", F.col("t").alias("ti"), F.col("y").alias("yi"))
    rhs = b.select(
        F.col("k").alias("k2"), F.col("t").alias("tj"), F.col("y").alias("yj")
    )
    pairs = lhs.join(
        rhs, (F.col("k") == F.col("k2")) & (F.col("ti") < F.col("tj"))
    )
    d = F.col("yj") - F.col("yi")
    agg = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(d > 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(d < 0, 1).otherwise(0)).alias("nd"),
        F.sum(F.when(d == 0, 1).otherwise(0)).alias("n_tie"),
    )
    npts = b.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    return agg.join(npts, "k").select(
        "k", "n", "n_pairs", "nc", "nd", "n_tie"
    )


def kendall_tau_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    value_col: str,
    cap: int = 25,
) -> str:
    """DuckDB replay of ``kendall_tau``."""
    return f"""
WITH b0 AS (
  SELECT {key_col} AS k, {value_col} AS y,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS t
  FROM ({base_select}) s),
b AS (SELECT * FROM b0 WHERE t <= {int(cap)}),
pairs AS (
  SELECT l.k, r.y - l.y AS d
  FROM b l JOIN b r ON r.k = l.k AND l.t < r.t),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
         CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie
  FROM pairs GROUP BY 1),
npts AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1)
SELECT agg.k, npts.n, agg.n_pairs, agg.nc, agg.nd, agg.n_tie
FROM agg JOIN npts ON npts.k = agg.k"""


def spearman_rho(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Spearman rank correlation per key: tie-corrected average ranks
    (doubled to stay integer, the rank_sum_u trick) fed into the exact
    Pearson moments -> (key, n, cov_n2, varx_n2, vary_n2, corr_q) over
    the 2x-rank columns.  Monotone-transform-invariant by construction."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    for c in ("x", "y"):
        b = b.withColumn(
            f"r{c}",
            2 * F.rank().over(Window.partitionBy("k").orderBy(c)).cast("long")
            + F.count(F.lit(1)).over(Window.partitionBy("k", c)).cast("long")
            - 1,
        )
    return corr_moments(b, "k", "rx", "ry")


def spearman_rho_sql(
    base_select: str, key_col: str, x_col: str, y_col: str
) -> str:
    """DuckDB replay of ``spearman_rho``."""
    ranked = f"""
SELECT k,
       2 * CAST(rank() OVER (PARTITION BY k ORDER BY x) AS BIGINT)
       + CAST(count(*) OVER (PARTITION BY k, x) AS BIGINT) - 1 AS rx,
       2 * CAST(rank() OVER (PARTITION BY k ORDER BY y) AS BIGINT)
       + CAST(count(*) OVER (PARTITION BY k, y) AS BIGINT) - 1 AS ry
FROM (SELECT {key_col} AS k, {x_col} AS x, {y_col} AS y
      FROM ({base_select}) s) t"""
    return corr_moments_sql(ranked, "k", "rx", "ry")


def chi2_contingency(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Chi-squared contingency cells -> (row, col, o, r, c, n, contrib_q):
    observed count, row/column/grand totals (exact int64) and the cell's
    chi-squared contribution (O - RC/N)^2 / (RC/N) = (O*N - R*C)^2 /
    (N*R*C), squared in DOUBLE (the int64 square would overflow at sf>=0.1;
    |O*N - R*C| < 2^53 keeps the conversion exact), exported floor-quantized
    at 1e6."""
    obs = df.groupBy(
        F.col(row_col).alias("row_v"), F.col(col_col).alias("col_v")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("row_v").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("col_v").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    j = obs.join(rt, "row_v").join(ct, "col_v").crossJoin(F.broadcast(n))
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c"))
    den = F.col("n") * F.col("r") * F.col("c")
    return j.select(
        "row_v",
        "col_v",
        "o",
        "r",
        "c",
        "n",
        F.floor(
            num.cast("double") * num.cast("double") / den.cast("double")
            * F.expr("1.0e6")
            + F.expr("0.12345678987")
        )
        .cast("long")
        .alias("contrib_q"),
    )


def chi2_contingency_sql(base_select: str, row_col: str, col_col: str) -> str:
    """DuckDB replay of ``chi2_contingency``."""
    return f"""
WITH b AS (
  SELECT {row_col} AS row_v, {col_col} AS col_v
  FROM ({base_select}) s),
obs AS (
  SELECT row_v, col_v, CAST(count(*) AS BIGINT) AS o FROM b GROUP BY 1, 2),
rt AS (SELECT row_v, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
ct AS (SELECT col_v, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
SELECT obs.row_v, obs.col_v, obs.o, rt.r, ct.c, n.n,
       CAST(floor(CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                  * CAST(obs.o * n.n - rt.r * ct.c AS DOUBLE)
                  / CAST(n.n * rt.r * ct.c AS DOUBLE)
                  * 1.0e6 + 0.12345678987) AS BIGINT) AS contrib_q
FROM obs JOIN rt USING (row_v) JOIN ct USING (col_v) CROSS JOIN n"""


def decision_stump(
    df: DataFrame,
    key_col: str,
    x_col: str,
    label_col: str,
) -> DataFrame:
    """Best single-threshold split per key by Gini impurity ->
    (key, n, n_pos, thr, nl, nl_pos, score_num, score_den).

    Candidates are the observed values (split = "x <= thr"); the weighted
    Gini of a split is, up to the constant total impurity, MINIMIZED by
    maximizing  score = nl_pos^2/nl + nl_neg^2/nl + nr_pos^2/nr + ... —
    cross-multiplying gives score = num/den with
        num = (nl_pos^2 + nl_neg^2) * nr + (nr_pos^2 + nr_neg^2) * nl
        den = nl * nr
    (both exact int64 from prefix sums).  The argmax orders by the IEEE
    quotient with ties -> smallest threshold — the changepoint recipe
    applied to classification.  One sort window + one argmax window."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(x_col).alias("x"),
        F.col(label_col).cast("long").alias("y"),
    )
    w = Window.partitionBy("k").orderBy("x")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("k")
    pre = (
        b.withColumn("nl", F.count(F.lit(1)).over(run).cast("long"))
        .withColumn("nl_pos", F.sum("y").over(run))
        .withColumn("n", F.count(F.lit(1)).over(tot).cast("long"))
        .withColumn("n_pos", F.sum("y").over(tot))
        # last row of each tie block only: a split can't separate ties
        .withColumn("rn_in_x", F.row_number().over(
            Window.partitionBy("k", "x").orderBy(F.col("nl").desc())))
        .filter((F.col("rn_in_x") == 1) & (F.col("nl") < F.col("n")))
    )
    nl, nlp = F.col("nl"), F.col("nl_pos")
    nr = F.col("n") - nl
    nrp = F.col("n_pos") - nlp
    num = ((nlp * nlp + (nl - nlp) * (nl - nlp)) * nr
           + (nrp * nrp + (nr - nrp) * (nr - nrp)) * nl)
    den = nl * nr
    scored = pre.select(
        "k", "n", "n_pos", F.col("x").alias("thr"), "nl", "nl_pos",
        num.alias("score_num"), den.alias("score_den"),
    )
    best = Window.partitionBy("k").orderBy(
        (F.col("score_num").cast("double")
         / F.col("score_den").cast("double")).desc(),
        F.col("thr").asc(),
    )
    return (
        scored.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def decision_stump_sql(
    base_select: str, key_col: str, x_col: str, label_col: str
) -> str:
    """DuckDB replay of ``decision_stump``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {x_col} AS x, CAST({label_col} AS BIGINT) AS y
  FROM ({base_select}) s),
pre0 AS (
  SELECT k, x,
         CAST(count(*) OVER (PARTITION BY k ORDER BY x
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
         CAST(sum(y) OVER (PARTITION BY k ORDER BY x
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl_pos,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
         CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS n_pos
  FROM b),
pre1 AS (
  SELECT *, row_number() OVER (PARTITION BY k, x ORDER BY nl DESC) AS rn_in_x
  FROM pre0),
pre AS (SELECT * FROM pre1 WHERE rn_in_x = 1 AND nl < n),
scored AS (
  SELECT k, n, n_pos, x AS thr, nl, nl_pos,
         CAST((nl_pos * nl_pos + (nl - nl_pos) * (nl - nl_pos)) * (n - nl)
              + ((n_pos - nl_pos) * (n_pos - nl_pos)
                 + ((n - nl) - (n_pos - nl_pos))
                   * ((n - nl) - (n_pos - nl_pos))) * nl
              AS BIGINT) AS score_num,
         CAST(nl * (n - nl) AS BIGINT) AS score_den
  FROM pre),
best AS (
  SELECT *, row_number() OVER (PARTITION BY k
       ORDER BY CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE) DESC,
                thr ASC) AS rn
  FROM scored)
SELECT k, n, n_pos, thr, nl, nl_pos, score_num, score_den
FROM best WHERE rn = 1"""


def assoc_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pairwise association rules -> (a, b, n_ab, n_a, n_b, n_baskets):
    support/confidence/lift are the exact rationals n_ab/n, n_ab/n_a and
    n_ab*n/(n_a*n_b) — all counts int64, derivation left rational.

    Scale shape: distinct (basket, item) -> in-basket pair generation by
    self-join on the basket key (fan-out bounded by basket size) ->
    three keyed counts.  ``min_support`` prunes the pair table early."""
    bi = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    pairs = (
        bi.alias("l")
        .join(bi.alias("r"), F.expr("l.bk = r.bk AND l.it < r.it"))
        .groupBy(
            F.col("l.it").alias("a"), F.col("r.it").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support))
    )
    singles = bi.groupBy("it").agg(F.count(F.lit(1)).alias("n_i"))
    nb = bi.select("bk").distinct().count()
    return (
        pairs.join(singles.withColumnRenamed("it", "a"), "a")
        .withColumnRenamed("n_i", "n_a")
        .join(singles.withColumnRenamed("it", "b"), "b")
        .withColumnRenamed("n_i", "n_b")
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            F.lit(int(nb)).cast("long").alias("n_baskets"),
        )
    )


def assoc_rules_sql(
    base_select: str, basket_col: str, item_col: str, min_support: int = 2
) -> str:
    """DuckDB replay of ``assoc_rules``."""
    return f"""
WITH bi AS (
  SELECT DISTINCT {basket_col} AS bk, {item_col} AS it
  FROM ({base_select}) s),
pairs AS (
  SELECT l.it AS a, r.it AS b, CAST(count(*) AS BIGINT) AS n_ab
  FROM bi l JOIN bi r ON r.bk = l.bk AND l.it < r.it
  GROUP BY 1, 2 HAVING count(*) >= {int(min_support)}),
singles AS (SELECT it, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets FROM bi)
SELECT p.a, p.b, p.n_ab, sa.n_i AS n_a, sb.n_i AS n_b, nb.n_baskets
FROM pairs p JOIN singles sa ON sa.it = p.a
     JOIN singles sb ON sb.it = p.b CROSS JOIN nb"""


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """First-order transition counts over per-key ordered state sequences
    -> (from_state, to_state, n_trans, n_from): the empirical Markov
    matrix in exact integers (probability = n_trans/n_from rational).
    One lead window + two keyed counts."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            F.col(state_col).alias("st"),
        )
        .withColumn("nxt", F.lead("st").over(w))
        .filter(F.col("nxt").isNotNull())
    )
    trans = b.groupBy(
        F.col("st").alias("from_state"), F.col("nxt").alias("to_state")
    ).agg(F.count(F.lit(1)).alias("n_trans"))
    froms = b.groupBy(F.col("st").alias("from_state")).agg(
        F.count(F.lit(1)).alias("n_from")
    )
    return trans.join(froms, "from_state")


def markov_transitions_sql(
    base_select: str, key_col: str, order_col: str, state_col: str
) -> str:
    """DuckDB replay of ``markov_transitions``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {state_col} AS st,
         lead({state_col}) OVER (PARTITION BY {key_col}
                                 ORDER BY {order_col}) AS nxt
  FROM ({base_select}) s),
t AS (SELECT * FROM b WHERE nxt IS NOT NULL),
trans AS (
  SELECT st AS from_state, nxt AS to_state, CAST(count(*) AS BIGINT) AS n_trans
  FROM t GROUP BY 1, 2),
froms AS (
  SELECT st AS from_state, CAST(count(*) AS BIGINT) AS n_from
  FROM t GROUP BY 1)
SELECT trans.from_state, trans.to_state, trans.n_trans, froms.n_from
FROM trans JOIN froms USING (from_state)"""


def kaplan_meier(
    df: DataFrame,
    time_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier life table -> (t, n_risk, d, c, log_s_q): at each
    distinct event time, the number at risk, deaths d, censorings c, and
    the survival curve as the RUNNING SUM of per-step quantized
    ln(1 - d/n_risk) terms — each step floor-quantized at 1e9 before the
    integer cumulative sum, so the curve is order-independent and
    bit-replicable (S(t) ~ exp(log_s_q / 1e9)).

    One aggregation by time + two windows; counts are exact int64."""
    from pyspark.sql import Window

    b = df.select(
        F.col(time_col).alias("t"), F.col(event_col).cast("long").alias("e")
    )
    per_t = b.groupBy("t").agg(
        F.sum("e").alias("d"),
        F.sum(1 - F.col("e")).alias("c"),
        F.count(F.lit(1)).alias("leave"),
    )
    w = Window.orderBy("t")
    run = w.rowsBetween(Window.unboundedPreceding, -1)
    n_tot = b.count()
    per_t = per_t.withColumn(
        "n_risk",
        F.lit(int(n_tot)).cast("long")
        - F.coalesce(F.sum("leave").over(run), F.lit(0)),
    )
    step = F.floor(
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double")
            / F.col("n_risk").cast("double")
        )
        * F.expr("1.0e9")
        + F.expr("0.12345678987")
    ).cast("long")
    return (
        per_t.filter(F.col("d") > 0)
        .withColumn("step_q", step)
        .withColumn(
            "log_s_q",
            F.sum("step_q").over(
                Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("t", "n_risk", "d", "c", "log_s_q")
    )


def kaplan_meier_sql(base_select: str, time_col: str, event_col: str) -> str:
    """DuckDB replay of ``kaplan_meier``."""
    return f"""
WITH b AS (
  SELECT {time_col} AS t, CAST({event_col} AS BIGINT) AS e
  FROM ({base_select}) s),
per_t AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d, CAST(sum(1 - e) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS leave
  FROM b GROUP BY 1),
risk AS (
  SELECT *, (SELECT CAST(count(*) AS BIGINT) FROM b)
         - CAST(COALESCE(sum(leave) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
  FROM per_t),
ev AS (
  SELECT *, CAST(floor(ln(CAST(n_risk - d AS DOUBLE)
                          / CAST(n_risk AS DOUBLE))
                 * 1.0e9 + 0.12345678987) AS BIGINT) AS step_q
  FROM risk WHERE d > 0)
SELECT t, n_risk, d, c,
       CAST(sum(step_q) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS log_s_q
FROM ev"""


def roc_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """ROC / PR curve support points -> one row per DISTINCT score
    (thr, n_at, pos_at, tp, fp, fn, tn): confusion counts for the
    classifier "predict positive iff score >= thr", all exact int64.
    Precision/recall/TPR/FPR stay the exact rationals tp/(tp+fp) etc.

    Scale shape: one groupBy collapses the (possibly huge) scored table
    to <= |distinct scores| rows, then a single window cumsum over that
    tiny table — the evaluation twin of ``classifier_score``."""
    from pyspark.sql import Window

    b = df.select(
        F.col(score_col).alias("thr"),
        F.col(label_col).cast("long").alias("y"),
    )
    per = b.groupBy("thr").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("y").alias("pos_at"),
    )
    w = Window.orderBy(F.col("thr").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    return per.select(
        "thr", "n_at", "pos_at",
        F.sum("pos_at").over(w).alias("tp"),
        (F.sum("n_at").over(w) - F.sum("pos_at").over(w)).alias("fp"),
        (F.sum("pos_at").over(tot) - F.sum("pos_at").over(w)).alias("fn"),
        (
            F.sum("n_at").over(tot) - F.sum("pos_at").over(tot)
            - (F.sum("n_at").over(w) - F.sum("pos_at").over(w))
        ).alias("tn"),
    )


def roc_points_sql(base_select: str, score_col: str, label_col: str) -> str:
    """DuckDB replay of ``roc_points``."""
    return f"""
WITH b AS (
  SELECT {score_col} AS thr, CAST({label_col} AS BIGINT) AS y
  FROM ({base_select}) s),
per AS (
  SELECT thr, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(y) AS BIGINT) AS pos_at
  FROM b GROUP BY 1),
c AS (
  SELECT *,
         CAST(sum(pos_at) OVER (ORDER BY thr DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
         CAST(sum(n_at) OVER (ORDER BY thr DESC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         CAST(sum(pos_at) OVER () AS BIGINT) AS all_pos,
         CAST(sum(n_at) OVER () AS BIGINT) AS all_n
  FROM per)
SELECT thr, n_at, pos_at, tp, cum_n - tp AS fp, all_pos - tp AS fn,
       (all_n - all_pos) - (cum_n - tp) AS tn
FROM c"""


def seq_patterns(
    df: DataFrame,
    key_col: str,
    order_col: str,
    item_col: str,
    max_gap: int = 3,
) -> DataFrame:
    """Sequential pattern counts (PrefixSpan's length-2 core, public
    literature): ordered item pairs occurring within ``max_gap`` positions
    inside a key's sequence -> (s1, s2, n_occ, n_keys).  Unlike the
    unordered PMI collocations, (s1, s2) and (s2, s1) are distinct.

    Scale shape: one rank window per key, one bounded self-join (fan-out
    <= max_gap per row — a band join on the rank), one aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(item_col).alias("it"),
    ).withColumn("rn", F.row_number().over(w))
    l, r = b.alias("l"), b.alias("r")
    joined = l.join(
        r,
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.rn") > F.col("l.rn"))
        & (F.col("r.rn") <= F.col("l.rn") + int(max_gap)),
    )
    return (
        joined.groupBy(
            F.col("l.it").alias("s1"), F.col("r.it").alias("s2")
        )
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(F.col("l.k")).alias("n_keys"),
        )
    )


def seq_patterns_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    item_col: str,
    max_gap: int = 3,
) -> str:
    """DuckDB replay of ``seq_patterns``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {item_col} AS it,
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {order_col}) AS rn
  FROM ({base_select}) s)
SELECT l.it AS s1, r.it AS s2, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT l.k) AS BIGINT) AS n_keys
FROM b l JOIN b r ON r.k = l.k AND r.rn > l.rn AND r.rn <= l.rn + {int(max_gap)}
GROUP BY 1, 2"""


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Inter-rater agreement -> one row (n, agree, pe_num): Cohen's kappa
    stays the exact rational (agree*n - pe_num) / (n*n - pe_num) with
    pe_num = sum over classes of marginal_a(c) * marginal_b(c) — all
    counts exact int64, three tiny aggregations."""
    b = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    cm = b.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ma = cm.groupBy("a").agg(F.sum("c").alias("ra"))
    mb = cm.groupBy("b").agg(F.sum("c").alias("cb"))
    pe = (
        ma.join(mb, ma["a"] == mb["b"])
        .agg(F.sum(F.col("ra") * F.col("cb")).alias("pe_num"))
    )
    tot = cm.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0)).alias("agree"),
    )
    return tot.join(pe).select(
        "n", "agree", F.coalesce("pe_num", F.lit(0)).alias("pe_num")
    )


def cohens_kappa_sql(base_select: str, a_col: str, b_col: str) -> str:
    """DuckDB replay of ``cohens_kappa``."""
    return f"""
WITH b AS (SELECT {a_col} AS a, {b_col} AS b FROM ({base_select}) s),
cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
ma AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cm GROUP BY 1),
mb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cm GROUP BY 1),
pe AS (SELECT CAST(coalesce(sum(ra * cb), 0) AS BIGINT) AS pe_num
       FROM ma JOIN mb ON mb.b = ma.a),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
        FROM cm)
SELECT tot.n, tot.agree, pe.pe_num FROM tot CROSS JOIN pe"""


def class_prf(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
) -> DataFrame:
    """Per-class precision/recall support counts -> (cls, tp, fp, fn,
    support): derived from ONE confusion aggregation (groupBy pred x
    actual), then two tiny marginal joins — precision/recall/F1 stay
    exact rationals tp/(tp+fp), tp/(tp+fn).  Classes appearing only as
    predictions report support 0 (full outer marginal join)."""
    b = df.select(F.col(pred_col).alias("p"), F.col(actual_col).alias("y"))
    cm = b.groupBy("p", "y").agg(F.count(F.lit(1)).alias("c"))
    rows = cm.groupBy(F.col("p").alias("cls")).agg(F.sum("c").alias("n_pred"))
    cols = cm.groupBy(F.col("y").alias("cls")).agg(F.sum("c").alias("support"))
    diag = (
        cm.filter(F.col("p") == F.col("y"))
        .select(F.col("p").alias("cls"), F.col("c").alias("tp"))
    )
    z = F.lit(0).cast("long")
    return (
        rows.join(cols, "cls", "full")
        .join(diag, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", z).alias("tp"),
            (F.coalesce("n_pred", z) - F.coalesce("tp", z)).alias("fp"),
            (F.coalesce("support", z) - F.coalesce("tp", z)).alias("fn"),
            F.coalesce("support", z).alias("support"),
        )
    )


def class_prf_sql(base_select: str, pred_col: str, actual_col: str) -> str:
    """DuckDB replay of ``class_prf``."""
    return f"""
WITH b AS (SELECT {pred_col} AS p, {actual_col} AS y FROM ({base_select}) s),
cm AS (SELECT p, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
r AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS n_pred FROM cm GROUP BY 1),
cc AS (SELECT y AS cls, CAST(sum(c) AS BIGINT) AS support FROM cm GROUP BY 1),
d AS (SELECT p AS cls, c AS tp FROM cm WHERE p = y)
SELECT coalesce(r.cls, cc.cls) AS cls,
       CAST(coalesce(d.tp, 0) AS BIGINT) AS tp,
       CAST(coalesce(r.n_pred, 0) - coalesce(d.tp, 0) AS BIGINT) AS fp,
       CAST(coalesce(cc.support, 0) - coalesce(d.tp, 0) AS BIGINT) AS fn,
       CAST(coalesce(cc.support, 0) AS BIGINT) AS support
FROM r FULL JOIN cc ON cc.cls = r.cls
LEFT JOIN d ON d.cls = coalesce(r.cls, cc.cls)"""


def mi_contrib_sql() -> str:
    """Shared Spark/DuckDB text: the per-cell mutual-information
    contribution quantized at 1e9 from exact int64 counts
    (n_ab, n_a, n_b, n) — p(a,b) * ln(p(a,b)/(p(a)p(b))), quantized
    PER CELL before the integer sum so the total is order-independent."""
    return (
        "CAST(floor((CAST(n_ab AS DOUBLE) / CAST(n AS DOUBLE))"
        " * ln(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
        " * 1.0e9 + 0.12345678987) AS BIGINT)"
    )


def ent_contrib_sql(cnt: str) -> str:
    """Shared text: per-value entropy contribution -p ln p quantized."""
    return (
        f"CAST(floor(-(CAST({cnt} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * ln(CAST({cnt} AS DOUBLE) / CAST(n AS DOUBLE))"
        " * 1.0e9 + 0.12345678987) AS BIGINT)"
    )


def mutual_info(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Mutual information + marginal entropies between two discrete
    columns -> one row (n, mi_q, ha_q, hb_q): all counts exact int64;
    the only FP is the shared-text ln per cell, floor-quantized BEFORE
    the order-independent integer sums (the tfidf/chi2 discipline).
    Feature-selection / redundancy scoring for training-data columns."""
    b = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    cm = b.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ma = cm.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    mb = cm.groupBy("b").agg(F.sum("n_ab").alias("n_b"))
    tot = cm.agg(F.sum("n_ab").alias("n"))
    cells = cm.join(ma, "a").join(mb, "b").join(tot)
    mi = cells.select(F.expr(mi_contrib_sql()).alias("c")).agg(
        F.sum("c").alias("mi_q")
    )
    ha = ma.join(tot).select(F.expr(ent_contrib_sql("n_a")).alias("c")).agg(
        F.sum("c").alias("ha_q")
    )
    hb = mb.join(tot).select(F.expr(ent_contrib_sql("n_b")).alias("c")).agg(
        F.sum("c").alias("hb_q")
    )
    return tot.join(mi).join(ha).join(hb).select("n", "mi_q", "ha_q", "hb_q")


def mutual_info_sql(base_select: str, a_col: str, b_col: str) -> str:
    """DuckDB replay of ``mutual_info``."""
    return f"""
WITH b AS (SELECT {a_col} AS a, {b_col} AS b FROM ({base_select}) s),
cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab FROM b GROUP BY 1, 2),
ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM cm GROUP BY 1),
mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM cm GROUP BY 1),
tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cm),
mi AS (
  SELECT CAST(sum({mi_contrib_sql()}) AS BIGINT) AS mi_q
  FROM cm JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot),
ha AS (SELECT CAST(sum({ent_contrib_sql('n_a')}) AS BIGINT) AS ha_q
       FROM ma CROSS JOIN tot),
hb AS (SELECT CAST(sum({ent_contrib_sql('n_b')}) AS BIGINT) AS hb_q
       FROM mb CROSS JOIN tot)
SELECT tot.n, mi.mi_q, ha.ha_q, hb.hb_q
FROM tot CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb"""


def cum_distinct(
    df: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
) -> DataFrame:
    """Running distinct count per key -> (k, o, v, n_distinct): how many
    distinct values the key has seen up to and including this row.  Two
    windows, no join: first-occurrence flag (rank 1 within (k, v) by
    order) then a running sum — exact int64, the vocabulary-growth /
    coverage-curve primitive."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(val_col).alias("v"),
    )
    wf = Window.partitionBy("k", "v").orderBy("o")
    run = Window.partitionBy("k").orderBy("o").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        b.withColumn(
            "__f", (F.row_number().over(wf) == 1).cast("long")
        )
        .withColumn("n_distinct", F.sum("__f").over(run))
        .select("k", "o", "v", "n_distinct")
    )


def cum_distinct_sql(
    base_select: str, key_col: str, order_col: str, val_col: str
) -> str:
    """DuckDB replay of ``cum_distinct``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {order_col} AS o, {val_col} AS v
  FROM ({base_select}) s),
f AS (
  SELECT k, o, v,
         CASE WHEN row_number() OVER (PARTITION BY k, v ORDER BY o) = 1
              THEN 1 ELSE 0 END AS ff
  FROM b)
SELECT k, o, v,
       CAST(sum(ff) OVER (PARTITION BY k ORDER BY o
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct
FROM f"""


def first_touch_attribution(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    channel_col: str,
    convert_value: str,
    gap_s: int = 1800,
) -> DataFrame:
    """First-touch conversion attribution over gap sessions ->
    (channel, n_sessions, n_converted): sessions split on gaps > gap_s
    seconds (integer epoch-second comparison), each session attributed
    to its FIRST channel (ties -> smallest id), converted iff any event
    in the session has channel == convert_value.  Exact counts; one
    keyed window pass + one aggregation."""
    from pyspark.sql import Window

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(channel_col).alias("ch"),
    )
    w = Window.partitionBy("k").orderBy("t", "i")
    prev = F.lag("t").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("t") - prev > int(gap_s)), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = b.withColumn("sess", F.sum(new_sess).over(run))
    per = s.groupBy("k", "sess").agg(
        F.min(F.struct("t", "i", "ch")).alias("first"),
        F.max((F.col("ch") == convert_value).cast("long")).alias("conv"),
    )
    return (
        per.groupBy(F.col("first.ch").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("conv").alias("n_converted"),
        )
    )


def first_touch_attribution_sql(
    base_select: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    channel_col: str,
    convert_value: str,
    gap_s: int = 1800,
) -> str:
    """DuckDB replay of ``first_touch_attribution``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {ts_col} AS t, {id_col} AS i, {channel_col} AS ch
  FROM ({base_select}) s),
g AS (
  SELECT *, CASE WHEN lag(t) OVER (PARTITION BY k ORDER BY t, i) IS NULL
                   OR t - lag(t) OVER (PARTITION BY k ORDER BY t, i)
                      > {int(gap_s)}
                 THEN 1 ELSE 0 END AS ns
  FROM b),
s AS (
  SELECT *, sum(ns) OVER (PARTITION BY k ORDER BY t, i
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM g),
r AS (
  SELECT *, row_number() OVER (PARTITION BY k, sess ORDER BY t, i) AS rn,
         max(CASE WHEN ch = '{convert_value}' THEN 1 ELSE 0 END)
           OVER (PARTITION BY k, sess) AS conv
  FROM s)
SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(conv) AS BIGINT) AS n_converted
FROM r WHERE rn = 1 GROUP BY 1"""


def rfm_scores(
    orders: DataFrame,
    cust_col: str,
    day_col: str,
    amount_col: str,
    buckets: int = 4,
) -> DataFrame:
    """RFM customer scoring -> (cust, last_day, freq, monetary, r_score,
    f_score, m_score): recency/frequency/monetary quartile labels via
    ntile over deterministic total orders (metric, customer id) — the
    ntile remainder rule agrees across engines (the window_rank gate's
    lesson).  Exact integer metrics; one aggregation + three windows."""
    from pyspark.sql import Window

    per = orders.groupBy(F.col(cust_col).alias("c")).agg(
        F.max(F.col(day_col)).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col(amount_col)).alias("monetary"),
    )
    nb = int(buckets)
    r_w = Window.orderBy(F.col("last_day").desc(), F.col("c").asc())
    f_w = Window.orderBy(F.col("freq").desc(), F.col("c").asc())
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("c").asc())
    return per.select(
        "c", "last_day", "freq", "monetary",
        F.ntile(nb).over(r_w).cast("long").alias("r_score"),
        F.ntile(nb).over(f_w).cast("long").alias("f_score"),
        F.ntile(nb).over(m_w).cast("long").alias("m_score"),
    )


def rfm_scores_sql(
    base_select: str,
    cust_col: str,
    day_col: str,
    amount_col: str,
    buckets: int = 4,
) -> str:
    """DuckDB replay of ``rfm_scores``."""
    nb = int(buckets)
    return f"""
WITH per AS (
  SELECT {cust_col} AS c, CAST(max({day_col}) AS BIGINT) AS last_day,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum({amount_col}) AS BIGINT) AS monetary
  FROM ({base_select}) s GROUP BY 1)
SELECT c, last_day, freq, monetary,
       CAST(ntile({nb}) OVER (ORDER BY last_day DESC, c ASC) AS BIGINT) AS r_score,
       CAST(ntile({nb}) OVER (ORDER BY freq DESC, c ASC) AS BIGINT) AS f_score,
       CAST(ntile({nb}) OVER (ORDER BY monetary DESC, c ASC) AS BIGINT) AS m_score
FROM per"""


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC as a rational: AUC = num2 / den2 with
    num2 = 2*concordant + ties (a positive above a negative counts 2,
    a score tie counts 1) and den2 = 2 * P * N — the Mann-Whitney U
    identity (public literature), so values are exact int64 and no pair
    is ever materialized.

    Plan: one groupBy collapse to per-score (n_pos, n_neg), a window
    cumsum over the TINY distinct-score table, one final agg."""
    from pyspark.sql import Window

    per = (
        df.select(F.col(score_col).alias("s"), F.col(label_col).alias("y"))
        .groupBy("s")
        .agg(
            F.sum("y").alias("np"),
            (F.count(F.lit(1)) - F.sum("y")).alias("nn"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    sc = per.withColumn("cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    return sc.agg(
        F.sum("np").alias("pos"),
        F.sum("nn").alias("neg"),
        F.sum(F.col("np") * (2 * F.col("cum_nn") + F.col("nn"))).alias("num2"),
        (2 * F.sum("np") * F.sum("nn")).alias("den2"),
    )


def auc_exact_sql(base_select: str, score_col: str, label_col: str) -> str:
    """DuckDB replay of ``auc_exact``; ``base_select`` -> (score, label)."""
    return f"""
WITH per AS (
  SELECT {score_col} AS s, CAST(sum({label_col}) AS BIGINT) AS np,
         CAST(count(*) - sum({label_col}) AS BIGINT) AS nn
  FROM ({base_select}) b GROUP BY 1),
sc AS (
  SELECT np, nn,
         coalesce(sum(nn) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
  FROM per)
SELECT CAST(sum(np) AS BIGINT) AS pos, CAST(sum(nn) AS BIGINT) AS neg,
       CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS num2,
       CAST(2 * sum(np) * sum(nn) AS BIGINT) AS den2
FROM sc"""


def ranking_metrics(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tie_col: str,
    rel_col: str,
    k: int = 5,
    q: int = 1 << 20,
) -> DataFrame:
    """Per-key ranking quality: rank items by ``order_col`` DESC (ties by
    ``tie_col`` ASC), then
      first_rank — rank of the first relevant item (NULL if none),
      mrr_q      — floor(q / first_rank), the integer-quantized
                   reciprocal rank (0 if none),
      p_at_k     — relevant items in the top k.
    The MRR/P@k evaluation stage of a retrieval pipeline, exact int64
    (reciprocals via integer division at q = 2^20)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col(tie_col).asc()
    )
    r = df.withColumn("rnk", F.row_number().over(w))
    return r.groupBy(F.col(key_col).alias("k")).agg(
        F.min(F.when(F.col(rel_col) == 1, F.col("rnk"))).alias("first_rank"),
        F.coalesce(
            F.expr(
                f"CAST({int(q)} DIV min(CASE WHEN {rel_col} = 1 "
                "THEN rnk END) AS BIGINT)"
            ),
            F.lit(0).cast("long"),
        ).alias("mrr_q"),
        F.sum(
            F.when((F.col("rnk") <= k) & (F.col(rel_col) == 1), 1).otherwise(0)
        ).alias("p_at_k"),
    )


def ranking_metrics_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    tie_col: str,
    rel_col: str,
    k: int = 5,
    q: int = 1 << 20,
) -> str:
    """DuckDB replay of ``ranking_metrics``."""
    return f"""
WITH r AS (
  SELECT {key_col} AS k, {rel_col} AS rel,
         row_number() OVER (PARTITION BY {key_col}
           ORDER BY {order_col} DESC, {tie_col} ASC) AS rnk
  FROM ({base_select}) b)
SELECT k,
       CAST(min(CASE WHEN rel = 1 THEN rnk END) AS BIGINT) AS first_rank,
       CAST(coalesce({int(q)} // min(CASE WHEN rel = 1 THEN rnk END), 0)
            AS BIGINT) AS mrr_q,
       CAST(sum(CASE WHEN rnk <= {int(k)} AND rel = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS p_at_k
FROM r GROUP BY 1"""


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int,
    score_max: int,
) -> DataFrame:
    """Reliability-diagram bins: integer scores in [0, score_max) mapped
    to ``n_bins`` equal-width bins; per bin the count, positive count and
    score sum — everything the calibration curve / ECE needs, as exact
    int64 partial aggregates (map-side combined, one shuffle)."""
    b = F.least(
        F.expr(
            f"CAST((({score_col}) * {int(n_bins)}) DIV {int(score_max)} "
            "AS BIGINT)"
        ),
        F.lit(n_bins - 1).cast("long"),
    )
    return (
        df.select(
            b.alias("bin"),
            F.col(label_col).alias("y"),
            F.col(score_col).alias("s"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("s").alias("s_sum"),
        )
    )


def calibration_bins_sql(
    base_select: str,
    score_col: str,
    label_col: str,
    n_bins: int,
    score_max: int,
) -> str:
    """DuckDB replay of ``calibration_bins``."""
    return f"""
SELECT LEAST(CAST((({score_col}) * {int(n_bins)}) // {int(score_max)}
             AS BIGINT), {int(n_bins) - 1}) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({label_col}) AS BIGINT) AS n_pos,
       CAST(sum({score_col}) AS BIGINT) AS s_sum
FROM ({base_select}) b GROUP BY 1"""


def ks_stat(df: DataFrame, score_col: str, group_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic via cross
    multiplication: with cumulative counts C1(s), C2(s) at each distinct
    score, D = max |C1/n1 - C2/n2| = max |n2*C1 - n1*C2| / (n1*n2) — the
    numerator is exact int64, so the argmax score (ties -> smallest) and
    d_num are bit-exact; d = d_num / (n1 * n2) derivable.
    ``group_col`` must be 0/1.

    Shape: one per-score collapse (map-side combined) + a window cumsum
    over the tiny distinct-score table + one pick."""
    from pyspark.sql import Window

    per = (
        df.select(F.col(score_col).alias("s"), F.col(group_col).alias("g"))
        .groupBy("s")
        .agg(
            F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("c2"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # totals ride the same tiny single-partition window as the cumsum —
    # no join of any kind in the plan
    d = per.select(
        "s",
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
        F.abs(
            F.sum("c2").over(w_all) * F.sum("c1").over(w)
            - F.sum("c1").over(w_all) * F.sum("c2").over(w)
        ).alias("d_num"),
    )
    pick = Window.orderBy(F.col("d_num").desc(), F.col("s").asc())
    return (
        d.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("n1", "n2", "d_num", F.col("s").alias("at_s"))
    )


def ks_stat_sql(base_select: str, score_col: str, group_col: str) -> str:
    """DuckDB replay of ``ks_stat``; ``base_select`` -> (score, group)."""
    return f"""
WITH per AS (
  SELECT {score_col} AS s,
         CAST(sum(CASE WHEN {group_col} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1,
         CAST(sum(CASE WHEN {group_col} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c2
  FROM ({base_select}) b GROUP BY 1),
cum AS (
  SELECT s,
         sum(c1) OVER (ORDER BY s) AS k1,
         sum(c2) OVER (ORDER BY s) AS k2
  FROM per),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2 FROM per),
d AS (
  SELECT s, n1, n2, abs(n2 * k1 - n1 * k2) AS d_num
  FROM cum CROSS JOIN tot)
SELECT n1, n2, CAST(d_num AS BIGINT) AS d_num, s AS at_s
FROM d ORDER BY d_num DESC, s ASC LIMIT 1"""


def mcc_counts(df: DataFrame, pred_col: str, label_col: str) -> DataFrame:
    """Binary confusion counts + the exact Matthews-correlation numerator
    -> one row (tp, fp, fn, tn, num): num = tp*tn - fp*fn is exact int64
    (counts to ~3e9 rows before the product risks overflow); the caller
    derives MCC = num / sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn)) — only the
    final sqrt is FP, so two runs can be compared on integers alone.
    Both columns must be 0/1.

    Shape: ONE map-side-combined aggregation over the scan; no shuffle of
    data rows (the four conditional sums ride the same partial agg).
    Reference parity: the confusion/kappa family of quality metrics
    (see class_prf / cohen_kappa above)."""
    b = df.select(F.col(pred_col).alias("p"), F.col(label_col).alias("y"))
    c = lambda pp, yy: F.sum(  # noqa: E731
        ((F.col("p") == pp) & (F.col("y") == yy)).cast("long")
    )
    return b.agg(
        c(1, 1).alias("tp"), c(1, 0).alias("fp"),
        c(0, 1).alias("fn"), c(0, 0).alias("tn"),
    ).select(
        "tp", "fp", "fn", "tn",
        (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")).alias("num"),
    )


def mcc_counts_sql(base_select: str, pred_col: str, label_col: str) -> str:
    """DuckDB replay of ``mcc_counts``; ``base_select`` -> (pred, label)."""
    return f"""
WITH b AS (SELECT {pred_col} AS p, {label_col} AS y FROM ({base_select}) s),
c AS (
  SELECT CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM b)
SELECT tp, fp, fn, tn, CAST(tp * tn - fp * fn AS BIGINT) AS num FROM c"""


def brier_sum(df: DataFrame, prob_q_col: str, label_col: str,
              scale: int = 1_000_000) -> DataFrame:
    """Exact Brier-score accumulator -> one row (n, sq_sum): with the
    predicted probability pre-quantized to an integer p_q in [0, scale],
    each row contributes (p_q - y*scale)^2 <= scale^2 exactly, so sq_sum
    is an order-independent int64 sum and brier = sq_sum / (n * scale^2)
    is derivable.  At scale=1e6 the sum overflows int64 past ~9e6 rows
    per 1.0-error row worst-case * 1e12 — callers at 100 TB shard the
    accumulator (group by a split key and combine), same discipline as
    the other exact moments here.

    Shape: one map-side-combined aggregation, no shuffle of data rows."""
    b = df.select(
        F.col(prob_q_col).cast("long").alias("pq"),
        F.col(label_col).cast("long").alias("y"),
    )
    d = F.col("pq") - F.col("y") * F.lit(int(scale))
    return b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d * d).alias("sq_sum"),
    )


def brier_sum_sql(base_select: str, prob_q_col: str, label_col: str,
                  scale: int = 1_000_000) -> str:
    """DuckDB replay of ``brier_sum``; ``base_select`` -> (p_q, label)."""
    return f"""
WITH b AS (SELECT CAST({prob_q_col} AS BIGINT) AS pq,
                  CAST({label_col} AS BIGINT) AS y
           FROM ({base_select}) s)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum((pq - y * {int(scale)}) * (pq - y * {int(scale)}))
            AS BIGINT) AS sq_sum
FROM b"""


def _ndcg_discount_lut(k: int, scale: int = 10**12) -> list[int]:
    """floor(scale / log2(rank+1)) for rank 1..k — literal integers, so
    the engine and the oracle share the EXACT same discount table and the
    per-query DCG sums are pure int64."""
    import math as _math

    return [int(scale // 1) if r == 1 else int(_math.floor(scale / _math.log2(r + 1)))
            for r in range(1, k + 1)]


def ndcg_at_k(df: DataFrame, query_col: str, item_col: str, score_col: str,
              rel_col: str, k: int = 10) -> DataFrame:
    """Exact-integer NDCG@k accumulators per query -> (q, dcg_q, idcg_q):
    dcg_q = sum over the top-k by (score DESC, item ASC) of
    rel * D[rank], idcg_q the same over the ideal ordering
    (rel DESC, item ASC), with D[rank] = floor(1e12 / log2(rank+1))
    a shared literal LUT — both sums are int64, ndcg = dcg_q/idcg_q
    derivable, ties broken totally so two runs are bit-identical.
    Relevance must be a small non-negative integer grade.

    Shape: one shuffle on the query key; two rank windows per query
    partition (no global window)."""
    from pyspark.sql import Window

    lut = _ndcg_discount_lut(k)
    b = df.select(
        F.col(query_col).alias("q"), F.col(item_col).alias("i"),
        F.col(score_col).alias("s"), F.col(rel_col).cast("long").alias("rel"),
    )
    w_run = Window.partitionBy("q").orderBy(F.col("s").desc(), F.col("i").asc())
    w_ideal = Window.partitionBy("q").orderBy(
        F.col("rel").desc(), F.col("i").asc()
    )
    disc = lambda rk: F.element_at(  # noqa: E731
        F.array(*[F.lit(d) for d in lut]), rk
    )
    r = b.select(
        "q", "rel",
        F.row_number().over(w_run).alias("rk_run"),
        F.row_number().over(w_ideal).alias("rk_ideal"),
    )
    return r.groupBy("q").agg(
        F.sum(
            F.when(F.col("rk_run") <= k, F.col("rel") * disc(F.col("rk_run")))
            .otherwise(F.lit(0))
        ).alias("dcg_q"),
        F.sum(
            F.when(F.col("rk_ideal") <= k,
                   F.col("rel") * disc(F.col("rk_ideal")))
            .otherwise(F.lit(0))
        ).alias("idcg_q"),
    )


def ndcg_at_k_sql(base_select: str, query_col: str, item_col: str,
                  score_col: str, rel_col: str, k: int = 10) -> str:
    """DuckDB replay of ``ndcg_at_k`` with the identical literal LUT."""
    lut = _ndcg_discount_lut(k)
    lut_list = ", ".join(str(d) for d in lut)
    return f"""
WITH b AS (SELECT {query_col} AS q, {item_col} AS i, {score_col} AS s,
                  CAST({rel_col} AS BIGINT) AS rel
           FROM ({base_select}) src),
r AS (
  SELECT q, rel,
         row_number() OVER (PARTITION BY q ORDER BY s DESC, i ASC) AS rk_run,
         row_number() OVER (PARTITION BY q ORDER BY rel DESC, i ASC)
           AS rk_ideal
  FROM b)
SELECT q,
       CAST(sum(CASE WHEN rk_run <= {k}
                THEN rel * ([{lut_list}])[rk_run] ELSE 0 END) AS BIGINT)
         AS dcg_q,
       CAST(sum(CASE WHEN rk_ideal <= {k}
                THEN rel * ([{lut_list}])[rk_ideal] ELSE 0 END) AS BIGINT)
         AS idcg_q
FROM r GROUP BY q"""


def lift_table(df: DataFrame, score_col: str, label_col: str,
               id_col: str, n_buckets: int = 10) -> DataFrame:
    """Decile gains/lift table -> (bucket, n, positives): rows ranked by
    (score DESC, id ASC) — a total order, so bucket membership is exact —
    and bucket = floor((rank-1) * n_buckets / n_total) via integer
    arithmetic (NO ntile: its remainder-distribution rule is
    implementation-defined across engines, the floor formula is not).
    Cumulative gain/lift per decile derivable as exact rationals.

    Shape: one global rank window over (score, id) — the one unavoidable
    total-order pass, same as the other exact rank statistics here — then
    a map-side-combined bucket agg."""
    from pyspark.sql import Window

    b = df.select(
        F.col(score_col).alias("s"), F.col(label_col).cast("long").alias("y"),
        F.col(id_col).alias("i"),
    )
    w = Window.orderBy(F.col("s").desc(), F.col("i").asc())
    w_all = Window.orderBy(F.col("s").desc(), F.col("i").asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # explicit floor: Spark's cast(double->long) truncates but DuckDB's
    # CAST rounds half-even — floor() agrees in both (the products stay
    # <= ~2^53 so the double division is exact before the floor)
    r = b.select(
        "y",
        F.floor(
            (F.row_number().over(w) - 1) * n_buckets
            / F.count(F.lit(1)).over(w_all)
        ).cast("long").alias("bucket"),
    )
    return r.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("positives")
    )


def lift_table_sql(base_select: str, score_col: str, label_col: str,
                   id_col: str, n_buckets: int = 10) -> str:
    """DuckDB replay of ``lift_table`` (same floor-bucket formula)."""
    return f"""
WITH b AS (SELECT {score_col} AS s, CAST({label_col} AS BIGINT) AS y,
                  {id_col} AS i FROM ({base_select}) src),
r AS (
  SELECT y,
         CAST(floor((((row_number() OVER (ORDER BY s DESC, i ASC)) - 1)
              * {n_buckets}) / count(*) OVER ()) AS BIGINT) AS bucket
  FROM b)
SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS positives
FROM r GROUP BY bucket"""


def psi_contrib_sql() -> str:
    """Shared Spark/DuckDB text: one bucket's Population Stability Index
    term (pa - pb) * ln(pa/pb) from exact int64 counts (na_i, nb_i, na,
    nb), floor-quantized at 1e9 with the irrational offset BEFORE the
    order-independent integer sum (the mi_contrib discipline)."""
    return (
        "CAST(floor((CAST(na_i AS DOUBLE) / CAST(na AS DOUBLE)"
        " - CAST(nb_i AS DOUBLE) / CAST(nb AS DOUBLE))"
        " * ln(CAST(na_i AS DOUBLE) * CAST(nb AS DOUBLE)"
        " / (CAST(nb_i AS DOUBLE) * CAST(na AS DOUBLE)))"
        " * 1.0e9 + 0.12345678987) AS BIGINT)"
    )


def population_stability(
    df: DataFrame,
    bucket_col: str,
    epoch_col: str,
) -> DataFrame:
    """Population Stability Index accumulators between two epochs ->
    (bucket, na_i, nb_i, psi_q): the drift audit a training pipeline
    runs between snapshots; psi = sum(psi_q)/1e9 derivable, buckets
    reported individually so the drifting ones are identifiable.
    ``epoch_col`` must be 0 (baseline) / 1 (current); buckets missing
    from EITHER epoch are excluded (standard PSI is undefined there —
    callers smooth upstream if needed) but still listed with psi_q NULL.

    Shape: ONE map-side-combined (bucket x epoch) count agg; totals ride
    a single-partition window over the tiny bucket table (no join)."""
    from pyspark.sql import Window

    b = df.select(
        F.col(bucket_col).alias("bucket"),
        F.col(epoch_col).cast("long").alias("ep"),
    )
    per = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("ep") == 0, 1).otherwise(0)).alias("na_i"),
        F.sum(F.when(F.col("ep") == 1, 1).otherwise(0)).alias("nb_i"),
    )
    w_all = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = per.select(
        "bucket", "na_i", "nb_i",
        F.sum("na_i").over(w_all).alias("na"),
        F.sum("nb_i").over(w_all).alias("nb"),
    )
    return t.select(
        "bucket", "na_i", "nb_i",
        F.when(
            (F.col("na_i") > 0) & (F.col("nb_i") > 0),
            F.expr(psi_contrib_sql()),
        ).alias("psi_q"),
    )


def population_stability_sql(base_select: str, bucket_col: str,
                             epoch_col: str) -> str:
    """DuckDB replay of ``population_stability``;
    ``base_select`` -> (bucket, epoch)."""
    return f"""
WITH b AS (SELECT {bucket_col} AS bucket, CAST({epoch_col} AS BIGINT) AS ep
           FROM ({base_select}) s),
per AS (
  SELECT bucket,
         CAST(sum(CASE WHEN ep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na_i,
         CAST(sum(CASE WHEN ep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb_i
  FROM b GROUP BY 1),
t AS (
  SELECT bucket, na_i, nb_i,
         sum(na_i) OVER () AS na, sum(nb_i) OVER () AS nb
  FROM per)
SELECT bucket, na_i, nb_i,
       CASE WHEN na_i > 0 AND nb_i > 0 THEN {psi_contrib_sql()}
            ELSE NULL END AS psi_q
FROM t"""


def jenks_dp(bins, weights, k):
    """Exact DP for optimal 1-D class breaks over a weighted histogram
    (the Fisher 1958 / Jenks 1967 natural-breaks family, public
    literature) under the integer criterion cost(segment) = N*sum(x^2) -
    (sum(x))^2 (the N^2-scaled within-class variance, so everything
    stays int64).  Returns (costs, breaks): costs[c-1] = optimal total
    for c classes (c = 1..k), breaks = for k classes the list of k upper
    BIN VALUES (smallest-index argmin on ties).  O(k * m^2) over m
    distinct bins — run on a COLLECTED histogram (<= 256 rows), never on
    raw data."""
    import numpy as np

    b = np.asarray(bins, dtype=np.int64)
    n = np.asarray(weights, dtype=np.int64)
    order = np.argsort(b)
    b, n = b[order], n[order]
    m = len(b)
    if not (1 <= k <= m):
        raise ValueError("need 1 <= k <= number of distinct bins")
    CN = np.concatenate([[0], np.cumsum(n)])
    CX = np.concatenate([[0], np.cumsum(n * b)])
    CXX = np.concatenate([[0], np.cumsum(n * b * b)])

    def cost(i, j):  # bins i..j, 1-based inclusive
        N = CN[j] - CN[i - 1]
        sx = CX[j] - CX[i - 1]
        sxx = CXX[j] - CXX[i - 1]
        return int(N * sxx - sx * sx)

    INF = 4 * 10 ** 17
    D = np.full((k + 1, m + 1), INF, dtype=np.int64)
    arg = np.zeros((k + 1, m + 1), dtype=np.int64)
    for j in range(1, m + 1):
        D[1][j] = cost(1, j)
    for c in range(2, k + 1):
        for j in range(c, m + 1):
            best, bi = INF, -1
            for i in range(c - 1, j):
                v = D[c - 1][i] + cost(i + 1, j)
                if v < best:
                    best, bi = v, i
            D[c][j] = best
            arg[c][j] = bi
    breaks = []
    j = m
    for c in range(k, 0, -1):
        breaks.append(int(b[j - 1]))
        j = int(arg[c][j])
    breaks.reverse()
    costs = [int(D[c][m]) for c in range(1, k + 1)]
    return costs, breaks


def jenks_costs(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Distributed optimal-class-breaks costs: ONE map-side-combined
    histogram collapses the input to <= #distinct-values rows (the
    stretch/hist_eq plan-input pattern), the exact integer DP runs on
    the collected histogram, and the (c, cost) table returns as a plan
    literal.  Output: one row per class count c = 1..k."""
    hist = (
        df.groupBy(F.col(value_col).cast("long").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded by value cardinality: plan input
    )
    costs, _breaks = jenks_dp(
        [r["b"] for r in hist], [r["n"] for r in hist], k
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(c + 1, costs[c]) for c in range(k)], "c long, cost long"
    )


def jenks_costs_sql(base_select: str, value_expr: str, k: int) -> str:
    """DuckDB replay of ``jenks_costs``: the same DP as a recursive CTE
    carrying the row D[c][1..m] as a LIST (the seam-cost pattern)."""
    return f"""
WITH RECURSIVE hist AS (
  SELECT CAST({value_expr} AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS n
  FROM ({base_select}) src GROUP BY 1),
ord AS (SELECT b, n, row_number() OVER (ORDER BY b) AS rn FROM hist),
cum AS (
  SELECT list_prepend(CAST(0 AS BIGINT), list(cn ORDER BY rn)) AS CN,
         list_prepend(CAST(0 AS BIGINT), list(cx ORDER BY rn)) AS CX,
         list_prepend(CAST(0 AS BIGINT), list(cxx ORDER BY rn)) AS CXX,
         max(rn) AS m
  FROM (
    SELECT rn,
           CAST(sum(n) OVER w AS BIGINT) AS cn,
           CAST(sum(n * b) OVER w AS BIGINT) AS cx,
           CAST(sum(n * b * b) OVER w AS BIGINT) AS cxx
    FROM ord WINDOW w AS (ORDER BY rn)) t),
dp(c, row) AS (
  SELECT 1, list_transform(range(1, m + 1), j ->
           (CN[j + 1] - CN[1]) * (CXX[j + 1] - CXX[1])
           - (CX[j + 1] - CX[1]) * (CX[j + 1] - CX[1]))
  FROM cum
  UNION ALL
  SELECT c + 1, list_transform(range(1, m + 1), j ->
           CASE WHEN j <= c THEN CAST(400000000000000000 AS BIGINT) ELSE
             list_min(list_transform(range(c, j), i ->
               row[i] + (CN[j + 1] - CN[i + 1]) * (CXX[j + 1] - CXX[i + 1])
               - (CX[j + 1] - CX[i + 1]) * (CX[j + 1] - CX[i + 1])))
           END)
  FROM dp, cum WHERE c < {k})
SELECT CAST(c AS BIGINT) AS c,
       CAST(row[(SELECT m FROM cum) + 0] AS BIGINT) AS cost
FROM dp ORDER BY c"""


def _cramer3(n, s1, s2, sy, s11, s12, s22, s1y, s2y):
    """Shared 3x3 Cramer expansion for the normal equations of
    y ~ b0 + b1*x1 + b2*x2 (textbook least squares, Cramer's rule).
    Args are SQL/Column expression STRINGS; returns (det, n0, n1, n2)
    strings with b_i = n_i / det — one expression text both engines
    evaluate, so the int64 arithmetic agrees term for term."""
    det = (f"({n} * ({s11} * {s22} - {s12} * {s12}) "
           f"- {s1} * ({s1} * {s22} - {s12} * {s2}) "
           f"+ {s2} * ({s1} * {s12} - {s11} * {s2}))")
    n0 = (f"({sy} * ({s11} * {s22} - {s12} * {s12}) "
          f"- {s1} * ({s1y} * {s22} - {s12} * {s2y}) "
          f"+ {s2} * ({s1y} * {s12} - {s11} * {s2y}))")
    n1 = (f"({n} * ({s1y} * {s22} - {s12} * {s2y}) "
          f"- {sy} * ({s1} * {s22} - {s12} * {s2}) "
          f"+ {s2} * ({s1} * {s2y} - {s1y} * {s2}))")
    n2 = (f"({n} * ({s11} * {s2y} - {s1y} * {s12}) "
          f"- {s1} * ({s1} * {s2y} - {s1y} * {s2}) "
          f"+ {sy} * ({s1} * {s12} - {s11} * {s2}))")
    return det, n0, n1, n2


def ols_multi(df: DataFrame, x1_col: str, x2_col: str, y_col: str) -> DataFrame:
    """Exact multivariate least squares y ~ b0 + b1*x1 + b2*x2 over
    integer columns -> ONE row (n, det, num0, num1, num2) with
    b_i = num_i / det, every quantity an exact int64 (caller keeps input
    magnitudes small enough that the 3x3 determinants fit — bound ~
    max|x|^2 * max|y| * n^2 per term).

    Scale shape: the nine moments are ONE map-side-combined aggregation
    (the tree-aggregate pattern); the Cramer solve is a codegen select
    over that single row — no driver math, no iteration, no second pass.
    This is the textbook distributed normal-equations fit."""
    b = df.select(
        F.col(x1_col).cast("long").alias("x1"),
        F.col(x2_col).cast("long").alias("x2"),
        F.col(y_col).cast("long").alias("y"),
    )
    agg = b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    det, n0, n1, n2 = _cramer3(
        "n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"
    )
    return agg.selectExpr(
        "n", f"{det} AS det", f"{n0} AS num0", f"{n1} AS num1", f"{n2} AS num2"
    )


def ols_multi_sql(base_select: str, x1_col: str, x2_col: str, y_col: str) -> str:
    """DuckDB replay of ``ols_multi``; sums CAST to BIGINT before the
    determinant arithmetic so both engines multiply int64, not HUGEINT."""
    det, n0, n1, n2 = _cramer3(
        "n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y"
    )
    return f"""
WITH b AS (
  SELECT CAST({x1_col} AS BIGINT) AS x1, CAST({x2_col} AS BIGINT) AS x2,
         CAST({y_col} AS BIGINT) AS y
  FROM ({base_select}) s),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM b)
SELECT n, {det} AS det, {n0} AS num0, {n1} AS num1, {n2} AS num2 FROM agg"""


def dissolve_rect_area(rects: DataFrame, g_col: str = "g") -> DataFrame:
    """Exact union area per group of axis-aligned integer rectangles (the
    GIS dissolve, rectangle case — no FP geometry needed): classic strip
    decomposition — per group, the distinct x boundaries cut strips; a
    rectangle covers a strip iff it spans it; per strip the covered
    y-length is an interval union (the running-max-end window trick);
    area = sum of strip_width * covered.

    Shape: one distinct + one lead window for strips, one per-group
    rect x strip join (cost = per-group rects * strips, quadratic in the
    GROUP size only — groups parallelize), two window passes for the
    interval union — no geometry UDF, everything codegen int64."""
    from pyspark.sql import Window

    r = rects.select(
        F.col(g_col).alias("g"),
        F.col("xmin").cast("long"), F.col("xmax").cast("long"),
        F.col("ymin").cast("long"), F.col("ymax").cast("long"),
    )
    xs = (
        r.select("g", F.col("xmin").alias("x"))
        .union(r.select("g", F.col("xmax")))
        .distinct()
    )
    wx = Window.partitionBy("g").orderBy("x")
    strips = (
        xs.withColumn("x1", F.lead("x").over(wx))
        .filter(F.col("x1").isNotNull())
        .select("g", F.col("x").alias("x0"), "x1")
    )
    cov = r.join(strips, "g").filter(
        (F.col("xmin") <= F.col("x0")) & (F.col("xmax") >= F.col("x1"))
    ).select("g", "x0", "x1", "ymin", "ymax")
    wy = Window.partitionBy("g", "x0").orderBy("ymin", "ymax")
    prev_max = F.max("ymax").over(wy.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(prev_max.isNull() | (F.col("ymin") > prev_max), 1).otherwise(0)
    run = wy.rowsBetween(Window.unboundedPreceding, 0)
    merged = (
        cov.withColumn("iv", F.sum(flag).over(run))
        .groupBy("g", "x0", "x1", "iv")
        .agg(F.min("ymin").alias("s"), F.max("ymax").alias("e"))
    )
    return (
        merged.groupBy("g")
        .agg(F.sum((F.col("x1") - F.col("x0")) * (F.col("e") - F.col("s")))
             .alias("area"))
    )


def dissolve_rect_area_sql(base_select: str) -> str:
    """DuckDB replay of ``dissolve_rect_area``; ``base_select`` -> (g,
    xmin, xmax, ymin, ymax)."""
    return f"""
WITH r AS (
  SELECT g, CAST(xmin AS BIGINT) AS xmin, CAST(xmax AS BIGINT) AS xmax,
         CAST(ymin AS BIGINT) AS ymin, CAST(ymax AS BIGINT) AS ymax
  FROM ({base_select}) s),
xs AS (
  SELECT DISTINCT g, x FROM (
    SELECT g, xmin AS x FROM r UNION ALL SELECT g, xmax FROM r) u),
strips AS (
  SELECT g, x AS x0, lead(x) OVER (PARTITION BY g ORDER BY x) AS x1
  FROM xs QUALIFY x1 IS NOT NULL),
cov AS (
  SELECT r.g, s.x0, s.x1, r.ymin, r.ymax
  FROM r JOIN strips s ON s.g = r.g
  WHERE r.xmin <= s.x0 AND r.xmax >= s.x1),
iv AS (
  SELECT *, sum(CASE WHEN pm IS NULL OR ymin > pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY g, x0 ORDER BY ymin, ymax
                    ROWS UNBOUNDED PRECEDING) AS iv
  FROM (
    SELECT *, max(ymax) OVER (PARTITION BY g, x0 ORDER BY ymin, ymax
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
    FROM cov) t),
merged AS (
  SELECT g, x0, x1, iv, min(ymin) AS s, max(ymax) AS e
  FROM iv GROUP BY 1, 2, 3, 4)
SELECT g, CAST(sum((x1 - x0) * (e - s)) AS BIGINT) AS area
FROM merged GROUP BY 1"""


def ransac_line(
    points: DataFrame,
    n_models: int = 24,
    eps: int = 8,
    salt: str = "ransac",
) -> DataFrame:
    """Derandomized RANSAC line fitting (Fischler & Bolles 1981, public
    literature) -> one row per non-degenerate candidate model
    (k, x1, y1, x2, y2, n_inliers): model k samples the two points
    minimizing md5-hash h(k:a:id) / h(k:b:id) (a pure function of (k,
    role, id), so reruns and the SQL oracle sample identical models),
    and counts inliers with the all-integer perpendicular test

        ((x2-x1)(y1-y) - (x1-x)(y2-y1))^2  <=  eps^2 * ((x2-x1)^2 + (y2-y1)^2)

    — exact int64 as long as |coord| <= ~2^15 and eps*|coord| <= ~2^31
    (no sqrt, no doubles).  The consensus argmax is max(n_inliers),
    ties -> smallest k, derivable from the emitted table.

    Shape: model seeding is one points x K map + two K-partition window
    argmins; counting is one broadcast(K rows) join + one partial-agg
    count — no point-point self-join, driver never sees a point."""
    from pyspark.sql import Window

    from .sampling import hash_u60

    spark = points.sparkSession
    p = points.select("id", "x", "y")
    models = spark.range(int(n_models)).select(F.col("id").alias("k"))
    roles = spark.createDataFrame([("a",), ("b",)], "role string")
    ext = p.crossJoin(F.broadcast(models)).crossJoin(F.broadcast(roles))
    key = F.concat_ws(
        ":", F.col("k"), F.col("role"), F.col("id")
    )
    w = Window.partitionBy("k", "role").orderBy("h", "id")
    picked = (
        ext.withColumn("h", hash_u60(key, salt))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    m = (
        picked.groupBy("k")
        .agg(
            F.max(F.when(F.col("role") == "a", F.col("x"))).alias("x1"),
            F.max(F.when(F.col("role") == "a", F.col("y"))).alias("y1"),
            F.max(F.when(F.col("role") == "b", F.col("x"))).alias("x2"),
            F.max(F.when(F.col("role") == "b", F.col("y"))).alias("y2"),
        )
        .filter((F.col("x1") != F.col("x2")) | (F.col("y1") != F.col("y2")))
    )
    cross = (
        (F.col("x2") - F.col("x1")) * (F.col("y1") - F.col("y"))
        - (F.col("x1") - F.col("x")) * (F.col("y2") - F.col("y1"))
    )
    len2 = (
        (F.col("x2") - F.col("x1")) * (F.col("x2") - F.col("x1"))
        + (F.col("y2") - F.col("y1")) * (F.col("y2") - F.col("y1"))
    )
    return (
        p.crossJoin(F.broadcast(m))
        .withColumn(
            "inl",
            F.when(cross * cross <= int(eps) * int(eps) * len2, 1)
            .otherwise(0).cast("long"),
        )
        .groupBy("k", "x1", "y1", "x2", "y2")
        .agg(F.sum("inl").alias("n_inliers"))
        .select("k", "x1", "y1", "x2", "y2", "n_inliers")
    )


def ransac_line_sql(
    points_select: str,
    n_models: int = 24,
    eps: int = 8,
    salt: str = "ransac",
) -> str:
    """DuckDB replay of ``ransac_line``; ``points_select`` -> (id, x, y)."""
    from .sampling import hash_u60_sql

    key = "CAST(k AS VARCHAR) || ':' || role || ':' || CAST(id AS VARCHAR)"
    return f"""
WITH p AS MATERIALIZED (SELECT id, x, y FROM ({points_select}) s),
models AS (SELECT unnest(range(0, {int(n_models)})) AS k),
roles AS (SELECT unnest(['a', 'b']) AS role),
picked AS (
  SELECT k, role, x, y FROM (
    SELECT k, role, x, y,
           row_number() OVER (
             PARTITION BY k, role
             ORDER BY {hash_u60_sql(key, salt)}, id) AS rn
    FROM p, models, roles) t WHERE rn = 1),
m AS (
  SELECT k,
         max(CASE WHEN role = 'a' THEN x END) AS x1,
         max(CASE WHEN role = 'a' THEN y END) AS y1,
         max(CASE WHEN role = 'b' THEN x END) AS x2,
         max(CASE WHEN role = 'b' THEN y END) AS y2
  FROM picked GROUP BY 1),
msel AS (SELECT * FROM m WHERE x1 != x2 OR y1 != y2)
SELECT k, x1, y1, x2, y2,
       CAST(sum(CASE WHEN
         ((x2 - x1) * (y1 - y) - (x1 - x) * (y2 - y1))
         * ((x2 - x1) * (y1 - y) - (x1 - x) * (y2 - y1))
         <= {int(eps) * int(eps)} * ((x2 - x1) * (x2 - x1)
                                     + (y2 - y1) * (y2 - y1))
         THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
FROM p, msel GROUP BY 1, 2, 3, 4, 5"""


def anova_f(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: int = 1024,
) -> DataFrame:
    """One-way ANOVA in exact integer arithmetic -> one row
    (k, n, ssb_q, ssw_q, f_num, f_den): the between/within decomposition

        SSB = sum_g S_g^2/n_g - S^2/N        SSW = sum v^2 - sum_g S_g^2/n_g

    with every per-group division q-quantized by floor BEFORE the
    order-independent sum (the per-group floordiv is part of the
    semantics, so both engines agree bit-for-bit), and the F statistic
    as the exact rational f_num/f_den = (SSB_q*(N-k)) / (SSW_q*(k-1)).
    ONE map-side-combinable agg + one tiny per-group pass — the
    distributed group-difference test.  Contract: values >= 0 (Spark
    div == DuckDB // on non-negatives) and q*S_g^2 in int64."""
    v = F.col(value_col).cast("long")
    g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(v).alias("sg"),
        F.sum(v * v).alias("ssg"),
    )
    per = g.select(
        "ng", "sg", "ssg",
        F.expr(f"({q} * sg * sg) div ng").alias("bq"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("ssg").alias("ss"),
        F.sum("bq").alias("bsum"),
    )
    return tot.select(
        "k", "n",
        (F.col("bsum") - F.expr(f"({q} * s * s) div n")).alias("ssb_q"),
        (F.lit(q) * F.col("ss") - F.col("bsum")).alias("ssw_q"),
        ((F.col("bsum") - F.expr(f"({q} * s * s) div n"))
         * (F.col("n") - F.col("k"))).alias("f_num"),
        ((F.lit(q) * F.col("ss") - F.col("bsum"))
         * (F.col("k") - 1)).alias("f_den"),
    )


def anova_f_sql(base_select: str, group_col: str, value_col: str,
                q: int = 1024) -> str:
    """DuckDB oracle for ``anova_f``."""
    return f"""
SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       CAST(bsum - ({q} * s * s) // n AS BIGINT) AS ssb_q,
       CAST({q} * ss - bsum AS BIGINT) AS ssw_q,
       CAST((bsum - ({q} * s * s) // n) * (n - k) AS BIGINT) AS f_num,
       CAST(({q} * ss - bsum) * (k - 1) AS BIGINT) AS f_den
FROM (
  SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s, sum(ssg) AS ss,
         sum(({q} * sg * sg) // ng) AS bsum
  FROM (
    SELECT count(*) AS ng, sum(v) AS sg, sum(v * v) AS ssg
    FROM (SELECT CAST({group_col} AS VARCHAR) AS grp,
                 CAST({value_col} AS BIGINT) AS v
          FROM ({base_select}) b) t
    GROUP BY grp) g) tot"""


def fdr_bh(
    df: DataFrame,
    id_col: str,
    p_col: str,
    alpha_num: int = 5,
    alpha_den: int = 100,
    p_scale: int = 1 << 20,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over quantized p-values ->
    (id, p, i, reject): p-values are int64 in [0, p_scale] units, ranks
    are the (p, id) total order, and the BH threshold test

        p_i / p_scale <= alpha * i / n

    is the exact integer cross-comparison p_i * n * alpha_den <=
    alpha_num * i * p_scale; reject all ranks <= max passing rank (the
    step-up rule).  One global rank window + one scalar max broadcast
    back — fine for result sets that fit a window; the gate documents
    the single-partition rank as the oracle-workload shape."""
    n = df.count()
    w = Window.orderBy(F.col(p_col).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(id_col).alias("id"), F.col(p_col).cast("long").alias("p")
    ).withColumn("i", F.row_number().over(w).cast("long"))
    cond = (
        F.col("p") * F.lit(int(n)) * F.lit(alpha_den)
        <= F.lit(alpha_num) * F.col("i") * F.lit(p_scale)
    )
    kmax = ranked.agg(
        F.coalesce(F.max(F.when(cond, F.col("i"))), F.lit(0)).alias("kmax")
    )
    return ranked.crossJoin(F.broadcast(kmax)).select(
        "id", "p", "i", (F.col("i") <= F.col("kmax")).alias("reject")
    )


def fdr_bh_sql(base_select: str, alpha_num: int = 5, alpha_den: int = 100,
               p_scale: int = 1 << 20) -> str:
    """DuckDB oracle for ``fdr_bh``; ``base_select`` must yield (id, p)."""
    return f"""
WITH r AS (
  SELECT id, CAST(p AS BIGINT) AS p,
         CAST(row_number() OVER (ORDER BY p, id) AS BIGINT) AS i
  FROM ({base_select}) b),
t AS (SELECT count(*) AS n FROM r),
k AS (
  SELECT coalesce(max(CASE WHEN p * t.n * {alpha_den}
                                <= {alpha_num} * i * {p_scale}
                           THEN i END), 0) AS kmax
  FROM r, t)
SELECT id, p, i, i <= k.kmax AS reject FROM r, k"""


def average_precision(
    df: DataFrame,
    id_col: str,
    score_col: str,
    label_col: str,
    q: int = 1 << 20,
) -> DataFrame:
    """Average precision (area under the PR curve, the ranking-eval
    companion of auc_exact) -> one row (n, npos, ap_q): rank by
    (score DESC, id ASC), and for every positive at rank k add the
    q-quantized precision floor(q * TP_k / k); AP = ap_q / (q * npos).
    The per-rank floordiv is part of the semantics (order-independent
    sum of exact terms), so both engines agree bit-for-bit.  One rank
    window + one agg."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    y = F.col(label_col).cast("long")
    ranked = df.select(
        y.alias("y"),
        F.row_number().over(w).cast("long").alias("k"),
        F.sum(y).over(
            Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ).alias("tp"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("npos"),
        F.sum(
            F.when(F.col("y") == 1, F.expr(f"({q} * tp) div k")).otherwise(0)
        ).alias("ap_q"),
    )


def average_precision_sql(base_select: str, q: int = 1 << 20) -> str:
    """DuckDB oracle for ``average_precision``; ``base_select`` must
    yield (id, score, y)."""
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos,
       CAST(sum(CASE WHEN y = 1 THEN ({q} * tp) // k ELSE 0 END)
            AS BIGINT) AS ap_q
FROM (
  SELECT y,
         CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS k,
         sum(y) OVER (ORDER BY score DESC, id
                      ROWS UNBOUNDED PRECEDING) AS tp
  FROM ({base_select}) b) r"""


def winsorized_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p_num: int = 1,
    p_den: int = 10,
) -> DataFrame:
    """Winsorized group mean in exact integers -> (key, n, wsum): per
    group, values below the k-th smallest are raised to it and above the
    (n-k+1)-th are lowered to it, k = floor(n * p_num / p_den) + 1 (the
    classic robust location estimator; ranks not quantiles, so the
    bounds are exact order statistics).  wsum is the winsorized SUM —
    the mean is the caller's rational wsum/n.

    Shape: one rank window + one group max/min of the rank-selected
    bounds + one partial agg, all codegen."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col("v"), F.col("__rid"))
    wall = Window.partitionBy(key_col)
    d = (
        df.select(F.col(key_col), F.col(value_col).cast("long").alias("v"))
        .withColumn("__rid", F.monotonically_increasing_id())
        .withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
    )
    k = F.expr(f"n * {int(p_num)} div {int(p_den)}") + 1
    lo = F.max(F.when(F.col("r") == k, F.col("v"))).over(wall)
    hi = F.max(F.when(F.col("r") == F.col("n") - k + 1, F.col("v"))).over(wall)
    d = d.withColumn("wv", F.greatest(lo, F.least(hi, F.col("v"))))
    return d.groupBy(F.col(key_col).alias("key")).agg(
        F.max("n").alias("n"), F.sum("wv").alias("wsum")
    )


def winsorized_mean_sql(
    base_select: str, key_col: str = "key", p_num: int = 1, p_den: int = 10
) -> str:
    """DuckDB twin of ``winsorized_mean``; ``base_select`` -> (key, v).
    Value ties make the rank-k choice ambiguous only between EQUAL
    values, so no row-id tie-break is needed for the bounds."""
    return f"""
WITH b AS (
  SELECT {key_col} AS key, CAST(v AS BIGINT) AS v,
         row_number() OVER (PARTITION BY {key_col} ORDER BY v) AS r,
         count(*) OVER (PARTITION BY {key_col}) AS n
  FROM ({base_select}) s),
k AS (
  SELECT *, n * {int(p_num)} // {int(p_den)} + 1 AS kk FROM b),
bounds AS (
  SELECT key,
         max(CASE WHEN r = kk THEN v END) AS lo,
         max(CASE WHEN r = n - kk + 1 THEN v END) AS hi
  FROM k GROUP BY 1)
SELECT b.key, max(b.n) AS n,
       sum(GREATEST(bo.lo, LEAST(bo.hi, b.v))) AS wsum
FROM b JOIN bounds bo ON bo.key = b.key
GROUP BY 1"""


def hhi_index(
    df: DataFrame,
    key_col: str,
    part_col: str,
    value_col: str,
    scale: int = 1 << 20,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group, exact ->
    (key, n_parts, num, den, hhi_q): shares s_i = x_i / X give
    HHI = sum(s_i^2) = sum(x_i^2) / X^2 — carried as the integer
    rational (num, den) plus the floor quantization hhi_q =
    num * scale div den.  One two-level partial agg."""
    g = (
        df.select(F.col(key_col).alias("key"), F.col(part_col).alias("p"),
                  F.col(value_col).cast("long").alias("x"))
        .groupBy("key", "p").agg(F.sum("x").alias("xs"))
    )
    return (
        g.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("xs") * F.col("xs")).alias("num"),
            (F.sum("xs") * F.sum("xs")).alias("den"),
        )
        .withColumn("hhi_q", F.expr(f"(num * {int(scale)}) div den"))
    )


def hhi_index_sql(base_select: str, scale: int = 1 << 20) -> str:
    """DuckDB twin; ``base_select`` -> (key, p, x)."""
    return f"""
WITH g AS (
  SELECT key, p, CAST(sum(x) AS BIGINT) AS xs
  FROM ({base_select}) s GROUP BY 1, 2)
SELECT key, count(*) AS n_parts,
       sum(xs * xs) AS num, sum(xs) * sum(xs) AS den,
       (sum(xs * xs) * {int(scale)}) // (sum(xs) * sum(xs)) AS hhi_q
FROM g GROUP BY 1"""


def conformal_coverage(
    df: "DataFrame",
    group_col: str = "g",
    resid_col: str = "r",
    cal_col: str = "is_cal",
    id_col: str = "id",
    alpha_num: int = 1,
    alpha_den: int = 5,
) -> "DataFrame":
    """Split-conformal prediction intervals + empirical coverage, exact.

    Per group: q_hat is the k-th smallest calibration residual with
    k = ceil((n_cal + 1) * (1 - alpha)) — the standard split-conformal
    quantile, computed as the exact integer order statistic
    ``k = ((den-num)*(n_cal+1) + den - 1) div den`` (no FP quantiles);
    coverage is the count of held-out residuals <= q_hat.  With exchangeable
    data the interval [pred - q_hat, pred + q_hat] covers with probability
    >= 1 - alpha; the gate pins the deterministic arithmetic, the guarantee
    is the published theorem (Vovk et al., conformal prediction).

    Scale shape: one window rank over calibration rows, one aggregation
    over test rows, one broadcast join of the per-group q_hat (groups are
    tiny vs rows).  All integers.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(resid_col).cast("long").alias("r"),
        F.col(cal_col).cast("boolean").alias("c"),
        F.col(id_col).alias("i"),
    )
    cal = base.filter(F.col("c"))
    w = Window.partitionBy("g").orderBy("r", "i")
    ranked = cal.withColumn("rn", F.row_number().over(w).cast("long")).withColumn(
        "n_cal", F.count(F.lit(1)).over(Window.partitionBy("g")).cast("long")
    )
    num, den = int(alpha_num), int(alpha_den)
    k = F.expr(f"(({den - num}) * (n_cal + 1) + {den - 1}) div {den}")
    qhat = (
        ranked.withColumn("k", k)
        .filter(F.col("rn") == F.least(F.col("k"), F.col("n_cal")))
        .select("g", F.col("n_cal"), F.col("k"), F.col("r").alias("q_hat"))
    )
    test = base.filter(~F.col("c"))
    return (
        test.join(F.broadcast(qhat), "g")
        .groupBy(F.col("g"), "n_cal", "k", "q_hat")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q_hat"), 1).otherwise(0)).alias("covered"),
        )
        .select(F.col("g").alias(group_col), "n_cal", "k", "q_hat", "n_test", "covered")
    )


def conformal_coverage_sql(
    base_select: str,
    group_col: str = "g",
    resid_col: str = "r",
    cal_col: str = "is_cal",
    id_col: str = "id",
    alpha_num: int = 1,
    alpha_den: int = 5,
) -> str:
    """DuckDB twin of ``conformal_coverage``."""
    num, den = int(alpha_num), int(alpha_den)
    return f"""
WITH b AS (
  SELECT {group_col} AS g, CAST({resid_col} AS BIGINT) AS r,
         {cal_col} AS c, {id_col} AS i
  FROM ({base_select}) s),
ranked AS (
  SELECT g, r,
         CAST(row_number() OVER (PARTITION BY g ORDER BY r, i) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n_cal
  FROM b WHERE c),
qh AS (
  SELECT g, n_cal,
         ({den - num} * (n_cal + 1) + {den - 1}) // {den} AS k,
         r AS q_hat
  FROM ranked
  WHERE rn = least(({den - num} * (n_cal + 1) + {den - 1}) // {den}, n_cal))
SELECT t.g AS {group_col}, q.n_cal, q.k, q.q_hat,
       count(*) AS n_test,
       sum(CASE WHEN t.r <= q.q_hat THEN 1 ELSE 0 END) AS covered
FROM b t JOIN qh q ON t.g = q.g
WHERE NOT t.c
GROUP BY 1, 2, 3, 4"""


def cidr_longest_match(
    ips: "DataFrame",
    cidrs: list,
    ip_col: str = "ip",
    id_col: str = "event_id",
) -> "DataFrame":
    """Longest-prefix CIDR match (the IP routing / log-enrichment join).

    ``cidrs`` is a list of ``(label, base, bits)`` IPv4 networks.  A
    non-equi "ip within network" join degenerates to a nested loop, so the
    ip side EXPLODES to one row per distinct prefix length present in the
    table (ip div 2^(32-bits)) and the match is a pure EQUI-join on
    (bits, prefix) — the prefix-explode discipline (cf. prefix_join); the
    longest match wins via one window argmax (bits DESC, label).

    Scale shape: fan-out = number of distinct prefix lengths (handfuls in
    real routing tables), broadcast network table, one window.  No
    BroadcastNestedLoopJoin (the track_link lesson).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    bit_set = sorted({int(b) for _, _, b in cidrs})
    net = [(str(lbl), int(base) >> (32 - int(bits)), int(bits))
           for lbl, base, bits in cidrs]
    spark = ips.sparkSession
    net_df = spark.createDataFrame(net, "label string, pfx long, bits long")
    expl = ips.select(
        F.col(id_col), F.col(ip_col).cast("long").alias("ip"),
        F.explode(F.array(*[F.lit(b) for b in bit_set])).alias("bits"),
    ).withColumn(
        "pfx",
        F.expr("ip div " + (
            "(CASE bits " + " ".join(
                f"WHEN {b} THEN {1 << (32 - b)}" for b in bit_set
            ) + " END)"
        )).cast("long"),
    )
    j = expl.join(F.broadcast(net_df), ["bits", "pfx"])
    w = Window.partitionBy(id_col).orderBy(F.col("bits").desc(), "label")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "ip", "label", "bits")
    )


def cidr_longest_match_sql(base_select: str, cidrs: list,
                           ip_col: str = "ip",
                           id_col: str = "event_id") -> str:
    """DuckDB twin of ``cidr_longest_match``."""
    bit_set = sorted({int(b) for _, _, b in cidrs})
    net_rows = ", ".join(
        f"('{lbl}', {int(base) >> (32 - int(bits))}, {int(bits)})"
        for lbl, base, bits in cidrs
    )
    case = ("CASE bits " + " ".join(
        f"WHEN {b} THEN {1 << (32 - b)}" for b in bit_set) + " END")
    return f"""
WITH ips AS (
  SELECT {id_col}, CAST({ip_col} AS BIGINT) AS ip FROM ({base_select}) s),
net(label, pfx, bits) AS (VALUES {net_rows}),
expl AS (
  SELECT {id_col}, ip, b.bits, ip // ({case.replace('bits', 'b.bits')}) AS pfx
  FROM ips, (SELECT unnest([{', '.join(str(b) for b in bit_set)}]) AS bits) b),
j AS (
  SELECT e.{id_col}, e.ip, n.label, CAST(e.bits AS BIGINT) AS bits
  FROM expl e JOIN net n ON n.bits = e.bits AND n.pfx = e.pfx)
SELECT {id_col}, ip, label, bits FROM (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
      ORDER BY bits DESC, label) AS rn FROM j) r
WHERE rn = 1"""


def tree_depth2(
    df: "DataFrame",
    key_col: str,
    f1_col: str,
    f2_col: str,
    label_col: str,
) -> "DataFrame":
    """Depth-2 decision tree per key: the exact-Gini stump machinery
    applied twice — the root splits on feature 1, each branch splits on
    feature 2 (the classic axis-alternating shallow tree).  Branch rows
    are re-keyed as k*2 + side so the second level is ONE more stump pass
    over the same machinery; pure or single-row branches emit no child
    (no valid split) under the same rule both sides.

    Output: (k, side, thr1, n2, n2_pos, thr2, score_num, score_den) — one
    row per branch with its child split.

    Scale shape: two window-stump passes + one broadcast join of the tiny
    per-key root table; depth-d trees are d chained passes (no recursion
    state)."""
    from pyspark.sql import functions as F

    root = decision_stump(df, key_col, f1_col, label_col).select(
        F.col("k"), F.col("thr").alias("thr1")
    )
    b = df.select(
        F.col(key_col).alias("k"), F.col(f1_col).alias("f1"),
        F.col(f2_col).alias("f2"), F.col(label_col).alias("y"),
    ).join(F.broadcast(root), "k")
    b2 = b.withColumn(
        "k2",
        (F.col("k").cast("long") * 2
         + F.when(F.col("f1") <= F.col("thr1"), 0).otherwise(1)).cast("long"),
    )
    child = decision_stump(b2, "k2", "f2", "y")
    return (
        child.select(
            (F.col("k") / 2).cast("long").alias("k"),
            (F.col("k") % 2).cast("long").alias("side"),
            F.col("n").alias("n2"), F.col("n_pos").alias("n2_pos"),
            F.col("thr").alias("thr2"), "score_num", "score_den",
        )
        .join(F.broadcast(root.withColumnRenamed("k", "k_")),
              F.col("k") == F.col("k_"))
        .select("k", "side", "thr1", "n2", "n2_pos", "thr2",
                "score_num", "score_den")
    )


def tree_depth2_sql(
    base_select: str,
    key_col: str,
    f1_col: str,
    f2_col: str,
    label_col: str,
) -> str:
    """DuckDB twin of ``tree_depth2`` (two chained stump replays)."""
    root = decision_stump_sql(base_select, key_col, f1_col, label_col)
    branch = f"""
SELECT CAST(b.{key_col} AS BIGINT) * 2
         + CASE WHEN b.{f1_col} <= r.thr THEN 0 ELSE 1 END AS k2,
       b.{f2_col} AS f2, b.{label_col} AS y
FROM ({base_select}) b JOIN ({root}) r ON r.k = b.{key_col}"""
    child = decision_stump_sql(branch, "k2", "f2", "y")
    return f"""
SELECT c.k // 2 AS k, c.k % 2 AS side, r.thr AS thr1,
       c.n AS n2, c.n_pos AS n2_pos, c.thr AS thr2,
       c.score_num, c.score_den
FROM ({child}) c JOIN ({root}) r ON r.k = c.k // 2"""


def apportion_largest_remainder(
    df: "DataFrame",
    key_col: str,
    votes_col: str,
    seats: int,
) -> "DataFrame":
    """Largest-remainder (Hare) apportionment per group-less table:
    quota_i = floor(votes_i * seats / total); the remaining
    seats - sum(quota) seats go to the largest remainders
    (votes_i * seats) mod total, ties to the larger vote then smaller key
    — exact integer end to end.  The quota/allocation primitive behind
    stratified sampling budgets, shard assignment, and election math.

    Scale shape: one total (map-side combined), one window rank — the
    party/stratum table is small by construction; rows stay distributed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tot = df.agg(F.sum(F.col(votes_col).cast("long")).alias("t")).collect()[0]["t"]
    s = int(seats)
    b = df.select(
        F.col(key_col).alias("k"), F.col(votes_col).cast("long").alias("v")
    ).withColumn("quota", F.expr(f"(v * {s}) div {int(tot)}")) \
     .withColumn("rem", (F.col("v") * s) % int(tot))
    w = Window.orderBy(F.col("rem").desc(), F.col("v").desc(), F.col("k"))
    base = b.agg(F.sum("quota").alias("q")).collect()[0]["q"]
    extra = s - int(base)
    return (
        b.withColumn("rk", F.row_number().over(w))
        .select(
            "k", "v", "quota", "rem",
            (F.col("quota")
             + F.when(F.col("rk") <= extra, 1).otherwise(0)).alias("seats"),
        )
    )


def apportion_sql(base_select: str, key_col: str, votes_col: str,
                  seats: int) -> str:
    """DuckDB twin of ``apportion_largest_remainder``."""
    s = int(seats)
    return f"""
WITH b AS (
  SELECT {key_col} AS k, CAST({votes_col} AS BIGINT) AS v
  FROM ({base_select}) t),
t AS (SELECT sum(v) AS tot FROM b),
q AS (
  SELECT k, v, (v * {s}) // t.tot AS quota, (v * {s}) % t.tot AS rem
  FROM b, t),
e AS (SELECT {s} - sum(quota) AS extra FROM q)
SELECT k, v, quota, rem,
       quota + CASE WHEN row_number() OVER (
           ORDER BY rem DESC, v DESC, k) <= e.extra THEN 1 ELSE 0 END AS seats
FROM q, e"""


def rendezvous_assign(
    keys: "DataFrame",
    nodes: list,
    key_col: str = "key_id",
) -> "DataFrame":
    """Rendezvous (highest-random-weight) hashing: each key goes to the
    node maximizing a deterministic mix hash(key, node) — the stateless
    shard-assignment rule whose reshuffle on node loss is provably 1/n.
    The mix is the splitmix-style multiplicative scramble used by the
    engine's other derandomized ops (pure int64, mod 2^61-1).

    Scale shape: one explode over the (small) node list + one window
    argmax per key; no shuffle beyond the key partition."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    m = 2147483647
    nd = ", ".join(str(int(x)) for x in nodes)
    ex = keys.select(F.col(key_col).alias("kid")).withColumn(
        "node", F.explode(F.expr(f"array({nd})"))
    ).withColumn("node", F.col("node").cast("long")).withColumn(
        "hw",
        F.expr(f"((((kid * 2654435761) % {m}) + node + 1)"
               f" * 2654435761) % {m}"),
    )
    w = Window.partitionBy("kid").orderBy(F.col("hw").desc(), "node")
    return (
        ex.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("kid").alias(key_col), "node", "hw")
    )


def rendezvous_sql(base_select: str, nodes: list,
                   key_col: str = "key_id") -> str:
    """DuckDB twin of ``rendezvous_assign``."""
    m = 2147483647
    nd = ", ".join(str(int(x)) for x in nodes)
    return f"""
WITH k AS (SELECT {key_col} AS kid FROM ({base_select}) s),
ex AS (
  SELECT kid, CAST(n.node AS BIGINT) AS node,
         ((((kid * 2654435761) % {m}) + CAST(n.node AS BIGINT) + 1)
          * 2654435761) % {m} AS hw
  FROM k, (SELECT unnest([{nd}]) AS node) n)
SELECT kid AS {key_col}, node, hw FROM (
  SELECT *, row_number() OVER (PARTITION BY kid
      ORDER BY hw DESC, node) AS rn FROM ex) r
WHERE rn = 1"""


def fisher_lda(
    df: "DataFrame",
    group_col: str,
    x1_col: str,
    x2_col: str,
    label_col: str,
) -> "DataFrame":
    """Fisher linear discriminant (2 features, 2 classes) per group,
    EXACT: the within-class scatter is cleared of denominators as
    T = n1*(n0*Sxx0 - Sx0 Sx0^T) + n0*(n1*Sxx1 - Sx1 Sx1^T) and the mean
    difference as D = n0*Sx1 - n1*Sx0 (both integer), so the discriminant
    direction w = adj(T) . D is an exact int64 vector, sign-normalized to
    (w1, w2) lexicographically positive (no gcd reduction — Spark has no
    gcd builtin; the raw vector fits int64 under the stated bounds).  Keep
    |features| <= ~30 and per-class n <= ~400: |w| stays < 6e17.

    Output: (g, n0, n1, t11, t12, t22, d1, d2, w1, w2).

    Scale shape: one map-side-combined moment aggregation + per-row
    integer algebra — the classic closed-form classifier with no
    iteration."""
    from pyspark.sql import functions as F

    b = df.select(
        F.col(group_col).alias("g"),
        F.col(x1_col).cast("long").alias("x1"),
        F.col(x2_col).cast("long").alias("x2"),
        F.col(label_col).cast("long").alias("y"),
    )
    m = b.groupBy("g").agg(
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n1"),
        *[
            F.sum(F.when(F.col("y") == c, expr).otherwise(0)).alias(name)
            for c in (0, 1)
            for name, expr in [
                (f"sx1_{c}", F.col("x1")), (f"sx2_{c}", F.col("x2")),
                (f"s11_{c}", F.col("x1") * F.col("x1")),
                (f"s12_{c}", F.col("x1") * F.col("x2")),
                (f"s22_{c}", F.col("x2") * F.col("x2")),
            ]
        ],
    )
    t11 = (F.col("n1") * (F.col("n0") * F.col("s11_0") - F.col("sx1_0") * F.col("sx1_0"))
           + F.col("n0") * (F.col("n1") * F.col("s11_1") - F.col("sx1_1") * F.col("sx1_1")))
    t12 = (F.col("n1") * (F.col("n0") * F.col("s12_0") - F.col("sx1_0") * F.col("sx2_0"))
           + F.col("n0") * (F.col("n1") * F.col("s12_1") - F.col("sx1_1") * F.col("sx2_1")))
    t22 = (F.col("n1") * (F.col("n0") * F.col("s22_0") - F.col("sx2_0") * F.col("sx2_0"))
           + F.col("n0") * (F.col("n1") * F.col("s22_1") - F.col("sx2_1") * F.col("sx2_1")))
    d1 = F.col("n0") * F.col("sx1_1") - F.col("n1") * F.col("sx1_0")
    d2 = F.col("n0") * F.col("sx2_1") - F.col("n1") * F.col("sx2_0")
    s = m.select("g", "n0", "n1",
                 t11.alias("t11"), t12.alias("t12"), t22.alias("t22"),
                 d1.alias("d1"), d2.alias("d2"))
    w1r = F.col("t22") * F.col("d1") - F.col("t12") * F.col("d2")
    w2r = F.col("t11") * F.col("d2") - F.col("t12") * F.col("d1")
    s = s.withColumn("w1r", w1r).withColumn("w2r", w2r)
    sgn = F.when(
        (F.col("w1r") < 0) | ((F.col("w1r") == 0) & (F.col("w2r") < 0)), -1
    ).otherwise(1)
    # the raw adjugate vector fits int64 under the documented bounds; no
    # reduction (Spark has no gcd builtin), sign normalized only
    return s.select(
        "g", "n0", "n1", "t11", "t12", "t22", "d1", "d2",
        (sgn * F.col("w1r")).cast("long").alias("w1"),
        (sgn * F.col("w2r")).cast("long").alias("w2"),
    )


def fisher_lda_sql(base_select: str, group_col: str, x1_col: str,
                   x2_col: str, label_col: str) -> str:
    """DuckDB twin of ``fisher_lda``."""
    mom = []
    for c in (0, 1):
        for name, expr in [(f"sx1_{c}", "x1"), (f"sx2_{c}", "x2"),
                           (f"s11_{c}", "x1 * x1"), (f"s12_{c}", "x1 * x2"),
                           (f"s22_{c}", "x2 * x2")]:
            mom.append(f"sum(CASE WHEN y = {c} THEN {expr} ELSE 0 END) AS {name}")
    return f"""
WITH b AS (
  SELECT {group_col} AS g, CAST({x1_col} AS BIGINT) AS x1,
         CAST({x2_col} AS BIGINT) AS x2, CAST({label_col} AS BIGINT) AS y
  FROM ({base_select}) s),
m AS (
  SELECT g,
         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n1,
         {', '.join(mom)}
  FROM b GROUP BY 1),
t AS (
  SELECT g, n0, n1,
         n1 * (n0 * s11_0 - sx1_0 * sx1_0) + n0 * (n1 * s11_1 - sx1_1 * sx1_1) AS t11,
         n1 * (n0 * s12_0 - sx1_0 * sx2_0) + n0 * (n1 * s12_1 - sx1_1 * sx2_1) AS t12,
         n1 * (n0 * s22_0 - sx2_0 * sx2_0) + n0 * (n1 * s22_1 - sx2_1 * sx2_1) AS t22,
         n0 * sx1_1 - n1 * sx1_0 AS d1,
         n0 * sx2_1 - n1 * sx2_0 AS d2
  FROM m),
w AS (
  SELECT *, t22 * d1 - t12 * d2 AS w1r, t11 * d2 - t12 * d1 AS w2r FROM t)
SELECT g, n0, n1, t11, t12, t22, d1, d2,
       (CASE WHEN w1r < 0 OR (w1r = 0 AND w2r < 0) THEN -1 ELSE 1 END)
         * w1r AS w1,
       (CASE WHEN w1r < 0 OR (w1r = 0 AND w2r < 0) THEN -1 ELSE 1 END)
         * w2r AS w2
FROM w"""


def brier_decomposition(
    df: "DataFrame",
    bin_col: str = "k",
    outcome_col: str = "o",
    bins: int = 20,
    q: int = 1 << 12,
) -> "DataFrame":
    """Murphy decomposition of the Brier score (reliability / resolution /
    uncertainty) over pre-binned probability forecasts p = k/bins, exact:
    REL = sum_k n_k (p_k - o_k)^2 / N and RES = sum_k n_k (o_k - o)^2 / N
    quantize PER BIN as floor(num^2 * q / den) with integer numerators
    (n_k*k - bins*m_k and N*m_k - M*n_k), so the sums are
    order-independent int64 (keep N <= ~3e4: (N*m_k)^2 * q must stay
    under 2^63 — cap or pre-aggregate beyond); UNC = o(1-o) emits as the integer pair
    (M*(N-M), N^2).  The calibration-diagnostics layer over `brier` and
    `calibration_bins`.

    Output: one row (n, m, rel_q, res_q, unc_num, unc_den)."""
    from pyspark.sql import functions as F

    b = df.select(
        F.col(bin_col).cast("long").alias("k"),
        F.col(outcome_col).cast("long").alias("o"),
    )
    per = b.groupBy("k").agg(
        F.count("*").alias("nk"), F.sum("o").alias("mk")
    )
    tot = b.agg(F.count("*").alias("n"), F.sum("o").alias("m"))
    j = per.crossJoin(F.broadcast(tot))
    K = int(bins)
    rel = F.expr(
        f"(((nk * k - {K} * mk) * (nk * k - {K} * mk)) * {int(q)})"
        f" div ({K} * {K} * nk * n)"
    )
    res = F.expr(
        f"(((n * mk - m * nk) * (n * mk - m * nk)) * {int(q)})"
        f" div (n * n * nk * n)"
    )
    return (
        j.select("n", "m", rel.alias("relk"), res.alias("resk"))
        .groupBy("n", "m")
        .agg(F.sum("relk").alias("rel_q"), F.sum("resk").alias("res_q"))
        .select(
            "n", "m", "rel_q", "res_q",
            (F.col("m") * (F.col("n") - F.col("m"))).alias("unc_num"),
            (F.col("n") * F.col("n")).alias("unc_den"),
        )
    )


def brier_decomposition_sql(base_select: str, bin_col: str = "k",
                            outcome_col: str = "o", bins: int = 20,
                            q: int = 1 << 12) -> str:
    """DuckDB twin of ``brier_decomposition``."""
    K = int(bins)
    return f"""
WITH b AS (
  SELECT CAST({bin_col} AS BIGINT) AS k, CAST({outcome_col} AS BIGINT) AS o
  FROM ({base_select}) s),
per AS (SELECT k, count(*) AS nk, sum(o) AS mk FROM b GROUP BY 1),
tot AS (SELECT count(*) AS n, sum(o) AS m FROM b),
j AS (
  SELECT n, m,
         (((nk * k - {K} * mk) * (nk * k - {K} * mk)) * {int(q)})
           // ({K} * {K} * nk * n) AS relk,
         (((n * mk - m * nk) * (n * mk - m * nk)) * {int(q)})
           // (n * n * nk * n) AS resk
  FROM per, tot)
SELECT n, m, sum(relk) AS rel_q, sum(resk) AS res_q,
       m * (n - m) AS unc_num, n * n AS unc_den
FROM j GROUP BY n, m"""


def rbo_scores(
    ranks: "DataFrame",
    key_col: str = "q",
    pos_a_col: str = "pa",
    pos_b_col: str = "pb",
    depth: int = 12,
    q: int = 1 << 12,
) -> "DataFrame":
    """Rank-biased overlap (Webber et al. 2010, public literature) between
    two rankings per key, p = 9/10, truncated at ``depth``: RBO =
    (1-p)/p * sum_d p^d * X_d / d with X_d = |A[:d] ∩ B[:d]|.  Each term
    quantizes as floor(9^(d-1) * X_d * q / (10^d * d)) — exact integers
    (9^(depth-1) * X * q must stay under 2^63, hence depth <= ~14), the
    sum order-independent.  An item contributes to X_d for every
    d >= max(pos_a, pos_b): one bounded explode + two aggregations.

    Input: one row per (key, item) with both positions (1-based)."""
    from pyspark.sql import functions as F

    d = ranks.select(
        F.col(key_col).alias("k"),
        F.greatest(F.col(pos_a_col), F.col(pos_b_col)).cast("long").alias("mp"),
    ).filter(F.col("mp") <= int(depth))
    ex = d.select(
        "k", F.explode(F.sequence(F.col("mp"), F.lit(int(depth)))).alias("d")
    )
    xd = ex.groupBy("k", "d").agg(F.count("*").alias("x"))
    term = F.expr(
        " ".join([
            "CASE d",
            *[f"WHEN {dd} THEN (x * {9 ** (dd - 1)} * {int(q)}) div {10 ** dd * dd}"
              for dd in range(1, int(depth) + 1)],
            "END",
        ])
    )
    return (
        xd.withColumn("t", term)
        .groupBy(F.col("k").alias(key_col))
        .agg(F.sum("t").alias("rbo_q"))
    )


def rbo_scores_sql(base_select: str, key_col: str = "q",
                   pos_a_col: str = "pa", pos_b_col: str = "pb",
                   depth: int = 12, q: int = 1 << 12) -> str:
    """DuckDB twin of ``rbo_scores``."""
    arms = " ".join(
        f"WHEN {dd} THEN (x * {9 ** (dd - 1)} * {int(q)}) // {10 ** dd * dd}"
        for dd in range(1, int(depth) + 1)
    )
    return f"""
WITH b AS (
  SELECT {key_col} AS k,
         greatest(CAST({pos_a_col} AS BIGINT), CAST({pos_b_col} AS BIGINT)) AS mp
  FROM ({base_select}) s
  WHERE greatest({pos_a_col}, {pos_b_col}) <= {int(depth)}),
ex AS (
  SELECT k, mp + j.j AS d
  FROM b, (SELECT unnest(range({int(depth)})) AS j) j
  WHERE mp + j.j <= {int(depth)}),
xd AS (SELECT k, d, count(*) AS x FROM ex GROUP BY 1, 2)
SELECT k AS {key_col}, sum(CASE d {arms} END) AS rbo_q
FROM xd GROUP BY 1"""


def knapsack01(
    df: "DataFrame",
    key_col: str = "k",
    order_col: str = "o",
    w_col: str = "w",
    v_col: str = "v",
    cap: int = 15,
) -> "DataFrame":
    """0/1 knapsack per key, exact: the classic dp over capacities
    dp'[c] = max(dp[c], v + dp[c-w]) processed in a deterministic item
    order (the ``order_col`` rank).  Engine: one applyInPandas pass per
    key (state = cap+1 ints, embarrassingly parallel across keys); the
    oracle carries the dp LIST in a lockstep recursive CTE and updates it
    with a list_transform lambda — the interval_sched discipline with a
    vector state.

    Output: (k, n_items, best)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    word = Window.partitionBy(key_col).orderBy(order_col)
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(w_col).cast("long").alias("w"),
        F.col(v_col).cast("long").alias("v"),
        F.row_number().over(word).cast("long").alias("rn"),
    )

    def fn(key, pdf):
        pdf = pdf.sort_values("rn")
        dp = np.zeros(int(cap) + 1, np.int64)
        for w, v in zip(pdf["w"], pdf["v"]):
            w, v = int(w), int(v)
            if w <= cap:
                nd = dp.copy()
                nd[w:] = np.maximum(dp[w:], v + dp[:-w] if w else v + dp)
                dp = nd
        return pd.DataFrame([{
            "k": key[0], "n_items": int(len(pdf)), "best": int(dp[cap]),
        }])

    return b.groupBy("k").applyInPandas(fn, "k long, n_items long, best long")


def knapsack01_sql(
    base_select: str,
    key_col: str = "k",
    order_col: str = "o",
    w_col: str = "w",
    v_col: str = "v",
    cap: int = 15,
) -> str:
    """DuckDB twin of ``knapsack01`` (recursive CTE, dp LIST state)."""
    C = int(cap)
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT {key_col} AS k, CAST({w_col} AS BIGINT) AS w,
         CAST({v_col} AS BIGINT) AS v,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s),
rec AS (
  SELECT k, CAST(0 AS BIGINT) AS rn,
         [CAST(0 AS BIGINT) FOR i IN range({C + 1})] AS dp
  FROM (SELECT DISTINCT k FROM b) u
  UNION ALL
  SELECT r.k, r.rn + 1,
         CASE WHEN q.w > {C} THEN r.dp ELSE
           list_transform(range({C + 1}), c ->
             CASE WHEN c >= q.w
                  THEN GREATEST(r.dp[CAST(c + 1 AS INT)],
                                q.v + r.dp[CAST(c - q.w + 1 AS INT)])
                  ELSE r.dp[CAST(c + 1 AS INT)] END)
         END AS dp
  FROM rec r JOIN b q ON q.k = r.k AND q.rn = r.rn + 1)
SELECT r.k, r.rn AS n_items, r.dp[{C + 1}] AS best
FROM rec r
JOIN (SELECT k, max(rn) AS mx FROM b GROUP BY 1) m
  ON m.k = r.k AND m.mx = r.rn"""


def hash_ring_assign(
    keys: "DataFrame",
    nodes: list,
    vnodes: int = 4,
    ring_bits: int = 20,
    key_col: str = "key_id",
) -> "DataFrame":
    """Consistent-hash ring assignment (Karger et al., public literature):
    each node owns ``vnodes`` points on a 2^ring_bits ring; a key goes to
    the first vnode clockwise from its own point (wraparound to the ring
    minimum).  The successor search is ONE packed-key aggregation:
    pk = [vnode point < key point] * 2^(2b) + point * 2^b + node — the
    minimum pk is the successor (or, when nothing lies ahead, the
    wraparound minimum), ties to the smaller node id.

    Output: (key_id, kp, node, point).  Companion of `rendezvous` — the
    stateful-ring flavor of stateless shard assignment."""
    from pyspark.sql import functions as F

    M = 1 << int(ring_bits)
    P = 2147483647

    def _mix(a, b):
        return ((((a * 2654435761) % P) + b + 1) * 2654435761) % P % M

    vn = [(int(n), _mix(int(n), r * 131))
          for n in nodes for r in range(int(vnodes))]
    spark = keys.sparkSession
    vdf = spark.createDataFrame(vn, "node long, vp long")
    kp = F.expr(
        f"((((({key_col} * 2654435761) % {P}) + 1) * 2654435761) % {P}) % {M}"
    )
    ex = keys.select(key_col, kp.alias("kp")).join(F.broadcast(vdf))
    pk = (
        F.when(F.col("vp") < F.col("kp"), 1).otherwise(0).cast("long")
        * F.lit(1 << (2 * int(ring_bits)))
        + F.col("vp") * F.lit(M) + F.col("node")
    )
    agg = ex.withColumn("pk", pk).groupBy(key_col, "kp").agg(
        F.min("pk").alias("c")
    )
    return agg.select(
        key_col, "kp",
        (F.col("c") % M).alias("node"),
        (F.expr(f"c div {M}") % M).alias("point"),
    )


def hash_ring_sql(base_select: str, nodes: list, vnodes: int = 4,
                  ring_bits: int = 20, key_col: str = "key_id") -> str:
    """DuckDB twin of ``hash_ring_assign``."""
    M = 1 << int(ring_bits)
    P = 2147483647
    rows = ", ".join(
        f"({int(n)}, {((((int(n) * 2654435761) % P) + r * 131 + 1) * 2654435761) % P % M})"
        for n in nodes for r in range(int(vnodes))
    )
    return f"""
WITH k AS (
  SELECT {key_col},
         ((((CAST({key_col} AS BIGINT) * 2654435761) % {P}) + 1)
          * 2654435761) % {P} % {M} AS kp
  FROM ({base_select}) s),
vn(node, vp) AS (VALUES {rows}),
ex AS (
  SELECT k.{key_col}, k.kp,
         CASE WHEN CAST(vn.vp AS BIGINT) < k.kp THEN 1 ELSE 0 END
           * {1 << (2 * int(ring_bits))}
           + CAST(vn.vp AS BIGINT) * {M} + CAST(vn.node AS BIGINT) AS pk
  FROM k, vn)
SELECT {key_col}, kp, min(pk) % {M} AS node,
       (min(pk) // {M}) % {M} AS point
FROM ex GROUP BY 1, 2"""


def bradley_terry(
    matches: "DataFrame",
    iters: int = 2,
    scale: int = 1 << 20,
) -> "DataFrame":
    """Bradley-Terry strengths by derandomized MM iterations (Hunter 2004
    MM algorithm, public literature), EXACT: with strengths w as scaled
    integers (start = scale), one iteration is

        w'_i = (W_i * scale^2) div sum_j ((n_ij + n_ji) * scale^2)
                                          div (w_i + w_j)

    — every division an integer floor-div (the pagerank discipline), so
    the trajectory is a pure function of the win matrix.  W_i = total
    wins of i; keep total games * scale^2 < 2^63.

    Input: (a, b, wins_ab, wins_ba) one row per unordered pair.
    Output: (team, w) after ``iters`` rounds.

    Scale shape per round: one join of strengths onto the (tiny vs games)
    pair table from each side + one keyed agg; lineage cut per round."""
    from pyspark.sql import functions as F

    S = int(scale)
    pairs = matches.select(
        F.col("a").cast("long"), F.col("b").cast("long"),
        F.col("wins_ab").cast("long"), F.col("wins_ba").cast("long"),
    ).localCheckpoint()
    wins = (
        pairs.select(F.col("a").alias("team"), F.col("wins_ab").alias("wn"))
        .unionByName(pairs.select(F.col("b").alias("team"),
                                  F.col("wins_ba").alias("wn")))
        .groupBy("team").agg(F.sum("wn").alias("W"))
        .localCheckpoint()
    )
    w = wins.select("team", F.lit(S).cast("long").alias("w"))
    for _ in range(int(iters)):
        sym = pairs.select("a", "b", (F.col("wins_ab") + F.col("wins_ba")).alias("n")) \
            .unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b"),
                                      (F.col("wins_ab") + F.col("wins_ba")).alias("n")))
        j = (
            sym.join(w.select(F.col("team").alias("a"), F.col("w").alias("wa")), "a")
            .join(w.select(F.col("team").alias("b"), F.col("w").alias("wb")), "b")
            .select("a", F.expr(f"(n * {S} * {S}) div (wa + wb)").alias("t"))
            .groupBy(F.col("a").alias("team"))
            .agg(F.sum("t").alias("den"))
        )
        w = (
            wins.join(j, "team")
            .select("team",
                    F.expr(f"(W * {S} * {S}) div den").cast("long").alias("w"))
            .localCheckpoint()
        )
    return w


def bradley_terry_sql(matches_select: str, iters: int = 2,
                      scale: int = 1 << 20) -> str:
    """DuckDB replay of ``bradley_terry`` (chained MM rounds)."""
    S = int(scale)
    blocks = [
        f"p AS MATERIALIZED (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
        f"CAST(wins_ab AS BIGINT) AS wab, CAST(wins_ba AS BIGINT) AS wba "
        f"FROM ({matches_select}) m)",
        "wins AS MATERIALIZED (SELECT team, sum(wn) AS W FROM ("
        "SELECT a AS team, wab AS wn FROM p UNION ALL "
        "SELECT b, wba FROM p) u GROUP BY 1)",
        "sym AS MATERIALIZED (SELECT a, b, wab + wba AS n FROM p "
        "UNION ALL SELECT b, a, wab + wba FROM p)",
        f"w0 AS (SELECT team, CAST({S} AS BIGINT) AS w FROM wins)",
    ]
    for i in range(int(iters)):
        blocks.append(f"""d{i} AS (
  SELECT s.a AS team, sum((s.n * {S} * {S}) // (x.w + y.w)) AS den
  FROM sym s JOIN w{i} x ON x.team = s.a JOIN w{i} y ON y.team = s.b
  GROUP BY 1),
w{i + 1} AS MATERIALIZED (
  SELECT wins.team, (wins.W * {S} * {S}) // d.den AS w
  FROM wins JOIN d{i} d ON d.team = wins.team)""")
    return ("WITH " + ",\n".join(blocks)
            + f"\nSELECT team, w FROM w{int(iters)}")


def chain_ladder(
    claims: "DataFrame",
    origin_col: str = "i",
    dev_col: str = "j",
    amount_col: str = "x",
    ages: int = 5,
) -> "DataFrame":
    """Chain-ladder loss development (Mack 1993 deterministic core, public
    literature), EXACT: cumulative run-off triangle C[i,j] (observed for
    i + j < ages), volume-weighted development factors
    f_j = sum_i C[i,j+1] / sum_i C[i,j] kept as integer (num, den) pairs,
    and each origin's ultimate projected by the unrolled floor-division
    chain C <- (C * num_j) div den_j from its latest age to the last —
    the reserving primitive of actuarial triangles with no FP anywhere.

    Output: (i, latest, ultimate) per origin plus the factor table is
    recoverable from the sums; keep amounts quantized so
    C * num < 2^63 (documented bound).

    Scale shape: one cumulative window over the triangle + one tiny
    factor aggregation broadcast into a fixed CASE projection chain."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    A = int(ages)
    b = claims.select(
        F.col(origin_col).cast("long").alias("i"),
        F.col(dev_col).cast("long").alias("j"),
        F.col(amount_col).cast("long").alias("x"),
    ).filter((F.col("i") + F.col("j")) < A)
    inc = b.groupBy("i", "j").agg(F.sum("x").alias("inc"))
    wc = Window.partitionBy("i").orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = inc.withColumn("c", F.sum("inc").over(wc))
    nxt = cum.select(F.col("i"), (F.col("j") - 1).alias("j"),
                     F.col("c").alias("cn"))
    fac = (
        cum.join(nxt, ["i", "j"])
        .filter(F.col("i") + F.col("j") < A - 1)
        .groupBy("j")
        .agg(F.sum("cn").alias("num"), F.sum("c").alias("den"))
        .orderBy("j")
        .collect()
    )
    f = {int(r["j"]): (int(r["num"]), int(r["den"])) for r in fac}
    latest = cum.filter(F.col("i") + F.col("j") == A - 1).select(
        "i", F.col("j").alias("jl"), F.col("c").alias("latest")
    )
    out = latest
    prev = "latest"
    for j in range(A - 1):
        num, den = f.get(j, (1, 1))
        col = F.when(F.col("jl") <= j,
                     F.expr(f"({prev} * {num}) div {den}")
                     ).otherwise(F.col(prev))
        out = out.withColumn(f"u{j}", col.cast("long"))
        prev = f"u{j}"
    return out.select("i", "latest", F.col(prev).alias("ultimate"))


def chain_ladder_sql(base_select: str, origin_col: str = "i",
                     dev_col: str = "j", amount_col: str = "x",
                     ages: int = 5) -> str:
    """DuckDB twin of ``chain_ladder`` (factors as a CTE, the same
    unrolled floor-div projection chain, one CTE per development step)."""
    A = int(ages)
    steps = []
    for j in range(A - 1):
        src = "latest" if j == 0 else f"u{j - 1}"
        col = "latest" if j == 0 else "u"
        steps.append(f""",
u{j} AS (
  SELECT i, jl, latest,
         CASE WHEN jl <= {j}
              THEN ({col} * (SELECT num FROM fac WHERE j = {j}))
                   // (SELECT den FROM fac WHERE j = {j})
              ELSE {col} END AS u
  FROM {src})""")
    return f"""
WITH b AS (
  SELECT CAST({origin_col} AS BIGINT) AS i, CAST({dev_col} AS BIGINT) AS j,
         CAST({amount_col} AS BIGINT) AS x
  FROM ({base_select}) s WHERE {origin_col} + {dev_col} < {A}),
inc AS (SELECT i, j, sum(x) AS inc FROM b GROUP BY 1, 2),
cum AS (
  SELECT i, j, sum(inc) OVER (PARTITION BY i ORDER BY j
         ROWS UNBOUNDED PRECEDING) AS c
  FROM inc),
fac AS (
  SELECT a.j, sum(n.c) AS num, sum(a.c) AS den
  FROM cum a JOIN cum n ON n.i = a.i AND n.j = a.j + 1
  WHERE a.i + a.j < {A - 1}
  GROUP BY 1),
latest AS (
  SELECT i, j AS jl, c AS latest FROM cum WHERE i + j = {A - 1})
{''.join(steps)}
SELECT i, latest, u AS ultimate FROM u{A - 2}"""


def lww_set_merge(
    ops: "DataFrame",
    elem_col: str = "elem",
    ts_col: str = "ts",
    op_col: str = "is_add",
    replica_col: str = "replica",
) -> "DataFrame":
    """LWW-element-set CRDT merge (Shapiro et al. 2011, public
    literature): an element is present iff the lexicographically greatest
    (ts, add-bit, replica) operation is an add — add-biased tie-breaking,
    replica id as the final disambiguator, so ANY merge order of the op
    logs converges to this value (the CRDT convergence property the gate
    pins).  One packed-key max aggregation: pk = ts*2^24 + add*2^23 +
    replica (contract: ts < 2^39, replica < 2^23).

    Output: (elem, present, win_ts, win_replica)."""
    from pyspark.sql import functions as F

    pk = (
        F.col(ts_col).cast("long") * F.lit(1 << 24)
        + F.col(op_col).cast("long") * F.lit(1 << 23)
        + F.col(replica_col).cast("long")
    )
    return (
        ops.select(F.col(elem_col).alias("elem"), pk.alias("pk"))
        .groupBy("elem")
        .agg(F.max("pk").alias("w"))
        .select(
            "elem",
            (F.expr(f"(w div {1 << 23}) % 2") == 1).alias("present"),
            F.expr(f"w div {1 << 24}").alias("win_ts"),
            (F.col("w") % (1 << 23)).alias("win_replica"),
        )
    )


def lww_set_merge_sql(base_select: str, elem_col: str = "elem",
                      ts_col: str = "ts", op_col: str = "is_add",
                      replica_col: str = "replica") -> str:
    """DuckDB twin of ``lww_set_merge``."""
    return f"""
WITH b AS (
  SELECT {elem_col} AS elem,
         CAST({ts_col} AS BIGINT) * {1 << 24}
           + CAST({op_col} AS BIGINT) * {1 << 23}
           + CAST({replica_col} AS BIGINT) AS pk
  FROM ({base_select}) s),
m AS (SELECT elem, max(pk) AS w FROM b GROUP BY 1)
SELECT elem, (w // {1 << 23}) % 2 = 1 AS present,
       w // {1 << 24} AS win_ts, w % {1 << 23} AS win_replica
FROM m"""


def nelson_aalen(
    df: "DataFrame",
    t_col: str = "t",
    event_col: str = "e",
    q: int = 1 << 20,
) -> "DataFrame":
    """Nelson-Aalen cumulative hazard, exact: at each event time the
    increment d_t / n_t quantizes PER STEP as (d * q) div n (at-risk
    n = subjects with time >= t), and the cumulative sum of those
    integers is order-independent — the hazard-scale twin of the
    kaplan_meier life table.

    Output: (t, n_risk, d, c, na_q) per observed time."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.select(F.col(t_col).cast("long").alias("t"),
                  F.col(event_col).cast("long").alias("e"))
    per = b.groupBy("t").agg(
        F.count("*").alias("m"),
        F.sum("e").alias("d"),
        (F.count("*") - F.sum("e")).alias("c"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wr = Window.orderBy("t").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    d = per.withColumn("n_risk", F.sum("m").over(w))
    d = d.withColumn("inc", F.expr(f"(d * {int(q)}) div n_risk"))
    return d.withColumn("na_q", F.sum("inc").over(wr)).select(
        "t", "n_risk", "d", "c", "na_q"
    )


def nelson_aalen_sql(base_select: str, t_col: str = "t",
                     event_col: str = "e", q: int = 1 << 20) -> str:
    """DuckDB twin of ``nelson_aalen``."""
    return f"""
WITH b AS (
  SELECT CAST({t_col} AS BIGINT) AS t, CAST({event_col} AS BIGINT) AS e
  FROM ({base_select}) s),
per AS (
  SELECT t, count(*) AS m, sum(e) AS d, count(*) - sum(e) AS c
  FROM b GROUP BY 1),
r AS (
  SELECT t, d, c,
         sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n_risk
  FROM per),
i AS (SELECT t, n_risk, d, c, (d * {int(q)}) // n_risk AS inc FROM r)
SELECT t, n_risk, d, c,
       sum(inc) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS na_q
FROM i"""


def lorenz_deciles(
    df: "DataFrame",
    group_col: str,
    value_col: str,
) -> "DataFrame":
    """Lorenz curve at decile resolution per group, exact: rows ranked by
    (value, stable id-free tie within equal values is safe because equal
    values contribute equal mass), decile = ntile(10), emits cumulative
    mass numerators against the group total — the inequality-curve
    companion of the `gini` gate, all int64 rationals.

    Output: (g, decile, n, cum_x, tot_x)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.select(F.col(group_col).alias("g"),
                  F.col(value_col).cast("long").alias("x"))
    w = Window.partitionBy("g").orderBy("x")
    d = b.withColumn("dec", F.ntile(10).over(w))
    per = d.groupBy("g", "dec").agg(
        F.count("*").alias("n"), F.sum("x").alias("sx")
    )
    wc = Window.partitionBy("g").orderBy("dec").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("g")
    return per.select(
        "g", F.col("dec").cast("long").alias("decile"), "n",
        F.sum("sx").over(wc).alias("cum_x"),
        F.sum("sx").over(wt).alias("tot_x"),
    )


def lorenz_deciles_sql(base_select: str, group_col: str,
                       value_col: str) -> str:
    """DuckDB twin of ``lorenz_deciles`` (ntile semantics agree — the
    window_rank gate pins that)."""
    return f"""
WITH b AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS x
  FROM ({base_select}) s),
d AS (SELECT g, x, ntile(10) OVER (PARTITION BY g ORDER BY x) AS dec FROM b),
per AS (SELECT g, dec, count(*) AS n, sum(x) AS sx FROM d GROUP BY 1, 2)
SELECT g, CAST(dec AS BIGINT) AS decile, n,
       sum(sx) OVER (PARTITION BY g ORDER BY dec
                     ROWS UNBOUNDED PRECEDING) AS cum_x,
       sum(sx) OVER (PARTITION BY g) AS tot_x
FROM per"""


def ks_pairs(
    df: "DataFrame",
    group_col: str = "g",
    value_col: str = "x",
    pairs: list = None,
) -> "DataFrame":
    """Pairwise two-sample Kolmogorov-Smirnov statistics, EXACT: for each
    group pair the statistic max |F_a - F_b| is computed as the integer
    max of |cumA * nB - cumB * nA| over the union of observed values
    (cross-multiplied ECDFs — no division), with the smallest achieving x
    reported.  The distribution-drift matrix across corpus slices.

    Output: (a, b, d_num, n_a, n_b, at_x) with D = d_num / (n_a * n_b).

    Scale shape: per pair one union + two running-sum windows + one
    argmax — pairs are slice-metadata-sized, values stay distributed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cnt = df.select(
        F.col(group_col).alias("g"), F.col(value_col).cast("long").alias("x")
    ).groupBy("g", "x").agg(F.count("*").alias("c"))
    tot = {r["g"]: int(r["n"]) for r in
           cnt.groupBy("g").agg(F.sum("c").alias("n")).collect()}
    out = None
    for a, b in pairs:
        u = (
            cnt.filter(F.col("g") == a).select("x", F.col("c").alias("ca"))
            .join(
                cnt.filter(F.col("g") == b).select("x", F.col("c").alias("cb")),
                "x", "full",
            )
            .fillna(0, ["ca", "cb"])
        )
        w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)
        d = u.select(
            "x",
            (F.sum("ca").over(w) * tot[b] - F.sum("cb").over(w) * tot[a])
            .alias("diff"),
        ).select("x", F.abs(F.col("diff")).alias("ad"))
        pick = Window.orderBy(F.col("ad").desc(), "x")
        row = (
            d.withColumn("pk", F.row_number().over(pick))
            .filter(F.col("pk") == 1)
            .select(
                F.lit(a).alias("a"), F.lit(b).alias("b"),
                F.col("ad").alias("d_num"),
                F.lit(tot[a]).cast("long").alias("n_a"),
                F.lit(tot[b]).cast("long").alias("n_b"),
                F.col("x").alias("at_x"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def ks_pairs_sql(base_select: str, group_col: str = "g",
                 value_col: str = "x", pairs: list = None) -> str:
    """DuckDB twin of ``ks_pairs``."""
    blocks = []
    for a, b in pairs:
        blocks.append(f"""
SELECT '{a}' AS a, '{b}' AS b, ad AS d_num,
       (SELECT count(*) FROM ({base_select}) t WHERE {group_col} = '{a}') AS n_a,
       (SELECT count(*) FROM ({base_select}) t WHERE {group_col} = '{b}') AS n_b,
       x AS at_x
FROM (
  SELECT x, ad, row_number() OVER (ORDER BY ad DESC, x) AS pk
  FROM (
    SELECT x,
           abs(sum(ca) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                 * (SELECT count(*) FROM ({base_select}) t WHERE {group_col} = '{b}')
               - sum(cb) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                 * (SELECT count(*) FROM ({base_select}) t WHERE {group_col} = '{a}')) AS ad
    FROM (
      SELECT coalesce(pa.x, pb.x) AS x, coalesce(pa.c, 0) AS ca,
             coalesce(pb.c, 0) AS cb
      FROM (SELECT CAST({value_col} AS BIGINT) AS x, count(*) AS c
            FROM ({base_select}) t WHERE {group_col} = '{a}' GROUP BY 1) pa
      FULL JOIN (SELECT CAST({value_col} AS BIGINT) AS x, count(*) AS c
            FROM ({base_select}) t WHERE {group_col} = '{b}' GROUP BY 1) pb
        ON pb.x = pa.x) u) dd) r
WHERE pk = 1""")
    return " UNION ALL ".join(blocks)


def julian_day_exprs(y: str, m: str, d: str, div_op: str) -> dict:
    """Julian day number + inverse + weekday as pure positive-operand
    integer arithmetic (Fliegel & Van Flandern 1968 rewritten so every
    division has nonnegative operands — floor == truncate, so Spark's
    `div` and DuckDB's `//` agree).  Returns {jdn, dow, ry, rm, rd} SQL
    texts; the roundtrip (ry, rm, rd) re-derives the date from jdn."""
    o = div_op
    a = f"((14 - ({m})){o}12)"
    y2 = f"(({y}) + 4800 - {a})"
    m2 = f"(({m}) + 12 * {a} - 3)"
    jdn = (f"(({d}) + ((153 * {m2} + 2){o}5) + 365 * {y2} + ({y2}{o}4) "
           f"- ({y2}{o}100) + ({y2}{o}400) - 32045)")
    # inverse (Richards / FVF, positive operands throughout)
    aa = f"(({jdn}) + 32044)"
    b = f"((4 * {aa} + 3){o}146097)"
    c = f"({aa} - ((146097 * {b}){o}4))"
    dd = f"((4 * {c} + 3){o}1461)"
    e = f"({c} - ((1461 * {dd}){o}4))"
    mm = f"((5 * {e} + 2){o}153)"
    rd = f"({e} - ((153 * {mm} + 2){o}5) + 1)"
    rm = f"({mm} + 3 - 12 * ({mm}{o}10))"
    ry = f"(100 * {b} + {dd} - 4800 + ({mm}{o}10))"
    dow = f"((({jdn}) + 1) % 7)"
    return {"jdn": jdn, "dow": dow, "ry": ry, "rm": rm, "rd": rd}


def easter_exprs(y: str, div_op: str) -> tuple:
    """Gregorian Easter Sunday (the Anonymous Gregorian / Meeus
    algorithm, public) as pure integer arithmetic — returns
    (month_sql, day_sql); all divisions have nonnegative operands."""
    o = div_op
    a = f"(({y}) % 19)"
    b = f"(({y}){o}100)"
    c = f"(({y}) % 100)"
    dd = f"({b}{o}4)"
    e = f"({b} % 4)"
    f_ = f"(({b} + 8){o}25)"
    g = f"(({b} - {f_} + 1){o}3)"
    h = f"((19 * {a} + {b} - {dd} - {g} + 15) % 30)"
    i = f"({c}{o}4)"
    k = f"({c} % 4)"
    l = f"((32 + 2 * {e} + 2 * {i} - {h} - {k}) % 7)"
    mth = f"((({a} + 11 * {h} + 22 * {l}){o}451))"
    month = f"(({h} + {l} - 7 * {mth} + 114){o}31)"
    day = f"((({h} + {l} - 7 * {mth} + 114) % 31) + 1)"
    return month, day


def pareto_point(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    share_num: int = 4,
    share_den: int = 5,
) -> "DataFrame":
    """Pareto concentration point per group, exact: the smallest k such
    that the top-k values (DESC, stable by value then arbitrary-but-
    mass-neutral ties) hold at least share_num/share_den of the total —
    compared by cross-multiplication (cum * den >= total * num), no
    division.  The 80/20 diagnostic over `lorenz`/`gini`.

    Output: (g, n, total, k, cum_at_k)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.select(F.col(group_col).alias("g"),
                  F.col(value_col).cast("long").alias("x"))
    w = Window.partitionBy("g").orderBy(F.col("x").desc())
    wt = Window.partitionBy("g")
    d = (
        b.withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("cum", F.sum("x").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", F.sum("x").over(wt))
        .withColumn("n", F.count(F.lit(1)).over(wt).cast("long"))
    )
    hit = d.filter(
        F.col("cum") * int(share_den) >= F.col("tot") * int(share_num)
    )
    pick = Window.partitionBy("g").orderBy("rk")
    return (
        hit.withColumn("pk", F.row_number().over(pick))
        .filter(F.col("pk") == 1)
        .select("g", "n", F.col("tot").alias("total"),
                F.col("rk").alias("k"), F.col("cum").alias("cum_at_k"))
    )


def pareto_point_sql(base_select: str, group_col: str, value_col: str,
                     share_num: int = 4, share_den: int = 5) -> str:
    """DuckDB twin of ``pareto_point``."""
    return f"""
WITH b AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS x
  FROM ({base_select}) s),
d AS (
  SELECT g, x,
         CAST(row_number() OVER (PARTITION BY g ORDER BY x DESC) AS BIGINT) AS rk,
         sum(x) OVER (PARTITION BY g ORDER BY x DESC
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(x) OVER (PARTITION BY g) AS tot,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM b)
SELECT g, n, tot AS total, rk AS k, cum AS cum_at_k FROM (
  SELECT *, row_number() OVER (PARTITION BY g ORDER BY rk) AS pk
  FROM d WHERE cum * {int(share_den)} >= tot * {int(share_num)}) h
WHERE pk = 1"""


def log_rank(
    df: "DataFrame",
    t_col: str = "t",
    event_col: str = "e",
    group_col: str = "g",
    q: int = 1 << 20,
) -> "DataFrame":
    """Two-group log-rank test (Mantel 1966, public literature), exact:
    at each event time the observed-minus-expected deaths in group 1,
    O - E = d1 - d*n1/n, and the hypergeometric variance
    V = d*(n-d)*n1*n0 / (n^2*(n-1)), quantize PER TIME (the variance in
    TWO floor steps so every product stays under 2^63), and sum — order-independent int64; the z/chi2
    statistic is derivable downstream.  Completes the survival family
    next to kaplan_meier / nelson_aalen.

    Output: one row (n_times, oe_q, var_q)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(event_col).cast("long").alias("e"),
        F.col(group_col).cast("long").alias("grp"),
    )
    per = b.groupBy("t").agg(
        F.count("*").alias("m"),
        F.sum("e").alias("d"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("m1"),
        F.sum(F.when(F.col("grp") == 1, F.col("e")).otherwise(0)).alias("d1"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = (
        per.withColumn("n", F.sum("m").over(w))
        .withColumn("n1", F.sum("m1").over(w))
        .filter(F.col("d") > 0)
    )
    oe = F.expr(f"((d1 * n - d * n1) * {int(q)}) div n")
    # two-step floor quantization keeps every product under 2^63:
    # a = floor(d(n-d)q / (n(n-1))), v = floor(a*n1*n0 / n^2)
    var = F.expr(
        f"(((d * (n - d) * {int(q)}) div (n * greatest(n - 1, 1)))"
        f" * n1 * (n - n1)) div (n * n)"
    )
    return (
        r.select(oe.alias("oeq"), var.alias("vq"))
        .agg(F.count("*").alias("n_times"),
             F.sum("oeq").alias("oe_q"), F.sum("vq").alias("var_q"))
    )


def log_rank_sql(base_select: str, t_col: str = "t", event_col: str = "e",
                 group_col: str = "g", q: int = 1 << 20) -> str:
    """DuckDB twin of ``log_rank``."""
    return f"""
WITH b AS (
  SELECT CAST({t_col} AS BIGINT) AS t, CAST({event_col} AS BIGINT) AS e,
         CAST({group_col} AS BIGINT) AS grp
  FROM ({base_select}) s),
per AS (
  SELECT t, count(*) AS m, sum(e) AS d,
         sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS m1,
         sum(CASE WHEN grp = 1 THEN e ELSE 0 END) AS d1
  FROM b GROUP BY 1),
r AS (
  SELECT t, d, d1,
         sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n,
         sum(m1) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n1
  FROM per)
SELECT count(*) AS n_times,
       sum(((d1 * n - d * n1) * {int(q)}) // n) AS oe_q,
       sum((((d * (n - d) * {int(q)}) // (n * greatest(n - 1, 1)))
            * n1 * (n - n1)) // (n * n)) AS var_q
FROM r WHERE d > 0"""


def ltv_curves(
    df: "DataFrame",
    cohort_col: str = "cohort",
    age_col: str = "age",
    revenue_col: str = "rev",
) -> "DataFrame":
    """Cohort lifetime-value curves: per (cohort, age) revenue and the
    running cumulative — the product-analytics layer over `retention`
    (same cohort keying, money instead of presence).  Exact integers,
    one aggregation + one window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per = df.groupBy(
        F.col(cohort_col).alias("cohort"), F.col(age_col).alias("age")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(revenue_col).cast("long")).alias("rev"),
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.withColumn("cum_rev", F.sum("rev").over(w))


def ltv_curves_sql(base_select: str, cohort_col: str = "cohort",
                   age_col: str = "age", revenue_col: str = "rev") -> str:
    """DuckDB twin of ``ltv_curves``."""
    return f"""
WITH per AS (
  SELECT {cohort_col} AS cohort, {age_col} AS age, count(*) AS n_events,
         sum(CAST({revenue_col} AS BIGINT)) AS rev
  FROM ({base_select}) s GROUP BY 1, 2)
SELECT cohort, age, n_events, rev,
       sum(rev) OVER (PARTITION BY cohort ORDER BY age
                      ROWS UNBOUNDED PRECEDING) AS cum_rev
FROM per"""


def perceptron_epoch(
    df: "DataFrame",
    key_col: str = "k",
    order_col: str = "o",
    x1_col: str = "x1",
    x2_col: str = "x2",
    y_col: str = "y",
) -> "DataFrame":
    """One deterministic perceptron epoch per key (Rosenblatt 1958,
    public literature), EXACT: visiting rows in ``order_col`` order, on a
    margin violation y*(w.x + b) <= 0 update w += y*x, b += y — all
    integers, so the trajectory is a pure function of the stream.  The
    engine is one applyInPandas pass per key; the oracle advances a
    (w1, w2, b) state row per rank in a lockstep recursive CTE (the
    stay_points discipline).

    Output: (k, n, n_updates, w1, w2, b)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    word = Window.partitionBy(key_col).orderBy(order_col)
    b0 = df.select(
        F.col(key_col).alias("k"),
        F.col(x1_col).cast("long").alias("x1"),
        F.col(x2_col).cast("long").alias("x2"),
        F.col(y_col).cast("long").alias("y"),
        F.row_number().over(word).cast("long").alias("rn"),
    )

    def fn(key, pdf):
        pdf = pdf.sort_values("rn")
        w1 = w2 = bb = upd = 0
        for x1, x2, y in zip(pdf["x1"], pdf["x2"], pdf["y"]):
            x1, x2, y = int(x1), int(x2), int(y)
            if y * (w1 * x1 + w2 * x2 + bb) <= 0:
                w1 += y * x1
                w2 += y * x2
                bb += y
                upd += 1
        return pd.DataFrame([{
            "k": key[0], "n": int(len(pdf)), "n_updates": upd,
            "w1": w1, "w2": w2, "b": bb,
        }])

    return b0.groupBy("k").applyInPandas(
        fn, "k long, n long, n_updates long, w1 long, w2 long, b long"
    )


def perceptron_epoch_sql(
    base_select: str,
    key_col: str = "k",
    order_col: str = "o",
    x1_col: str = "x1",
    x2_col: str = "x2",
    y_col: str = "y",
) -> str:
    """DuckDB twin of ``perceptron_epoch`` (lockstep recursive CTE)."""
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT {key_col} AS k, CAST({x1_col} AS BIGINT) AS x1,
         CAST({x2_col} AS BIGINT) AS x2, CAST({y_col} AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s),
st AS (
  SELECT k, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS w1,
         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS bb,
         CAST(0 AS BIGINT) AS upd
  FROM (SELECT DISTINCT k FROM b) u
  UNION ALL
  SELECT r.k, r.rn + 1,
         r.w1 + CASE WHEN q.y * (r.w1 * q.x1 + r.w2 * q.x2 + r.bb) <= 0
                     THEN q.y * q.x1 ELSE 0 END,
         r.w2 + CASE WHEN q.y * (r.w1 * q.x1 + r.w2 * q.x2 + r.bb) <= 0
                     THEN q.y * q.x2 ELSE 0 END,
         r.bb + CASE WHEN q.y * (r.w1 * q.x1 + r.w2 * q.x2 + r.bb) <= 0
                     THEN q.y ELSE 0 END,
         r.upd + CASE WHEN q.y * (r.w1 * q.x1 + r.w2 * q.x2 + r.bb) <= 0
                      THEN 1 ELSE 0 END
  FROM st r JOIN b q ON q.k = r.k AND q.rn = r.rn + 1)
SELECT st.k, st.rn AS n, st.upd AS n_updates, st.w1, st.w2, st.bb AS b
FROM st JOIN (SELECT k, max(rn) AS mx FROM b GROUP BY 1) m
  ON m.k = st.k AND m.mx = st.rn"""


def jdn_expr(y: str, m: str, d: str, div_op: str) -> str:
    """Julian day number of a Gregorian date (positive-operand rewrite,
    floor == truncate — the julian_day_exprs core, exposed for
    composition)."""
    o = div_op
    a = f"((14 - ({m})){o}12)"
    y2 = f"(({y}) + 4800 - {a})"
    m2 = f"(({m}) + 12 * {a} - 3)"
    return (f"(({d}) + ((153 * {m2} + 2){o}5) + 365 * {y2} + ({y2}{o}4) "
            f"- ({y2}{o}100) + ({y2}{o}400) - 32045)")


def jdn_inverse_exprs(jdn: str, div_op: str) -> tuple:
    """(year, month, day) SQL texts for an arbitrary JDN expression
    (Richards/FVF inverse, positive operands)."""
    o = div_op
    aa = f"(({jdn}) + 32044)"
    b = f"((4 * {aa} + 3){o}146097)"
    c = f"({aa} - ((146097 * {b}){o}4))"
    dd = f"((4 * {c} + 3){o}1461)"
    e = f"({c} - ((1461 * {dd}){o}4))"
    mm = f"((5 * {e} + 2){o}153)"
    rd = f"({e} - ((153 * {mm} + 2){o}5) + 1)"
    rm = f"({mm} + 3 - 12 * ({mm}{o}10))"
    ry = f"(100 * {b} + {dd} - 4800 + ({mm}{o}10))"
    return ry, rm, rd


def iso_week_exprs(jdn_col: str, div_op: str) -> dict:
    """ISO-8601 week date from a JDN COLUMN (keep the input a named
    column — the inverse expands the jdn text several times): iso weekday
    1..7 (JDN mod 7 == 0 is a Monday), the week's THURSDAY anchors the
    ISO year, and the week number counts Thursdays since that year's
    Jan 1.  Returns {dow_iso, iso_year, week} SQL texts."""
    o = div_op
    dow = f"((({jdn_col}) % 7) + 1)"
    th = f"(({jdn_col}) + 4 - {dow})"
    iy, _, _ = jdn_inverse_exprs(th, o)
    jan1 = jdn_expr(iy, "1", "1", o)
    week = f"((({th} - {jan1}){o}7) + 1)"
    return {"dow_iso": dow, "iso_year": iy, "week": week}


_SHAPLEY_CHANNELS = ("click", "view", "signup", "error")


def _shapley_psi_table(n: int = 4):
    """psi[i][mask] = 24 * Shapley contribution of channel i for a
    conversion whose prior-touch channel set is ``mask`` (bitmask over n
    channels), for the coverage game v(S) = [mask intersects S]:
    phi_i = sum over S not containing i of |S|!(n-1-|S|)!/n! *
    (v(S+i) - v(S)) — exact integers after the n! scaling."""
    from itertools import combinations
    from math import factorial

    fact = factorial
    out = {}
    chans = list(range(n))
    for i in chans:
        rest = [c for c in chans if c != i]
        for mask in range(1 << n):
            tot = 0
            for r in range(n):
                for S in combinations(rest, r):
                    w = fact(r) * fact(n - 1 - r)
                    vs = 1 if any(mask >> c & 1 for c in S) else 0
                    vsi = 1 if (mask >> i & 1) or vs else 0
                    tot += w * (vsi - vs)
            out[(i, mask)] = tot
    return out


def shapley_attribution(events: "DataFrame") -> "DataFrame":
    """Exact Shapley-value marketing attribution (Shapley 1953; the
    coalition game over touch channels, public literature): for each
    user, each conversion's credit splits across the four touch channels
    by the exact Shapley formula of the coverage game
    v(S) = [some prior touch is in S].  The per-conversion contribution
    depends ONLY on the 4-bit mask of previously-seen channels, so the
    whole computation is four prior-presence windows + one 64-entry
    lookup + one aggregation — no subset enumeration at runtime.

    Input: (user_id, event_id, event_type).  Output: (user_id, channel,
    phi24) with phi24 = 24 * Shapley value (integer; sum over channels =
    24 * attributed conversions).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    word = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    d = events.select("user_id", "event_id", "event_type")
    for b, ch in enumerate(_SHAPLEY_CHANNELS):
        d = d.withColumn(
            f"f{b}",
            F.coalesce(
                F.max((F.col("event_type") == ch).cast("long")).over(word),
                F.lit(0),
            ),
        )
    mask = sum(F.col(f"f{b}") * (1 << b) for b in range(4))
    purch = d.filter(F.col("event_type") == "purchase").withColumn(
        "mask", mask.cast("long")
    )
    psi = _shapley_psi_table()
    arms = " ".join(
        f"WHEN {i * 16 + m} THEN {psi[(i, m)]}"
        for i in range(4) for m in range(16)
    )
    ex = purch.select(
        "user_id", "mask",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("ci"),
    ).withColumn(
        "psi", F.expr(f"CASE ci * 16 + mask {arms} END").cast("long")
    )
    chan = F.expr(
        "CASE ci " + " ".join(
            f"WHEN {i} THEN '{c}'" for i, c in enumerate(_SHAPLEY_CHANNELS)
        ) + " END"
    )
    return (
        ex.groupBy("user_id", chan.alias("channel"))
        .agg(F.sum("psi").alias("phi24"))
    )


def shapley_attribution_sql(events_select: str) -> str:
    """DuckDB twin of ``shapley_attribution``."""
    psi = _shapley_psi_table()
    arms = " ".join(
        f"WHEN {i * 16 + m} THEN {psi[(i, m)]}"
        for i in range(4) for m in range(16)
    )
    flags = ", ".join(
        f"coalesce(max(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) "
        f"OVER (PARTITION BY user_id ORDER BY event_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f{b}"
        for b, ch in enumerate(_SHAPLEY_CHANNELS)
    )
    chan = ("CASE ci.ci " + " ".join(
        f"WHEN {i} THEN '{c}'" for i, c in enumerate(_SHAPLEY_CHANNELS)
    ) + " END")
    return f"""
WITH d AS (
  SELECT user_id, event_id, event_type, {flags}
  FROM ({events_select}) e),
p AS (
  SELECT user_id, f0 + 2 * f1 + 4 * f2 + 8 * f3 AS mask
  FROM d WHERE event_type = 'purchase'),
ex AS (
  SELECT user_id, {chan} AS channel,
         CASE ci.ci * 16 + p.mask {arms} END AS psi
  FROM p, (SELECT unnest(range(4)) AS ci) ci)
SELECT user_id, channel, sum(psi) AS phi24
FROM ex GROUP BY 1, 2"""


def prime_sieve(spark, n: int = 100000, bucket: int = 10000) -> "DataFrame":
    """Distributed sieve of Eratosthenes as pure relational algebra:
    composites = the distinct exploded multiples p*k (p <= sqrt(n),
    k >= p), primes = candidates ANTI-JOINED against them; reported as
    per-bucket counts + position-weighted checksums (number-theoretic
    test-data generation and a classic anti-join stress).

    Scale shape: the multiple explosion is sum over p of n/p ~ n ln ln n
    rows — one distinct + one anti-join; buckets keep the output
    metadata-sized."""
    from pyspark.sql import functions as F

    root = int(n ** 0.5) + 1
    cands = spark.range(2, n + 1).select(F.col("id").alias("v"))
    ps = spark.range(2, root + 1).select(F.col("id").alias("p"))
    comps = ps.select(
        "p",
        F.explode(F.sequence(F.col("p"),
                             (F.lit(int(n)) / F.col("p")).cast("long"))).alias("k"),
    ).select((F.col("p") * F.col("k")).alias("v")).distinct()
    primes = cands.join(comps, "v", "left_anti")
    return (
        primes.groupBy(F.expr(f"v div {int(bucket)}").alias("bucket"))
        .agg(
            F.count("*").alias("n_primes"),
            F.sum("v").alias("sum_primes"),
            F.max("v").alias("max_prime"),
        )
    )


def prime_sieve_sql(n: int = 100000, bucket: int = 10000) -> str:
    """DuckDB twin of ``prime_sieve``."""
    root = int(n ** 0.5) + 1
    return f"""
WITH cands AS (SELECT unnest(range(2, {int(n)} + 1)) AS v),
ps AS (SELECT unnest(range(2, {root} + 1)) AS p),
comps AS (
  SELECT DISTINCT p * k AS v
  FROM ps, LATERAL (SELECT unnest(range(p, {int(n)} // p + 1)) AS k) kk
  WHERE k >= p),
primes AS (
  SELECT v FROM cands WHERE NOT EXISTS (
    SELECT 1 FROM comps c WHERE c.v = cands.v))
SELECT v // {int(bucket)} AS bucket, count(*) AS n_primes,
       sum(v) AS sum_primes, max(v) AS max_prime
FROM primes GROUP BY 1"""


def round_robin_schedule(spark, n_teams: int = 14) -> "DataFrame":
    """Circle-method round-robin schedule (the classic single round-robin
    construction, public combinatorics): team n-1 is the pivot; in round
    r it meets team r, and slot k in 1..n/2-1 pairs
    (r + k) mod (n-1) against (r - k) mod (n-1) — every pair meets
    exactly once across n-1 rounds.  Emitted with home = the smaller id
    (canonical).  Pure closed-form arithmetic, generated distributed from
    one range.

    Output: (round, slot, home, away)."""
    from pyspark.sql import functions as F

    n = int(n_teams)
    assert n % 2 == 0
    m = n - 1
    base = spark.range(m * (n // 2)).select(
        (F.col("id") / (n // 2)).cast("long").alias("round"),
        (F.col("id") % (n // 2)).cast("long").alias("slot"),
    )
    a = F.when(F.col("slot") == 0, F.lit(m)).otherwise(
        (F.col("round") + F.col("slot")) % m
    )
    b = F.when(F.col("slot") == 0, F.col("round")).otherwise(
        ((F.col("round") - F.col("slot")) % m + m) % m
    )
    return base.select(
        "round", "slot",
        F.least(a, b).alias("home"), F.greatest(a, b).alias("away"),
    )


def round_robin_sql(n_teams: int = 14) -> str:
    """DuckDB twin of ``round_robin_schedule``."""
    n = int(n_teams)
    m = n - 1
    h = n // 2
    return f"""
WITH base AS (
  SELECT i // {h} AS round, i % {h} AS slot
  FROM (SELECT unnest(range({m * h})) AS i) t),
p AS (
  SELECT round, slot,
         CASE WHEN slot = 0 THEN {m} ELSE (round + slot) % {m} END AS a,
         CASE WHEN slot = 0 THEN round
              ELSE ((round - slot) % {m} + {m}) % {m} END AS b
  FROM base)
SELECT round, slot, least(a, b) AS home, greatest(a, b) AS away
FROM p"""


def inventory_policy(
    df: "DataFrame",
    s_low: int = 20,
    s_high: int = 60,
    key_col: str = "item",
    order_col: str = "t",
    demand_col: str = "dem",
) -> "DataFrame":
    """(s, S) inventory-policy replay, exact: starting at S, each period
    ships min(on_hand, demand) (lost sales, no backorders); when the
    remaining stock drops below s, an order refills to S at the period
    end (zero lead time — the textbook base case).  Sequential by
    nature: the engine folds per key in one applyInPandas pass, the
    oracle advances (on_hand, orders, lost) per period in a lockstep
    recursive CTE.

    Output: (key, n_periods, end_on_hand, n_orders, total_lost,
    total_shipped)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    word = Window.partitionBy(key_col).orderBy(order_col)
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(demand_col).cast("long").alias("dem"),
        F.row_number().over(word).cast("long").alias("rn"),
    )

    def fn(key, pdf):
        pdf = pdf.sort_values("rn")
        oh, orders, lost, shipped = int(s_high), 0, 0, 0
        for dem in pdf["dem"]:
            dem = int(dem)
            ship = min(oh, dem)
            shipped += ship
            lost += dem - ship
            oh -= ship
            if oh < s_low:
                orders += 1
                oh = int(s_high)
        return pd.DataFrame([{
            "k": key[0], "n_periods": int(len(pdf)), "end_on_hand": oh,
            "n_orders": orders, "total_lost": lost,
            "total_shipped": shipped,
        }])

    return b.groupBy("k").applyInPandas(
        fn, "k long, n_periods long, end_on_hand long, n_orders long, "
            "total_lost long, total_shipped long"
    )


def inventory_policy_sql(
    base_select: str,
    s_low: int = 20,
    s_high: int = 60,
    key_col: str = "item",
    order_col: str = "t",
    demand_col: str = "dem",
) -> str:
    """DuckDB twin of ``inventory_policy`` (lockstep recursive CTE)."""
    S, s = int(s_high), int(s_low)
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT {key_col} AS k, CAST({demand_col} AS BIGINT) AS dem,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) q),
st AS (
  SELECT k, CAST(0 AS BIGINT) AS rn, CAST({S} AS BIGINT) AS oh,
         CAST(0 AS BIGINT) AS orders, CAST(0 AS BIGINT) AS lost,
         CAST(0 AS BIGINT) AS shipped
  FROM (SELECT DISTINCT k FROM b) u
  UNION ALL
  SELECT r.k, r.rn + 1,
         CASE WHEN r.oh - least(r.oh, q.dem) < {s} THEN {S}
              ELSE r.oh - least(r.oh, q.dem) END,
         r.orders + CASE WHEN r.oh - least(r.oh, q.dem) < {s}
                         THEN 1 ELSE 0 END,
         r.lost + q.dem - least(r.oh, q.dem),
         r.shipped + least(r.oh, q.dem)
  FROM st r JOIN b q ON q.k = r.k AND q.rn = r.rn + 1)
SELECT st.k, st.rn AS n_periods, st.oh AS end_on_hand,
       st.orders AS n_orders, st.lost AS total_lost,
       st.shipped AS total_shipped
FROM st JOIN (SELECT k, max(rn) AS mx FROM b GROUP BY 1) m
  ON m.k = st.k AND m.mx = st.rn"""


def adstock(
    df: "DataFrame",
    window: int = 10,
    key_col: str = "channel",
    order_col: str = "t",
    x_col: str = "x",
) -> "DataFrame":
    """Geometric adstock (the media-mix carryover transform, public
    marketing-science literature) with half-life decay lambda = 1/2 and
    a ``window``-period memory, EXACT: adstock_t * 2^(window-1) =
    sum_{j=0..w-1} x_{t-j} * 2^(w-1-j) — a single window sum of
    power-of-two-weighted lags, all integers (the dyadic decay makes the
    transform closed-form; no recurrence).

    Output: (key, order, x, adstock_q) with adstock = adstock_q /
    2^(window-1)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = int(window)
    word = Window.partitionBy(key_col).orderBy(order_col)
    d = df.select(key_col, order_col, F.col(x_col).cast("long").alias("x"))
    acc = None
    for j in range(w):
        term = F.coalesce(F.lag("x", j).over(word), F.lit(0)) * (1 << (w - 1 - j))
        acc = term if acc is None else acc + term
    return d.withColumn("adstock_q", acc.cast("long"))


def adstock_sql(
    base_select: str,
    window: int = 10,
    key_col: str = "channel",
    order_col: str = "t",
    x_col: str = "x",
) -> str:
    """DuckDB twin of ``adstock``."""
    w = int(window)
    terms = " + ".join(
        f"coalesce(lag(x, {j}) OVER (PARTITION BY {key_col} "
        f"ORDER BY {order_col}), 0) * {1 << (w - 1 - j)}"
        for j in range(w)
    )
    return f"""
WITH b AS (
  SELECT {key_col}, {order_col}, CAST({x_col} AS BIGINT) AS x
  FROM ({base_select}) s)
SELECT {key_col}, {order_col}, x, {terms} AS adstock_q
FROM b"""


def erlang_b_steps(div_op: str, c: int, scale: int = 1 << 20) -> list:
    """Erlang-B blocking by the standard recursion
    B_c = a*B_{c-1} / (c + a*B_{c-1}) (Erlang 1917, public), DERANDOMIZED
    to integers at S = 2^20: t = (aq * b) div S ; b' = (t * S) div
    (k*S + t).  Returns [(t_k_sql, b_k_sql), ...] where each step
    references the PREVIOUS step's NAMED column b{k-1} — textual nesting
    (and even staged codegen columns, which Catalyst's projection
    collapse re-inlines) doubles the expression tree per step (t appears
    twice; the cell_compact janino lesson), so consumers must MATERIALIZE
    each stage or fold in an Arrow batch."""
    o = div_op
    S = int(scale)
    out = []
    for k in range(1, int(c) + 1):
        prev = str(S) if k == 1 else f"b{k - 1}"
        t = f"((aq * {prev}){o}{S})"
        b = f"((t{k} * {S}){o}({k} * {S} + t{k}))"
        out.append((t, b))
    return out


def abc_xyz(
    df: "DataFrame",
    item_col: str = "item",
    value_col: str = "v",
) -> "DataFrame":
    """ABC/XYZ inventory classification, exact: ABC from the revenue
    Pareto (an item is A while the cumulative share BEFORE it is under
    70%, B under 90%, else C — boundary items belong to the better
    class; cross-multiplied, no division) and XYZ from demand
    variability (population CV^2 = (n*sumsq - sum^2)/sum^2 compared
    against 1/16 and 1/4 by cross-multiplication).  The classic
    operations segmentation over `pareto_point`'s machinery.

    Output: (item, n, total_v, abc, xyz)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    per = df.groupBy(F.col(item_col).alias("item")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("s"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long"))
        .alias("sq"),
    )
    w = Window.orderBy(F.col("s").desc(), "item")
    wt = Window.partitionBy()
    d = (
        per.withColumn("cum", F.sum("s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", F.sum("s").over(wt))
        .withColumn("prev", F.col("cum") - F.col("s"))
    )
    abc = (
        F.when(F.col("prev") * 10 < F.col("tot") * 7, "A")
        .when(F.col("prev") * 10 < F.col("tot") * 9, "B")
        .otherwise("C")
    )
    varnum = F.col("n") * F.col("sq") - F.col("s") * F.col("s")
    xyz = (
        F.when(varnum * 16 <= F.col("s") * F.col("s"), "X")
        .when(varnum * 4 <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
    )
    return d.select("item", "n", F.col("s").alias("total_v"),
                    abc.alias("abc"), xyz.alias("xyz"))


def abc_xyz_sql(base_select: str, item_col: str = "item",
                value_col: str = "v") -> str:
    """DuckDB twin of ``abc_xyz``."""
    return f"""
WITH per AS (
  SELECT {item_col} AS item, count(*) AS n,
         sum(CAST({value_col} AS BIGINT)) AS s,
         sum(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)) AS sq
  FROM ({base_select}) b GROUP BY 1),
d AS (
  SELECT item, n, s, sq,
         sum(s) OVER (ORDER BY s DESC, item
                      ROWS UNBOUNDED PRECEDING) - s AS prev,
         sum(s) OVER () AS tot
  FROM per)
SELECT item, n, s AS total_v,
       CASE WHEN prev * 10 < tot * 7 THEN 'A'
            WHEN prev * 10 < tot * 9 THEN 'B' ELSE 'C' END AS abc,
       CASE WHEN (n * sq - s * s) * 16 <= s * s THEN 'X'
            WHEN (n * sq - s * s) * 4 <= s * s THEN 'Y'
            ELSE 'Z' END AS xyz
FROM d"""


def rmst(
    df: "DataFrame",
    t_col: str = "t",
    event_col: str = "e",
    tau: int = 40,
    scale: int = 1 << 20,
) -> "DataFrame":
    """Restricted mean survival time, derandomized: the KM survival is
    the floor-div chain S'_q = (S_q * (n - d)) div n stepped through the
    event times (exact integers — products of rationals would overflow,
    so each step floors at scale 2^20, a documented deterministic
    variant), and RMST(tau) = sum of S_q * (step width truncated at tau)
    — the area under the survival curve.  One tiny applyInPandas fold
    over the (time, n, d) life table (<= distinct times rows); the
    oracle replays the chain in a lockstep recursive CTE.

    Output: one row (tau, n_times, rmst_q) with RMST = rmst_q / scale."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    S = int(scale)
    b = df.select(F.col(t_col).cast("long").alias("t"),
                  F.col(event_col).cast("long").alias("e"))
    per = b.groupBy("t").agg(F.count("*").alias("m"), F.sum("e").alias("d"))
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    life = per.withColumn("n", F.sum("m").over(w)).select("t", "n", "d")

    def fold(pdf):
        pdf = pdf.sort_values("t")
        sq, area, prev_t = S, 0, 0
        for t, n, d in zip(pdf["t"], pdf["n"], pdf["d"]):
            t, n, d = int(t), int(n), int(d)
            if prev_t >= tau:
                break
            width = min(t, tau) - prev_t
            area += sq * width
            sq = (sq * (n - d)) // n
            prev_t = min(t, tau)
        if prev_t < tau:
            area += sq * (tau - prev_t)
        return pd.DataFrame([{
            "tau": int(tau), "n_times": int(len(pdf)), "rmst_q": area,
        }])

    return life.repartition(1).mapInPandas(
        lambda it: iter([fold(pd.concat(list(it)))]),
        "tau long, n_times long, rmst_q long",
    )


def rmst_sql(base_select: str, t_col: str = "t", event_col: str = "e",
             tau: int = 40, scale: int = 1 << 20) -> str:
    """DuckDB twin of ``rmst`` (lockstep chain over time ranks)."""
    S = int(scale)
    T = int(tau)
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT CAST({t_col} AS BIGINT) AS t, CAST({event_col} AS BIGINT) AS e
  FROM ({base_select}) s),
per AS (SELECT t, count(*) AS m, sum(e) AS d FROM b GROUP BY 1),
life AS MATERIALIZED (
  SELECT t, d,
         sum(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n,
         CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rk
  FROM per),
st AS (
  SELECT CAST(0 AS BIGINT) AS rk, CAST({S} AS BIGINT) AS sq,
         CAST(0 AS BIGINT) AS area, CAST(0 AS BIGINT) AS prev_t
  UNION ALL
  SELECT l.rk,
         CASE WHEN r.prev_t >= {T} THEN r.sq
              ELSE (r.sq * (l.n - l.d)) // l.n END,
         CASE WHEN r.prev_t >= {T} THEN r.area
              ELSE r.area + r.sq * (least(l.t, {T}) - r.prev_t) END,
         CASE WHEN r.prev_t >= {T} THEN r.prev_t
              ELSE least(l.t, {T}) END
  FROM st r JOIN life l ON l.rk = r.rk + 1)
SELECT {T} AS tau, (SELECT max(rk) FROM life) AS n_times,
       area + CASE WHEN prev_t < {T} THEN sq * ({T} - prev_t) ELSE 0 END
         AS rmst_q
FROM st WHERE rk = (SELECT max(rk) FROM life)"""
