"""Time-series alignment operators: as-of join, interval range join,
gap sessionization.

These extend the engine's Allen-interval temporal algebra
(operators/temporal.py, reference F/filter/TemporalFilter.java — the
``anyInteracts`` predicate is exactly the interval-overlap test range_join
distributes) with the three alignment shapes every event/training-data
pipeline needs and Spark lacks as built-ins:

* ``asof_join`` — for each left row (key, t) attach the latest right row
  with t_r <= t (optional staleness tolerance).  Implemented as the
  union + window formulation: ONE shuffle on the key, no driver state, no
  point-lookup loop — left and right are interleaved into a single keyed
  timeline and the match is ``last(value, ignorenulls)`` over the ordered
  window.  At 100 TB this is a single hash exchange + per-key sort; the
  per-key scan is inherent to as-of semantics (the window never holds more
  than the running carry in memory).
* ``range_join`` — pairs of intervals that overlap, without a cartesian
  product: intervals explode to fixed-width bins (pure codegen
  ``sequence``), candidates come from an equi-join on the bin, and each
  overlapping pair is emitted EXACTLY once — no distinct — by keeping only
  the bin containing max(start_a, start_b) (which lies inside both
  intervals whenever they overlap).  Shuffle is an equi-join on
  (keys..., bin); bin width trades candidate fan-out (too wide) against
  explode fan-out (too narrow) — choose ~ the median interval length.
* ``sessionize`` — gap-based session ids via lag + running sum over a
  keyed window (the batch analog of Spark's streaming session windows,
  and the standard event-log preprocessing step).

All three are whole-JVM plans (window/codegen only, no Python workers) and
each is oracle-gated in queries.py (DuckDB ASOF JOIN / non-equi join / SQL
windows respectively).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: Column | None = None,
    how: str = "left",
    prefix: str = "r_",
) -> DataFrame:
    """Attach to every left row the most recent right row at-or-before it.

    For each left row the match is the right row with the greatest
    ``right_ts`` satisfying ``right_ts <= left_ts`` within the same key
    group (DuckDB/pandas ``ASOF JOIN`` semantics, inclusive).  Matched right
    columns arrive as ``{prefix}{col}`` plus ``{prefix}{right_ts}``.

    tolerance: optional Column in the timestamp's own difference algebra
    (e.g. ``F.expr("INTERVAL 5 MINUTES")`` for timestamps, a long for
    numeric ts); a match older than ``left_ts - tolerance`` is discarded
    (nulled for how='left', dropped for how='inner').

    how: 'left' keeps unmatched left rows with null match columns;
    'inner' drops them.

    Ties: a right row at exactly ``left_ts`` IS visible (<=).  Multiple
    right rows sharing (keys, right_ts) are ordered among themselves by the
    remaining value columns' arrival order — supply a unique tiebreak in
    ``value_cols`` and dedupe upstream if that matters.

    Plan shape: one Exchange (hashpartitioning on keys) + sort + Window;
    left/right scans feed a union, so column pruning reaches both sides.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    rts = prefix + right_ts
    carried = [rts] + [prefix + c for c in value_cols]

    rtypes = dict(right.dtypes)
    left_cols = list(left.columns)

    # Interleave both sides into one keyed timeline.  __side orders a right
    # row BEFORE a left row at the same timestamp, giving <= visibility.
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias(rts),
        *[F.col(c).alias(prefix + c) for c in value_cols],
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in keys],
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtypes[right_ts]).alias(rts),
        *[
            F.lit(None).cast(rtypes[c]).alias(prefix + c)
            for c in value_cols
        ],
        *[F.col(c) for c in left_cols if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r_side.unionByName(l_side)
        .select(
            "*",
            *[F.last(c, ignorenulls=True).over(w).alias("__m_" + c) for c in carried],
        )
        .filter(F.col("__side") == 1)
    )
    matched = F.col("__m_" + rts).isNotNull()
    if tolerance is not None:
        matched = matched & (F.col("__m_" + rts) >= F.col("__ts") - tolerance)
    out = joined.select(
        *keys,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols if c not in keys and c != left_ts],
        *[F.when(matched, F.col("__m_" + c)).alias(c) for c in carried],
    )
    if how == "inner":
        out = out.filter(F.col(rts).isNotNull())
    return out


def range_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Overlap join of closed intervals — [a_start,a_end] x [b_start,b_end]
    pairs with ``a_start <= b_end AND b_start <= a_end`` (TemporalFilter
    anyInteracts under the closed convention) — with NO cartesian product.

    Bounds must be integral (cast timestamps to ``unix_micros`` first);
    ``bin_width`` in the same units.  Each interval explodes to the bins it
    covers (codegen ``sequence``); candidates are the equi-join on
    (keys..., bin); the exact overlap predicate filters; and the pair is
    kept only in the bin of max(start_a, start_b) — a bin both sides
    provably cover when they overlap — so every pair appears exactly once
    without a distinct.

    Column names must be disjoint between a and b (alias upstream).
    """
    keys = keys or []
    dup = set(a.columns) & set(b.columns) - set(keys)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    wdt = F.lit(int(bin_width)).cast("long")

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s).cast("long") / wdt),
                    F.floor(F.col(e).cast("long") / wdt),
                )
            ),
        )

    ae = binned(a, a_start, a_end)
    be = binned(b, b_start, b_end).withColumnRenamed("__bin", "__bin_b")
    cond = [ae["__bin"] == be["__bin_b"]] + [ae[k] == be[k] for k in keys]
    anchor = F.floor(
        F.greatest(F.col(a_start).cast("long"), F.col(b_start).cast("long")) / wdt
    )
    out = (
        ae.join(be, cond, "inner")
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("__bin") == anchor)
        )
        .drop("__bin", "__bin_b")
    )
    for k in keys:  # both sides carried the key; keep one
        out = out.drop(be[k])
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap: Column | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Gap-based sessions: a new session starts at the first event of a key
    and whenever the gap since the previous event EXCEEDS ``gap`` (strict >,
    so events exactly ``gap`` apart share a session).  Adds ``out_col``, a
    0-based per-key session index.  gap defaults to 30 minutes.

    One shuffle on the key; lag + running sum in a single Window stage —
    the batch analog of Structured Streaming's session_window."""
    if gap is None:
        gap = F.expr("INTERVAL 30 MINUTES")
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col(ts) > prev + gap), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        Window.partitionBy(key)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, (F.sum(new_sess).over(run) - 1).cast("long"))


def session_stats(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    gap: Column | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """sessionize + per-session rollup: key, session_idx, n_events,
    first/last event time, plus caller aggregates."""
    aggs = aggs or []
    return (
        sessionize(df, key, ts, gap)
        .groupBy(key, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
            *aggs,
        )
    )


# ---------------------------------------------------------------- time windows (batch)
# The batch twins of Structured Streaming's tumbling/sliding windows
# (F.window): event-time bucketing aggregations.  Timestamps are
# microsecond-integer epochs in both engines, so bucket boundaries are
# exact integer arithmetic — no FP, no timezone (the stores keep naive UTC).

def tumbling_agg(events: DataFrame, width_s: int, time_col: str = "ts",
                 value_col: str = "value",
                 keys: tuple[str, ...] = ()) -> DataFrame:
    """Tumbling-window aggregate: one keyed aggregation (map-side combined),
    window start derived with F.window (the same operator Structured
    Streaming plans, minus the watermark).  Output: (keys..., w_start,
    n, total)."""
    win = F.window(F.col(time_col), f"{width_s} seconds")
    return (
        events.groupBy(*keys, win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)"))
                .alias("total_cents"),
        )
        .select(*keys, F.col("w.start").alias("w_start"), "n", "total_cents")
    )


def tumbling_agg_sql(width_s: int, rel: str = "events", time_col: str = "ts",
                     value_col: str = "value", keys: tuple[str, ...] = ()) -> str:
    ks = "".join(f"{k}, " for k in keys)
    grp = ", ".join(str(i + 1) for i in range(len(keys) + 1))
    return f"""
SELECT {ks}make_timestamp((epoch_us({time_col}) // {width_s * 1_000_000}) * {width_s * 1_000_000})
         AS w_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM {rel} GROUP BY {grp}"""


def sliding_agg(events: DataFrame, width_s: int, slide_s: int,
                time_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Sliding-window aggregate (width must be a multiple of slide): each
    event explodes into width/slide overlapping windows — F.window plans
    exactly this explode + keyed agg, all JVM-side.  Output: (w_start, n,
    total)."""
    win = F.window(F.col(time_col), f"{width_s} seconds", f"{slide_s} seconds")
    return (
        events.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(f"CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT)"))
                .alias("total_cents"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total_cents")
    )


def sliding_agg_sql(width_s: int, slide_s: int, rel: str = "events",
                    time_col: str = "ts", value_col: str = "value") -> str:
    """DuckDB twin: replicate the explode with a generate_series of slide
    offsets; a window starting at s covers the event iff s <= t < s + width.
    Spark's window set for event t: starts floor((t - width + slide)/slide)
    ... floor(t/slide) scaled — emitted here as the equivalent offset list."""
    k = width_s // slide_s
    us = 1_000_000
    return f"""
WITH ev AS (SELECT epoch_us({time_col}) AS tus,
            CAST(floor({value_col} * 100.0 + 0.5) AS BIGINT) AS v FROM {rel}),
x AS (
  SELECT ((tus // {slide_s * us}) - o.o) * {slide_s} AS start_s, v
  FROM ev, UNNEST(range(0, {k})) AS o(o)
  WHERE ((tus // {slide_s * us}) - o.o) * {slide_s * us} + {width_s * us} > tus
    AND ((tus // {slide_s * us}) - o.o) * {slide_s * us} <= tus)
SELECT make_timestamp(start_s * 1000000) AS w_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v) AS BIGINT) AS total_cents
FROM x GROUP BY 1"""


def ewma_int(
    df: DataFrame,
    num: int = 1,
    den: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Exponential moving average in EXACT integer arithmetic ->
    (user, rn, x, s): s_1 = x_1, s_t = floor((num*x_t +
    (den-num)*s_{t-1}) / den) with alpha = num/den rational and the
    division a true FLOOR division (floor_divide / posmod identity), so
    negative values cannot split engines on truncate-vs-floor.  One
    applyInPandas group per key (sequential recurrence, keys
    parallelize) — the stay_points execution shape."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.int64)
        s = np.zeros(len(x), dtype=np.int64)
        if len(x):
            s[0] = x[0]
            for t in range(1, len(x)):
                s[t] = np.floor_divide(num * x[t] + (den - num) * s[t - 1], den)
        out = pd.DataFrame({
            user_col: pdf[user_col].to_numpy(),
            "rn": np.arange(1, len(x) + 1, dtype=np.int64),
            "x": x,
            "s": s,
        })
        return out

    schema = f"{user_col} long, rn long, x long, s long"
    return df.groupBy(user_col).applyInPandas(fn, schema=schema)


def ewma_int_sql(
    base_select: str,
    num: int = 1,
    den: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay: rank per key, step the recurrence one rank per
    recursion round (all keys in lockstep), floor-div via the posmod
    identity."""
    rec = f"({num} * p.{value_col} + {den - num} * r.s)"
    return f"""
WITH RECURSIVE pts AS (
  SELECT {user_col}, {value_col},
         CAST(row_number() OVER (PARTITION BY {user_col}
                                 ORDER BY {ts_col}, {id_col}) AS BIGINT) AS rn
  FROM ({base_select}) b),
rec AS (
  SELECT {user_col}, rn, {value_col} AS x, CAST({value_col} AS BIGINT) AS s
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT p.{user_col}, p.rn, p.{value_col},
         ({rec} - ((({rec} % {den}) + {den}) % {den})) // {den}
  FROM rec r JOIN pts p ON p.{user_col} = r.{user_col} AND p.rn = r.rn + 1)
SELECT {user_col}, rn, CAST(x AS BIGINT) AS x, s FROM rec
"""


def holt_int(
    df: DataFrame,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) in EXACT integer
    arithmetic -> (user, rn, x, l, b): l_1 = x_1, b_1 = 0,
      l_t = floor((a_num*x_t + (a_den-a_num)*(l_{t-1}+b_{t-1})) / a_den)
      b_t = floor((b_num*(l_t-l_{t-1}) + (b_den-b_num)*b_{t-1}) / b_den)
    with alpha = a_num/a_den, beta = b_num/b_den rational and every
    division a true FLOOR division, so both engines agree bit-for-bit on
    negative trends.  The one-step-ahead forecast is the exact integer
    l + b.  Same execution shape as ``ewma_int`` (one applyInPandas group
    per key; keys parallelize, the recurrence is sequential per key)."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.int64)
        l = np.zeros(len(x), dtype=np.int64)
        b = np.zeros(len(x), dtype=np.int64)
        if len(x):
            l[0] = x[0]
            for t in range(1, len(x)):
                l[t] = np.floor_divide(
                    a_num * x[t] + (a_den - a_num) * (l[t - 1] + b[t - 1]),
                    a_den,
                )
                b[t] = np.floor_divide(
                    b_num * (l[t] - l[t - 1]) + (b_den - b_num) * b[t - 1],
                    b_den,
                )
        return pd.DataFrame({
            user_col: pdf[user_col].to_numpy(),
            "rn": np.arange(1, len(x) + 1, dtype=np.int64),
            "x": x,
            "l": l,
            "b": b,
        })

    schema = f"{user_col} long, rn long, x long, l long, b long"
    return df.groupBy(user_col).applyInPandas(fn, schema=schema)


def holt_int_sql(
    base_select: str,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay of ``holt_int``: the ewma lockstep recursive CTE with
    TWO carried state columns; floor division via the posmod identity.
    The level update must resolve before the trend update reads it, so the
    recursive SELECT nests it in a lateral subexpression."""
    lrec = f"({a_num} * p.{value_col} + {a_den - a_num} * (r.l + r.b))"
    lnew = f"(({lrec} - ((({lrec} % {a_den}) + {a_den}) % {a_den})) // {a_den})"
    brec = f"({b_num} * (ln.v - r.l) + {b_den - b_num} * r.b)"
    return f"""
WITH RECURSIVE pts AS (
  SELECT {user_col}, {value_col},
         CAST(row_number() OVER (PARTITION BY {user_col}
                                 ORDER BY {ts_col}, {id_col}) AS BIGINT) AS rn
  FROM ({base_select}) base),
rec AS (
  SELECT {user_col}, rn, {value_col} AS x,
         CAST({value_col} AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT p.{user_col}, p.rn, p.{value_col},
         ln.v,
         ({brec} - ((({brec} % {b_den}) + {b_den}) % {b_den})) // {b_den}
  FROM rec r
  JOIN pts p ON p.{user_col} = r.{user_col} AND p.rn = r.rn + 1
  CROSS JOIN LATERAL (SELECT {lnew} AS v) ln)
SELECT {user_col}, rn, CAST(x AS BIGINT) AS x, l, b FROM rec
"""


def interval_union(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Merge overlapping/touching intervals per key -> one row per merged
    interval (key, m_start, m_end, n_merged).  Integer endpoints,
    half-open-agnostic: intervals merge when start <= running max end
    (touching counts as overlap).

    The classic single-window-pass formulation: sort by (start, end)
    within the key, new-group flag = start > max(end) over all PRECEDING
    rows, group id = running sum of flags — one shuffle total, no
    self-join, no per-key Python."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(
        prev_max.isNull() | (F.col(start_col) > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    grouped = df.select(key_col, start_col, end_col).withColumn(
        "__g", F.sum(flag).over(run)
    )
    return (
        grouped.groupBy(key_col, "__g")
        .agg(
            F.min(start_col).alias("m_start"),
            F.max(end_col).alias("m_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .select(key_col, "m_start", "m_end", "n_merged")
    )


def interval_union_sql(
    base_select: str,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
) -> str:
    """DuckDB replay — identical window flags and grouping."""
    return f"""
WITH b AS ({base_select}),
fl AS (
  SELECT {key_col}, {start_col}, {end_col},
         CASE WHEN max({end_col}) OVER (PARTITION BY {key_col}
                ORDER BY {start_col}, {end_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR {start_col} > max({end_col}) OVER (PARTITION BY {key_col}
                ORDER BY {start_col}, {end_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS f
  FROM b),
g AS (
  SELECT {key_col}, {start_col}, {end_col},
         sum(f) OVER (PARTITION BY {key_col} ORDER BY {start_col}, {end_col}
                      ROWS UNBOUNDED PRECEDING) AS gid
  FROM fl)
SELECT {key_col}, CAST(min({start_col}) AS BIGINT) AS m_start,
       CAST(max({end_col}) AS BIGINT) AS m_end,
       CAST(count(*) AS BIGINT) AS n_merged
FROM g GROUP BY {key_col}, gid"""


def changepoint(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Single least-squares changepoint per key ->
    (key, n, k_best, num, den).

    The split k (1 <= k < n, k = left-segment size) minimizing
    SSE_left + SSE_right equivalently MAXIMIZES
    f(k) = S_l^2/n_l + S_r^2/n_r (the total sum of squares is constant),
    i.e. f = num/den with num = S_l^2*n_r + S_r^2*n_l and den = n_l*n_r —
    both exact int64 for quantized values.  The argmax orders by the
    IEEE quotient (identical in any engine for identical integers) with
    ties -> smallest k.  Pure window codegen: one shuffle for the prefix
    sums, one for the argmax — no per-key Python."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(key_col)
    pre = (
        df.select(key_col, ts_col, id_col, value_col)
        .withColumn("k", F.row_number().over(w).cast("long"))
        .withColumn("s_l", F.sum(value_col).over(run))
        .withColumn("n", F.count(F.lit(1)).over(tot).cast("long"))
        .withColumn("s", F.sum(value_col).over(tot))
        .filter(F.col("k") < F.col("n"))
    )
    scored = pre.select(
        key_col, "k", "n",
        (
            F.col("s_l") * F.col("s_l") * (F.col("n") - F.col("k"))
            + (F.col("s") - F.col("s_l")) * (F.col("s") - F.col("s_l")) * F.col("k")
        ).alias("num"),
        (F.col("k") * (F.col("n") - F.col("k"))).alias("den"),
    )
    best = Window.partitionBy(key_col).orderBy(
        (F.col("num").cast("double") / F.col("den").cast("double")).desc(),
        F.col("k").asc(),
    )
    return (
        scored.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .select(key_col, "n", F.col("k").alias("k_best"), "num", "den")
    )


def changepoint_sql(
    base_select: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay — identical prefix sums, scores and argmax."""
    return f"""
WITH b AS ({base_select}),
pre AS (
  SELECT {key_col},
         CAST(row_number() OVER w AS BIGINT) AS k,
         sum({value_col}) OVER (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                                ROWS UNBOUNDED PRECEDING) AS s_l,
         CAST(count(*) OVER (PARTITION BY {key_col}) AS BIGINT) AS n,
         sum({value_col}) OVER (PARTITION BY {key_col}) AS s
  FROM b
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col})),
scored AS (
  SELECT {key_col}, k, n,
         CAST(s_l * s_l * (n - k) + (s - s_l) * (s - s_l) * k AS BIGINT) AS num,
         CAST(k * (n - k) AS BIGINT) AS den
  FROM pre WHERE k < n),
best AS (
  SELECT {key_col}, n, k AS k_best, num, den,
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
                                     k ASC) AS rn
  FROM scored)
SELECT {key_col}, n, k_best, num, den FROM best WHERE rn = 1"""


def acf_int(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3, 4),
) -> DataFrame:
    """Exact-integer autocorrelation at the given lags ->
    (key, lag, m, num_scaled, den_scaled).

    For the length-n series x_1..x_n (ordered by ``order_col``) the centered
    lag-k autocovariance numerator and the variance denominator are scaled
    by n^2 so everything stays int64 (synth.py playbook rule 4):

        num_k * n^2 = n^2*P_k - n*S*(A_k + B_k) + (n-k)*S^2
        den   * n^2 = n^2*Q   - n*S^2

    with P_k = sum x_t*x_{t+k}, A_k/B_k the head/tail partial sums,
    S = sum x, Q = sum x^2 — the ACF is num/den in exact rational form, no
    float ever computed.  ONE window pass materializes every lead column;
    the stack+groupBy is a single shuffle keyed (key, lag)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    x = F.col(value_col)
    base = df.select(key_col, order_col, value_col)
    for k in lags:
        base = base.withColumn(f"_l{k}", F.lead(value_col, int(k)).over(w))
    stacked = (
        base.select(
            key_col,
            x.alias("x"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(k)).alias("lag"),
                            F.col(f"_l{k}").alias("y"),
                        )
                        for k in lags
                    ]
                )
            ).alias("p"),
        )
        .select(key_col, "x", F.col("p.lag").alias("lag"), F.col("p.y").alias("y"))
        .filter(F.col("y").isNotNull())
    )
    per_lag = stacked.groupBy(key_col, "lag").agg(
        F.sum(F.col("x") * F.col("y")).alias("p"),
        F.sum("x").alias("a"),
        F.sum("y").alias("bb"),
        F.count(F.lit(1)).alias("m"),
    )
    tot = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("s"),
        F.sum(x * x).alias("q"),
    )
    j = per_lag.join(tot, key_col)
    n, s = F.col("n"), F.col("s")
    return j.select(
        key_col,
        "lag",
        "m",
        (
            n * n * F.col("p")
            - n * s * (F.col("a") + F.col("bb"))
            + F.col("m") * s * s
        ).alias("num_scaled"),
        (n * n * F.col("q") - n * s * s).alias("den_scaled"),
    )


def acf_int_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    value_col: str = "x",
    lags: tuple[int, ...] = (1, 2, 3, 4),
) -> str:
    """DuckDB replay of ``acf_int`` — identical integer formulas."""
    lead_blocks = "\n  UNION ALL\n".join(
        f"""  SELECT {key_col}, {int(k)} AS lag, {value_col} AS x,
         lead({value_col}, {int(k)}) OVER (PARTITION BY {key_col}
                                           ORDER BY {order_col}) AS y
  FROM b"""
        for k in lags
    )
    return f"""
WITH b AS ({base_select}),
tot AS (
  SELECT {key_col}, CAST(count(*) AS BIGINT) AS n, sum({value_col}) AS s,
         sum({value_col} * {value_col}) AS q
  FROM b GROUP BY 1),
ld AS (
{lead_blocks}),
agg AS (
  SELECT {key_col}, lag, sum(x * y) AS p, sum(x) AS a, sum(y) AS bb,
         CAST(count(*) AS BIGINT) AS m
  FROM ld WHERE y IS NOT NULL GROUP BY 1, 2)
SELECT agg.{key_col}, agg.lag, agg.m,
       CAST(n * n * p - n * s * (a + bb) + m * s * s AS BIGINT) AS num_scaled,
       CAST(n * n * q - n * s * s AS BIGINT) AS den_scaled
FROM agg JOIN tot ON tot.{key_col} = agg.{key_col}"""


def rolling_median(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    width: int,
) -> DataFrame:
    """Exact rolling median over the trailing ``width`` rows per key ->
    (key, order, x, n_win, med).

    The median is the SORTED-MULTISET ELEMENT at index (n-1)//2 (the
    group_quantiles convention) so it is bit-replicable for integer
    values.  Spark has no exact median window aggregate; the formulation
    is a bounded band self-join (each row joins its trailing window — at
    most ``width`` rows) + one rank window, all codegen.  The fan-out is
    width-bounded, so the shuffle volume is width * n rows regardless of
    key skew."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(value_col).alias("x"),
    ).withColumn("rn", F.row_number().over(w).cast("long"))
    cur = b.select(
        F.col("k"), F.col("o"), F.col("x"), F.col("rn")
    )
    src = b.select(
        F.col("k").alias("k2"), F.col("x").alias("xs"),
        F.col("rn").alias("rs"),
    )
    j = cur.join(
        src,
        (F.col("k") == F.col("k2"))
        & (F.col("rs") <= F.col("rn"))
        & (F.col("rs") > F.col("rn") - int(width)),
    )
    ww = Window.partitionBy("k", "rn").orderBy("xs", "rs")
    ranked = (
        j.withColumn("pos", F.row_number().over(ww).cast("long"))
        .withColumn(
            "n_win", F.count(F.lit(1)).over(Window.partitionBy("k", "rn"))
        )
    )
    return (
        ranked.filter(F.expr("pos - 1 = (n_win - 1) div 2"))
        .select("k", "o", "x", "n_win", F.col("xs").alias("med"))
    )


def rolling_median_sql(
    base_select: str,
    key_col: str,
    order_col: str,
    value_col: str,
    width: int,
) -> str:
    """DuckDB replay of ``rolling_median`` — identical band join + rank."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {order_col} AS o, {value_col} AS x,
         CAST(row_number() OVER (PARTITION BY {key_col}
                                 ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) t),
j AS (
  SELECT cur.k, cur.o, cur.x, cur.rn, src.x AS xs, src.rn AS rs
  FROM b cur JOIN b src
    ON src.k = cur.k AND src.rn <= cur.rn AND src.rn > cur.rn - {int(width)}),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY k, rn
                                    ORDER BY xs, rs) AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY k, rn) AS BIGINT) AS n_win
  FROM j)
SELECT k, o, x, n_win, xs AS med
FROM ranked WHERE pos - 1 = (n_win - 1) // 2"""


# ---------------------------------------------------------------- isotonic
# Isotonic regression by Pool-Adjacent-Violators (PAVA; Barlow et al. 1972,
# public literature) — the calibration-curve fit (classifier score ->
# probability) every training pipeline runs before thresholding.  The
# least-squares monotone fit is piecewise constant; each block's fitted
# value is the EXACT RATIONAL mean (sum, count) of its pooled points, so
# the whole output is int64 pairs.  The oracle replays PAVA as a lockstep
# EVENT LOOP: one recursive-CTE round = one event (merge the two top
# blocks if the last mean dropped below the previous, else consume the
# next point); every key advances one event per round and drops out when
# done, so the recursion is bounded by 2n rounds.


def isotonic_fit(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Increasing isotonic fit per key -> (key, blk, r_start, r_end,
    fit_num, fit_den): maximal constant blocks of the monotone
    least-squares fit, fitted value = fit_num/fit_den (exact block mean).
    applyInPandas per key; the stack never exceeds the series length."""
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o", kind="mergesort")
        ys = pdf["y"].tolist()
        stack: list[list[int]] = []  # [sum, count]
        for y in ys:
            stack.append([int(y), 1])
            # merge while mean(last) < mean(prev)  (strict violation)
            while (
                len(stack) >= 2
                and stack[-1][0] * stack[-2][1]
                < stack[-2][0] * stack[-1][1]
            ):
                s2, c2 = stack.pop()
                stack[-1][0] += s2
                stack[-1][1] += c2
        rows = []
        pos = 1
        for b, (s, c) in enumerate(stack):
            rows.append(
                {
                    "k": pdf["k"].iloc[0],
                    "blk": b + 1,
                    "r_start": pos,
                    "r_end": pos + c - 1,
                    "fit_num": s,
                    "fit_den": c,
                }
            )
            pos += c
        return pd.DataFrame(rows)

    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(value_col).alias("y"),
    )
    return b.groupBy("k").applyInPandas(
        fn,
        schema=(
            "k long, blk long, r_start long, r_end long, "
            "fit_num long, fit_den long"
        ),
    )


def isotonic_fit_sql(base_select: str) -> str:
    """DuckDB oracle for ``isotonic_fit``: PAVA as a lockstep recursive
    CTE event loop over (idx consumed, stack LIST of {s, c} structs).
    ``base_select`` must yield (k, o, y)."""
    merge_cond = (
        "len(stack) >= 2 AND stack[len(stack)].s * stack[len(stack) - 1].c"
        " < stack[len(stack) - 1].s * stack[len(stack)].c"
    )
    merged = (
        "list_append(stack[1:len(stack) - 2],"
        " {'s': stack[len(stack) - 1].s + stack[len(stack)].s,"
        "  'c': stack[len(stack) - 1].c + stack[len(stack)].c})"
    )
    return f"""
WITH RECURSIVE b AS ({base_select}),
pts AS (
  SELECT k, list(y ORDER BY o) AS ys, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1),
st(k, ys, n, idx, stack) AS (
  SELECT k, ys, n, 0, CAST([] AS STRUCT(s BIGINT, c BIGINT)[])
  FROM pts
  UNION ALL
  SELECT k, ys, n,
         CASE WHEN {merge_cond} THEN idx ELSE idx + 1 END,
         CASE WHEN {merge_cond} THEN {merged}
              ELSE list_append(stack, {{'s': ys[idx + 1], 'c': 1}}) END
  FROM st WHERE ({merge_cond}) OR idx < n),
fin AS (SELECT k, stack FROM st WHERE idx >= n AND NOT ({merge_cond})),
u AS (
  SELECT k, unnest(stack) AS blk_s,
         generate_subscripts(stack, 1) AS blk
  FROM fin),
pos AS (
  SELECT k, blk, blk_s.s AS fit_num, blk_s.c AS fit_den,
         CAST(1 + COALESCE(sum(blk_s.c) OVER (PARTITION BY k ORDER BY blk
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS r_start
  FROM u)
SELECT k, CAST(blk AS BIGINT) AS blk, r_start,
       r_start + fit_den - 1 AS r_end,
       CAST(fit_num AS BIGINT) AS fit_num, CAST(fit_den AS BIGINT) AS fit_den
FROM pos"""


def mase_components(
    df: DataFrame,
    season: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Forecast-error denominators per key -> (user, n, sum_abs_naive,
    n_naive, sum_abs_seasonal, n_seasonal): the exact integer sums of
    |x_t - x_{t-1}| and |x_t - x_{t-season}| that scale MASE / seasonal
    MASE — two lag windows, everything int64, no FP."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("t", "i")
    b = df.select(
        F.col(user_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(value_col).alias("x"),
    )
    d1 = F.col("x") - F.lag("x", 1).over(w)
    dm = F.col("x") - F.lag("x", int(season)).over(w)
    seg = b.select(
        "k",
        F.abs(d1).alias("a1"),
        F.abs(dm).alias("am"),
    )
    one = F.lit(1)
    return seg.groupBy("k").agg(
        F.count(one).alias("n"),
        F.coalesce(F.sum("a1"), F.lit(0)).alias("sum_abs_naive"),
        F.count("a1").alias("n_naive"),
        F.coalesce(F.sum("am"), F.lit(0)).alias("sum_abs_seasonal"),
        F.count("am").alias("n_seasonal"),
    )


def mase_components_sql(
    base_select: str,
    season: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay of ``mase_components``."""
    return f"""
WITH b AS (
  SELECT {user_col} AS k, {value_col} AS x,
         abs({value_col} - lag({value_col}, 1) OVER
             (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})) AS a1,
         abs({value_col} - lag({value_col}, {int(season)}) OVER
             (PARTITION BY {user_col} ORDER BY {ts_col}, {id_col})) AS am
  FROM ({base_select}) s)
SELECT k, CAST(count(*) AS BIGINT) AS n,
       CAST(coalesce(sum(a1), 0) AS BIGINT) AS sum_abs_naive,
       CAST(count(a1) AS BIGINT) AS n_naive,
       CAST(coalesce(sum(am), 0) AS BIGINT) AS sum_abs_seasonal,
       CAST(count(am) AS BIGINT) AS n_seasonal
FROM b GROUP BY 1"""


def xcorr_argmax(
    df: DataFrame,
    max_lag: int,
    key_col: str = "k",
    order_col: str = "o",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Cross-correlation lag sweep per key -> (k, lag, n_pairs, xsum):
    the lag in [0, max_lag] maximizing the exact integer inner product
    sum of x_t * y_{t+lag} (ties -> smallest lag) — the alignment
    primitive between two co-keyed signals.  One bounded self-join on
    (key, rank + lag) + one argmax window."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
        )
        .withColumn("rn", F.row_number().over(w))
    )
    lags = df.sparkSession.range(0, int(max_lag) + 1).select(
        F.col("id").alias("lag")
    )
    l = b.select("k", "rn", "x")
    r = b.select(F.col("k").alias("k2"), F.col("rn").alias("rn2"), "y")
    j = (
        l.join(F.broadcast(lags))
        .join(
            r,
            (F.col("k") == F.col("k2"))
            & (F.col("rn2") == F.col("rn") + F.col("lag")),
        )
        .groupBy("k", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("x") * F.col("y")).alias("xsum"),
        )
    )
    best = Window.partitionBy("k").orderBy(
        F.col("xsum").desc(), F.col("lag").asc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .select("k", "lag", "n_pairs", "xsum")
    )


def xcorr_argmax_sql(
    base_select: str,
    max_lag: int,
    key_col: str = "k",
    order_col: str = "o",
    x_col: str = "x",
    y_col: str = "y",
) -> str:
    """DuckDB replay of ``xcorr_argmax``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {x_col} AS x, {y_col} AS y,
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {order_col}) AS rn
  FROM ({base_select}) s),
j AS (
  SELECT l.k, g.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(l.x * r.y) AS BIGINT) AS xsum
  FROM b l
  CROSS JOIN generate_series(0, {int(max_lag)}) g(lag)
  JOIN b r ON r.k = l.k AND r.rn = l.rn + g.lag
  GROUP BY 1, 2),
best AS (
  SELECT *, row_number() OVER (PARTITION BY k
       ORDER BY xsum DESC, lag ASC) AS rn FROM j)
SELECT k, CAST(lag AS BIGINT) AS lag, n_pairs, xsum
FROM best WHERE rn = 1"""


def burstiness_moments(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-event-time dispersion per key -> (k, n_gaps, s_dt, s_dt2):
    the burstiness coefficient B = (sigma - mu)/(sigma + mu) and the
    coefficient of variation are rationals/one-sqrt-aways from these
    EXACT integer gap moments (gaps in whole microseconds).  One lag
    window + one aggregation — the behavioral-rhythm feature."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("t", "i")
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
    )
    dt = F.col("t") - F.lag("t").over(w)
    g = b.withColumn("dt", dt).filter(F.col("dt").isNotNull())
    return g.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("dt").alias("s_dt"),
        F.sum(F.col("dt") * F.col("dt")).alias("s_dt2"),
    )


def burstiness_sql(
    base_select: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of ``burstiness_moments``."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k,
         {ts_col} - lag({ts_col}) OVER (PARTITION BY {key_col}
                                        ORDER BY {ts_col}, {id_col}) AS dt
  FROM ({base_select}) s)
SELECT k, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(dt) AS BIGINT) AS s_dt,
       CAST(sum(dt * dt) AS BIGINT) AS s_dt2
FROM b WHERE dt IS NOT NULL GROUP BY 1"""


def hampel_flags(
    df: DataFrame,
    window: int = 2,
    k_num: int = 3,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Hampel outlier filter -> (k, o, x, med, mad2, flag): per row, the
    EXACT median of the centered (2*window+1) neighborhood
    (lower-median convention on even counts) and the window median of
    the neighbors' own |x_j - med_j| deviations (the decomposed-Hampel
    variant: each deviation is against ITS row's median, which keeps the
    whole pass two window stages instead of a rank self-join — both
    engines implement the identical variant), flagged when
    2*|x - med| > 2*k*mad — every comparison integer, pure codegen
    (array_sort over a collect_list window + element_at).  The
    spike-cleaning sibling of rolling_median."""
    from pyspark.sql import Window, functions as F

    w = (
        Window.partitionBy("k")
        .orderBy("o")
        .rowsBetween(-int(window), int(window))
    )
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(order_col).alias("o"),
        F.col(value_col).alias("x"),
    )
    arr = F.array_sort(F.collect_list("x").over(w))
    n = F.size(arr)
    med = F.element_at(arr, ((n + 1) / 2).cast("int"))
    s = (
        b.withColumn("med", med)
        .withColumn("dev", F.abs(F.col("x") - F.col("med")))
    )
    darr = F.array_sort(F.collect_list("dev").over(w))
    dn = F.size(darr)
    s = s.withColumn("mad2", F.element_at(darr, ((dn + 1) / 2).cast("int")))
    flag = (
        F.lit(2) * F.abs(F.col("x") - F.col("med"))
        > F.lit(2 * int(k_num)) * F.col("mad2")
    ).cast("long")
    return s.select("k", "o", "x", "med", "mad2", flag.alias("flag"))


def hampel_flags_sql(
    base_select: str,
    window: int = 2,
    k_num: int = 3,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay of ``hampel_flags`` (same lower-median rule)."""
    w = int(window)
    return f"""
WITH b AS (
  SELECT {key_col} AS k, {order_col} AS o, {value_col} AS x
  FROM ({base_select}) s),
m AS (
  SELECT *, list_sort(list(x) OVER (PARTITION BY k ORDER BY o
             ROWS BETWEEN {w} PRECEDING AND {w} FOLLOWING)) AS arr
  FROM b),
m2 AS (
  SELECT k, o, x, arr[CAST((len(arr) + 1) // 2 AS INT)] AS med FROM m),
d AS (
  SELECT *, list_sort(list(abs(x - med)) OVER (PARTITION BY k ORDER BY o
             ROWS BETWEEN {w} PRECEDING AND {w} FOLLOWING)) AS darr
  FROM m2)
SELECT k, o, CAST(x AS BIGINT) AS x, CAST(med AS BIGINT) AS med,
       CAST(darr[CAST((len(darr) + 1) // 2 AS INT)] AS BIGINT) AS mad2,
       CAST(2 * abs(x - med)
            > {2 * int(k_num)} * darr[CAST((len(darr) + 1) // 2 AS INT)]
            AS BIGINT) AS flag
FROM d"""


def paa_segments(
    df: DataFrame,
    seg_len: int,
    key_col: str = "k",
    order_col: str = "o",
    value_col: str = "v",
) -> DataFrame:
    """Piecewise Aggregate Approximation (Keogh et al. 2001, public
    literature): each key's ordered series is cut into fixed-length
    segments of ``seg_len`` points; per segment the exact count and
    int64 value sum (the mean is the derivable rational n/vsum) ->
    (k, seg, n, vsum).  The dimensionality-reduction step before SAX /
    similarity search; one window rank + one aggregation."""
    from pyspark.sql import Window

    r = df.select(
        F.col(key_col).alias("k"), F.col(order_col).alias("o"),
        F.col(value_col).alias("v"),
    ).withColumn("rn", F.row_number().over(
        Window.partitionBy("k").orderBy("o")))
    return (
        r.withColumn(
            "seg",
            F.expr(f"CAST((rn - 1) DIV {int(seg_len)} AS BIGINT)"),
        )
        .groupBy("k", "seg")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("vsum"))
    )


def paa_segments_sql(
    base_select: str,
    seg_len: int,
) -> str:
    """DuckDB replay of ``paa_segments``; ``base_select`` -> (k, o, v)."""
    return f"""
WITH r AS (
  SELECT k, v,
         row_number() OVER (PARTITION BY k ORDER BY o) AS rn
  FROM ({base_select}) b)
SELECT k, CAST((rn - 1) // {int(seg_len)} AS BIGINT) AS seg,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v) AS BIGINT) AS vsum
FROM r GROUP BY 1, 2"""


def sax_symbols(
    df: DataFrame,
    alpha: int = 4,
    key_col: str = "k",
    order_col: str = "o",
    value_col: str = "v",
) -> DataFrame:
    """Uniform-breakpoint SAX symbolization (Lin et al. 2003 shape,
    public literature; breakpoints uniform over the key's [min, max]
    instead of Gaussian quantiles so everything stays EXACT integer):
    sym = min(alpha-1, (v - vmin) * alpha DIV (vmax - vmin + 1)) ->
    (k, n, word) with the word the ordered symbol string.  The
    discretization step before motif mining; two windows + one ordered
    string aggregation."""
    from pyspark.sql import Window

    kw = Window.partitionBy("k")
    base = df.select(
        F.col(key_col).alias("k"), F.col(order_col).alias("o"),
        F.col(value_col).alias("v"),
    ).withColumn("vmin", F.min("v").over(kw)).withColumn(
        "vmax", F.max("v").over(kw)
    )
    sym = F.expr(
        f"LEAST({int(alpha) - 1}, "
        f"CAST(((v - vmin) * {int(alpha)}) DIV (vmax - vmin + 1) AS BIGINT))"
    )
    s = base.select("k", "o", sym.alias("s"))
    return s.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(o, s))), "
                   "x -> CAST(x.s AS STRING))"),
            "",
        ).alias("word"),
    )


def sax_symbols_sql(base_select: str, alpha: int = 4) -> str:
    """DuckDB replay of ``sax_symbols``; ``base_select`` -> (k, o, v)."""
    a = int(alpha)
    return f"""
WITH b AS (
  SELECT k, o, v,
         min(v) OVER (PARTITION BY k) AS vmin,
         max(v) OVER (PARTITION BY k) AS vmax
  FROM ({base_select}) s),
sy AS (
  SELECT k, o,
         LEAST({a - 1}, ((v - vmin) * {a}) // (vmax - vmin + 1)) AS s
  FROM b)
SELECT k, CAST(count(*) AS BIGINT) AS n,
       string_agg(CAST(s AS VARCHAR), '' ORDER BY o) AS word
FROM sy GROUP BY 1"""


def interarrival_hist(
    df: DataFrame,
    key_col: str = "k",
    order_col: str = "o",
    ts_col: str = "t_us",
) -> DataFrame:
    """Inter-arrival time histogram in power-of-two microsecond buckets:
    bucket = bit length of the gap (length(bin(gap)) - 1, the integer
    floor(log2) — no FP log), zero gaps in bucket -1 -> (bucket, cnt)
    corpus-wide.  The traffic-shape fingerprint behind bot/burst
    detection; one window + one map-side-combined aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(order_col)
    g = (
        df.select(F.col(key_col).alias("k"), F.col(order_col).alias("o"),
                  F.col(ts_col).alias("t"))
        .withColumn("gap", F.col("t") - F.lag("t").over(
            Window.partitionBy("k").orderBy("o")))
        .filter(F.col("gap").isNotNull())
    )
    bucket = F.when(
        F.col("gap") <= 0, F.lit(-1).cast("long")
    ).otherwise((F.length(F.expr("bin(gap)")) - 1).cast("long"))
    return (
        g.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def interarrival_hist_sql(base_select: str) -> str:
    """DuckDB replay of ``interarrival_hist``; ``base_select`` ->
    (k, o, t_us)."""
    return """
WITH g AS (
  SELECT t_us - lag(t_us) OVER (PARTITION BY k ORDER BY o) AS gap
  FROM ({0}) b QUALIFY gap IS NOT NULL)
SELECT CAST(CASE WHEN gap <= 0 THEN -1
            ELSE length(bin(gap)) - 1 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM g GROUP BY 1""".format(base_select)


def seasonal_decompose_int(
    df: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
    period: int = 24,
    key_cols: tuple = (),
) -> DataFrame:
    """Exact-integer seasonal decomposition (the STL-lite a telemetry /
    usage pipeline runs before anomaly flags): phase = t % period
    (t is a non-negative integer bucket index — epoch hours/days), the
    seasonal component per (key, phase) is the exact rational ssum/cnt
    carried as two int64 columns, and the deseasonalized residual is
    dev = x*cnt - ssum — the residual scaled by cnt, so it stays integer
    and order-independent (dev/cnt is the classic x - phase-mean).

    Pure window codegen: one hash partition by (key, phase), no joins,
    no FP — both engines replay it bit-exact."""
    from pyspark.sql import Window

    p = int(period)
    out = df.select(
        *key_cols,
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    ).withColumn("phase", F.col("t") % p)
    w = Window.partitionBy(*key_cols, "phase")
    return out.select(
        *key_cols, "t", "x", "phase",
        F.count("*").over(w).alias("cnt"),
        F.sum("x").over(w).alias("ssum"),
        (F.col("x") * F.count("*").over(w) - F.sum("x").over(w))
        .alias("dev"),
    )


def seasonal_decompose_sql(
    base_select: str,
    period: int = 24,
    key_cols: tuple = (),
) -> str:
    """DuckDB twin of seasonal_decompose_int; ``base_select`` must yield
    (key_cols..., t, x) with integer t >= 0 and integer x."""
    keys = "".join(f"{k}, " for k in key_cols)
    part = "".join(f"{k}, " for k in key_cols) + f"t % {period}"
    return f"""
SELECT {keys}CAST(t AS BIGINT) AS t, CAST(x AS BIGINT) AS x,
       CAST(t % {period} AS BIGINT) AS phase,
       CAST(count(*) OVER w AS BIGINT) AS cnt,
       CAST(sum(x) OVER w AS BIGINT) AS ssum,
       CAST(x * (count(*) OVER w) - (sum(x) OVER w) AS BIGINT) AS dev
FROM ({base_select}) b
WINDOW w AS (PARTITION BY {part})"""


def ordinal_patterns(
    df: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
    key_cols: tuple = ("k",),
) -> DataFrame:
    """Order-3 ordinal-pattern counts (Bandt & Pompe 2002 permutation
    entropy, public literature) per key: each consecutive value triple
    (x0, x1, x2) in t-order maps to the integer code
    4*[x0<=x1] + 2*[x0<=x2] + [x1<=x2] (ties broken stably toward time
    order, so only the 6 consistent codes {0,1,3,4,6,7} can occur), and
    the output is the per-(key, code) histogram the entropy is computed
    from.  Pure lag-window codegen, no FP — bit-exact in both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(t_col)
    x0 = F.lag(x_col, 2).over(w)
    x1 = F.lag(x_col, 1).over(w)
    x2 = F.col(x_col)
    code = (
        (x0 <= x1).cast("long") * 4
        + (x0 <= x2).cast("long") * 2
        + (x1 <= x2).cast("long")
    )
    return (
        df.select(*key_cols, code.alias("code"), x0.alias("_x0"))
        .filter(F.col("_x0").isNotNull())
        .groupBy(*key_cols, "code")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ordinal_patterns_sql(
    base_select: str,
    t_col: str = "t",
    x_col: str = "x",
    key_cols: tuple = ("k",),
) -> str:
    """DuckDB twin of ``ordinal_patterns``; ``base_select`` must yield
    (key_cols..., t, x)."""
    keys = ", ".join(key_cols)
    return f"""
WITH b AS ({base_select}),
lagged AS (
  SELECT {keys},
         lag({x_col}, 2) OVER w AS x0,
         lag({x_col}, 1) OVER w AS x1,
         {x_col} AS x2
  FROM b
  WINDOW w AS (PARTITION BY {keys} ORDER BY {t_col}))
SELECT {keys},
       CAST(4 * (CASE WHEN x0 <= x1 THEN 1 ELSE 0 END)
            + 2 * (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END)
            + (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END) AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS cnt
FROM lagged WHERE x0 IS NOT NULL
GROUP BY ALL"""


_DFT_SCALE = 1 << 20


def dft_luts(period: int = 32, freqs: tuple = (1, 2, 3, 4)):
    """Quantized cos/sin integer LUTs for the fixed-period DFT bins:
    lut[f][p] = round(cos/sin(2*pi*f*p/period) * 2^20) — literal ints
    shared verbatim by the engine and the SQL oracle, so the spectral
    sums are exact int64 on both sides (the hough_luts pattern)."""
    import math as _math

    cl = {f: [int(round(_math.cos(2 * _math.pi * f * p / period)
                        * _DFT_SCALE)) for p in range(period)]
          for f in freqs}
    sl = {f: [int(round(_math.sin(2 * _math.pi * f * p / period)
                        * _DFT_SCALE)) for p in range(period)]
          for f in freqs}
    return cl, sl


def dft_coeffs(
    df: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
    key_cols: tuple = ("k",),
    period: int = 32,
    freqs: tuple = (1, 2, 3, 4),
) -> DataFrame:
    """Fixed-period discrete Fourier coefficients per key: for each
    frequency f, c = sum(x_t * cos_lut[f][t % period]) and s likewise —
    the periodogram power c^2 + s^2 is derivable downstream (kept
    unsquared here so everything stays int64 without rescaling).  The
    LUT join broadcasts |freqs| * period literal rows; one map-side
    combined aggregation — pure codegen, no FP, no trig at runtime."""
    cl, sl = dft_luts(period, freqs)
    spark = df.sparkSession
    lut = spark.createDataFrame(
        [(f, p, cl[f][p], sl[f][p]) for f in freqs for p in range(period)],
        "freq long, phase long, cl long, sl long",
    )
    base = df.select(
        *key_cols,
        (F.col(t_col) % period).cast("long").alias("phase"),
        F.col(x_col).cast("long").alias("x"),
    )
    return (
        base.join(F.broadcast(lut), ["phase"])
        .groupBy(*key_cols, "freq")
        .agg(
            F.sum(F.col("x") * F.col("cl")).alias("c"),
            F.sum(F.col("x") * F.col("sl")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def dft_coeffs_sql(
    base_select: str,
    t_col: str = "t",
    x_col: str = "x",
    key_cols: tuple = ("k",),
    period: int = 32,
    freqs: tuple = (1, 2, 3, 4),
) -> str:
    """DuckDB twin of ``dft_coeffs`` (same literal LUTs)."""
    cl, sl = dft_luts(period, freqs)
    vals = ", ".join(
        f"({f}, {p}, {cl[f][p]}, {sl[f][p]})"
        for f in freqs for p in range(period)
    )
    keys = ", ".join(key_cols)
    return f"""
WITH b AS ({base_select}),
lut(freq, phase, cl, sl) AS (SELECT * FROM (VALUES {vals})),
j AS (
  SELECT {keys}, lut.freq, b.{x_col} * lut.cl AS xc, b.{x_col} * lut.sl AS xs
  FROM b JOIN lut ON lut.phase = b.{t_col} % {period})
SELECT {keys}, CAST(freq AS BIGINT) AS freq,
       CAST(sum(xc) AS BIGINT) AS c, CAST(sum(xs) AS BIGINT) AS s,
       CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY ALL"""


def holt_winters_int(
    df: DataFrame,
    m: int = 4,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
    g_num: int = 1,
    g_den: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """Additive Holt-Winters (level + trend + season, period ``m``) in
    EXACT integer arithmetic -> (user, rn, x, l, b, s):
      l_1 = x_1, b_1 = 0, s_t = 0 for t < 1 (cold-start seasonals)
      l_t = floor((a_num*(x_t - s_{t-m}) + (a_den-a_num)*(l_{t-1}+b_{t-1})) / a_den)
      b_t = floor((b_num*(l_t - l_{t-1}) + (b_den-b_num)*b_{t-1}) / b_den)
      s_t = floor((g_num*(x_t - l_t) + (g_den-g_num)*s_{t-m}) / g_den)
    with every division a true FLOOR division (posmod identity on the SQL
    side), so negative seasonal deviations cannot split engines.  Same
    execution shape as ``holt_int`` — keys parallelize, the recurrence is
    sequential per key; 100 TB of keys is one applyInPandas shuffle."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.int64)
        n = len(x)
        l = np.zeros(n, dtype=np.int64)
        b = np.zeros(n, dtype=np.int64)
        s = np.zeros(n, dtype=np.int64)
        if n:
            l[0] = x[0]
            s[0] = np.floor_divide(g_num * (x[0] - l[0]), g_den)
            for t in range(1, n):
                sm = s[t - m] if t - m >= 0 else 0
                l[t] = np.floor_divide(
                    a_num * (x[t] - sm) + (a_den - a_num) * (l[t - 1] + b[t - 1]),
                    a_den,
                )
                b[t] = np.floor_divide(
                    b_num * (l[t] - l[t - 1]) + (b_den - b_num) * b[t - 1],
                    b_den,
                )
                s[t] = np.floor_divide(
                    g_num * (x[t] - l[t]) + (g_den - g_num) * sm, g_den
                )
        return pd.DataFrame({
            user_col: pdf[user_col].to_numpy(),
            "rn": np.arange(1, n + 1, dtype=np.int64),
            "x": x, "l": l, "b": b, "s": s,
        })

    schema = f"{user_col} long, rn long, x long, l long, b long, s long"
    return df.groupBy(user_col).applyInPandas(fn, schema=schema)


def holt_winters_int_sql(
    base_select: str,
    m: int = 4,
    a_num: int = 1,
    a_den: int = 4,
    b_num: int = 1,
    b_den: int = 8,
    g_num: int = 1,
    g_den: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB replay of ``holt_winters_int``: the holt lockstep recursive
    CTE carrying the last ``m`` seasonals as a LIST column (the dtw
    diagonal-list trick) — sl[1] is s_{t-m}, each round shifts the list
    and appends s_t.  Level resolves in a LATERAL before trend and season
    read it."""
    def fdiv(expr, den):
        return f"(({expr} - ((({expr} % {den}) + {den}) % {den})) // {den})"

    # s_1 = floordiv(g_num*(x_1 - l_1), g_den) = 0 exactly (l_1 = x_1)
    lrec = f"({a_num} * (p.{value_col} - r.sl[1]) + {a_den - a_num} * (r.l + r.b))"
    brec = f"({b_num} * (ln.v - r.l) + {b_den - b_num} * r.b)"
    srec = f"({g_num} * (p.{value_col} - ln.v) + {g_den - g_num} * r.sl[1])"
    return f"""
WITH RECURSIVE pts AS (
  SELECT {user_col}, {value_col},
         CAST(row_number() OVER (PARTITION BY {user_col}
                                 ORDER BY {ts_col}, {id_col}) AS BIGINT) AS rn
  FROM ({base_select}) base),
first AS (
  SELECT {user_col}, rn, CAST({value_col} AS BIGINT) AS x,
         CAST({value_col} AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
  FROM pts WHERE rn = 1),
rec AS (
  SELECT f.{user_col}, f.rn, f.x, f.l, f.b,
         [{", ".join(["CAST(0 AS BIGINT)"] * m)}] AS sl
  FROM first f
  UNION ALL
  SELECT p.{user_col}, p.rn, CAST(p.{value_col} AS BIGINT),
         ln.v, {fdiv("bn.v", b_den)},
         list_append(r.sl[2:{m}], {fdiv("sn.v", g_den)})
  FROM rec r
  JOIN pts p ON p.{user_col} = r.{user_col} AND p.rn = r.rn + 1
  CROSS JOIN LATERAL (SELECT {fdiv(lrec, a_den)} AS v) ln
  CROSS JOIN LATERAL (SELECT {brec} AS v) bn
  CROSS JOIN LATERAL (SELECT {srec} AS v) sn)
SELECT {user_col}, rn, x, l, b, sl[{m}] AS s FROM rec
"""


def matrix_profile(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    m: int = 8,
    cap: int = 60,
) -> DataFrame:
    """Exact integer matrix profile (Yeh et al. 2016, public literature;
    un-normalized ED^2 variant so everything stays int64) per key ->
    (k, i, d2, j): for each length-``m`` subsequence i of the first
    ``cap`` points, the minimum squared Euclidean distance d2 to any
    other subsequence j outside the trivial-match exclusion zone
    |i - j| >= m, plus that nearest neighbor's index (ties -> smallest
    j).  The motif/discord primitive: min(d2) over i locates the motif
    pair, max locates the discord.

    Scale shape: one collect_list per key (bounded by ``cap``, the
    documented subsample guard exactly as theil_sen), index pairs as a
    bounded self-join, distance via a JVM higher-order aggregate over
    sequence(0, m-1) — no Python, no driver state; keys partition the
    work at 100 TB."""
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("o")
    b = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(order_col).alias("o"),
            F.col(value_col).cast("long").alias("v"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= int(cap))
    )
    vl = b.groupBy("k").agg(
        F.array_sort(
            F.collect_list(F.struct("r", "v"))
        ).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "k", F.expr("transform(sv, s -> s.v)").alias("vs"), "n"
    ).filter(F.col("n") >= 2 * int(m))
    idx = vl.select(
        "k", "vs",
        F.explode(F.expr(f"sequence(1, size(vs) - {int(m)} + 1)")).alias("i"),
    )
    pairs = (
        idx.alias("a")
        .join(
            idx.select("k", F.col("i").alias("j")).alias("b"),
            (F.col("a.k") == F.col("b.k"))
            & (F.col("j") - F.col("i") >= int(m)),
        )
        .select(
            F.col("a.k").alias("k"), F.col("a.vs").alias("vs"), "i", "j"
        )
        .withColumn(
            "d2",
            F.expr(
                f"aggregate(sequence(0, {int(m)} - 1), CAST(0 AS BIGINT), "
                "(acc, t) -> acc + CAST(element_at(vs, i + t) - "
                "element_at(vs, j + t) AS BIGINT) * "
                "CAST(element_at(vs, i + t) - element_at(vs, j + t) AS BIGINT))"
            ),
        )
        .select("k", "i", "j", "d2")
    )
    both = pairs.unionAll(
        pairs.select("k", F.col("j").alias("i"), F.col("i").alias("j"), "d2")
    )
    agg = both.groupBy("k", "i").agg(F.min(F.struct("d2", "j")).alias("md"))
    return agg.select(
        "k", "i", F.col("md.d2").alias("d2"), F.col("md.j").alias("j")
    )


def matrix_profile_sql(
    base_select: str,
    m: int = 8,
    cap: int = 60,
) -> str:
    """DuckDB replay of ``matrix_profile``; ``base_select`` -> (k, o, v)."""
    mm = int(m)
    return f"""
WITH b AS MATERIALIZED (
  SELECT k, o, CAST(v AS BIGINT) AS v,
         row_number() OVER (PARTITION BY k ORDER BY o) AS r
  FROM ({base_select}) s QUALIFY r <= {int(cap)}),
vl AS MATERIALIZED (
  SELECT k, list(v ORDER BY r) AS vs, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1),
idx AS MATERIALIZED (
  SELECT k, vs, unnest(range(1, CAST(len(vs) AS BIGINT) - {mm} + 2)) AS i
  FROM vl WHERE n >= 2 * {mm}),
pairs AS (
  SELECT a.k, a.vs, a.i, b.i AS j,
         list_sum([(a.vs[CAST(a.i + t AS BIGINT)] - a.vs[CAST(b.i + t AS BIGINT)])
                   * (a.vs[CAST(a.i + t AS BIGINT)] - a.vs[CAST(b.i + t AS BIGINT)])
                   FOR t IN range(0, {mm})]) AS d2
  FROM idx a JOIN idx b ON a.k = b.k AND b.i - a.i >= {mm}),
allp AS (
  SELECT k, i, j, d2 FROM pairs
  UNION ALL SELECT k, j AS i, i AS j, d2 FROM pairs)
SELECT k, CAST(i AS BIGINT) AS i, CAST(d2 AS BIGINT) AS d2,
       CAST(j AS BIGINT) AS j
FROM (SELECT *, row_number() OVER (PARTITION BY k, i ORDER BY d2, j) AS rn
      FROM allp) r WHERE rn = 1"""


def cusum_chart(
    df: DataFrame,
    k: int,
    h: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> DataFrame:
    """One-sided upper CUSUM control chart (Page 1954, public literature)
    in EXACT integer arithmetic -> (user, rn, x, c, alarm): the textbook
    recurrence C_t = max(0, C_{t-1} + x_t - k) is NOT stepped row-by-row —
    it has the closed form C_t = S_t - min(0, min_{j<=t} S_j) over the
    prefix sums S of (x - k), so the whole chart is two window passes of
    pure JVM codegen (cumulative sum, then running min), no Python and no
    recurrence.  ``alarm`` flags C_t >= h (drift k and threshold h are
    caller constants, classically k = target + allowance).

    100-TB shape: both windows share one hash-partition exchange on the
    key; state per key is O(1)."""
    from pyspark.sql import Window

    w_ord = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col).cast("long").alias("x"),
    ).withColumn(
        "rn", F.row_number().over(w_ord).cast("long")
    ).withColumn(
        "s", F.sum(F.col("x") - F.lit(k)).over(w_cum)
    )
    w_rn = Window.partitionBy(user_col).orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return d.select(
        F.col(user_col),
        "rn",
        "x",
        (F.col("s") - F.least(F.lit(0).cast("long"), F.min("s").over(w_rn))).alias("c"),
    ).withColumn("alarm", (F.col("c") >= F.lit(h)).cast("boolean"))


def cusum_chart_sql(
    base_select: str,
    k: int,
    h: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "x",
) -> str:
    """DuckDB twin of ``cusum_chart``: the same two integer window passes
    (prefix sum of x - k, then running min clamped at 0)."""
    return f"""
WITH b AS (
  SELECT {user_col}, CAST({value_col} AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY {user_col}
                                 ORDER BY {ts_col}, {id_col}) AS BIGINT) AS rn,
         sum(CAST({value_col} AS BIGINT) - {k}) OVER (
             PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
             ROWS UNBOUNDED PRECEDING) AS s
  FROM ({base_select}) src)
SELECT {user_col}, rn, x,
       s - LEAST(0, min(s) OVER (PARTITION BY {user_col} ORDER BY rn
                                 ROWS UNBOUNDED PRECEDING)) AS c,
       (s - LEAST(0, min(s) OVER (PARTITION BY {user_col} ORDER BY rn
                                  ROWS UNBOUNDED PRECEDING))) >= {h} AS alarm
FROM b
"""


def interval_schedule(
    df: DataFrame,
    user_col: str = "user_id",
    start_col: str = "t0",
    end_col: str = "t1",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted interval scheduling (classic DP, public literature) per
    key -> (user, n, best): the maximum total weight of pairwise
    non-overlapping intervals ([t0, t1), touching endpoints compatible).
    Sort by (end, start, weight), p(i) = last interval with end <= own
    start (binary search), dp[i] = max(dp[i-1], w_i + dp[p_i]) — exact
    int64 throughout.  One applyInPandas group per key (the ewma
    sequential-recurrence shape; keys parallelize); the oracle carries
    the dp LIST in a lockstep recursive CTE with the SAME precomputed
    predecessor ranks."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([end_col, start_col, weight_col],
                              kind="mergesort")
        s = pdf[start_col].to_numpy(dtype=np.int64)
        e = pdf[end_col].to_numpy(dtype=np.int64)
        w = pdf[weight_col].to_numpy(dtype=np.int64)
        n = len(s)
        # p[i]: count of intervals with end <= s[i]  (0 = none)
        p = np.searchsorted(e, s, side="right")
        dp = np.zeros(n + 1, dtype=np.int64)
        for i in range(1, n + 1):
            dp[i] = max(dp[i - 1], w[i - 1] + dp[p[i - 1]])
        return pd.DataFrame({
            user_col: pdf[user_col].iloc[:1],
            "n": [np.int64(n)],
            "best": [dp[n]],
        })

    return df.groupBy(user_col).applyInPandas(
        fn, schema=f"{user_col} long, n long, best long"
    )


def interval_schedule_sql(
    base_select: str,
    user_col: str = "user_id",
) -> str:
    """DuckDB replay of ``interval_schedule``; ``base_select`` ->
    (user, t0, t1, w).  Ranks and predecessor counts are plain window /
    join computations; the recursion appends dp[rn] to a carried LIST
    (dp list is 1-indexed over ranks, entry 0 implied by the
    list_extract NULL -> coalesce 0)."""
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT {user_col}, CAST(t0 AS BIGINT) AS t0, CAST(t1 AS BIGINT) AS t1,
         CAST(w AS BIGINT) AS w,
         CAST(row_number() OVER (PARTITION BY {user_col}
              ORDER BY t1, t0, w) AS BIGINT) AS rn
  FROM ({base_select}) s),
p AS MATERIALIZED (
  SELECT a.{user_col}, a.rn, a.w,
         (SELECT count(*) FROM b c
          WHERE c.{user_col} = a.{user_col} AND c.t1 <= a.t0) AS pr
  FROM b a),
rec AS (
  SELECT {user_col}, CAST(0 AS BIGINT) AS rn, [CAST(0 AS BIGINT)] AS dp
  FROM (SELECT DISTINCT {user_col} FROM b) u
  UNION ALL
  SELECT r.{user_col}, r.rn + 1,
         list_append(r.dp, GREATEST(
             r.dp[CAST(r.rn + 1 AS INT)],
             q.w + r.dp[CAST(q.pr + 1 AS INT)])) AS dp
  FROM rec r JOIN p q
    ON q.{user_col} = r.{user_col} AND q.rn = r.rn + 1)
SELECT r.{user_col}, r.rn AS n, r.dp[CAST(r.rn + 1 AS INT)] AS best
FROM rec r
JOIN (SELECT {user_col}, max(rn) AS mx FROM b GROUP BY 1) m
  ON m.{user_col} = r.{user_col} AND m.mx = r.rn"""


def rolling_ols(
    df: DataFrame,
    window: int = 16,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "y",
) -> DataFrame:
    """Rolling OLS slope per key -> (user, rn, num, den): over the last
    ``window`` rows (x = global rank), slope = num/den with
    num = n*sum(x*y) - sum(x)*sum(y) and den = n*sum(x^2) - sum(x)^2 —
    the exact-rational windowed trend (the streaming beta / drift
    detector).  Four window sums sharing one exchange, pure codegen."""
    from pyspark.sql import Window

    w_ord = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wf = w_ord.rowsBetween(-(int(window) - 1), Window.currentRow)
    d = df.select(
        F.col(user_col), F.col(ts_col), F.col(id_col),
        F.col(value_col).cast("long").alias("y"),
    ).withColumn("rn", F.row_number().over(w_ord).cast("long"))
    x = F.col("rn")
    n = F.count(F.lit(1)).over(wf)
    sx = F.sum(x).over(wf)
    sy = F.sum("y").over(wf)
    sxy = F.sum(x * F.col("y")).over(wf)
    sxx = F.sum(x * x).over(wf)
    return d.select(
        user_col, "rn",
        (n * sxy - sx * sy).alias("num"),
        (n * sxx - sx * sx).alias("den"),
    )


def rolling_ols_sql(
    base_select: str,
    window: int = 16,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "y",
) -> str:
    """DuckDB twin of ``rolling_ols`` (identical window sums)."""
    wspec = (f"(PARTITION BY {user_col} ORDER BY rn "
             f"ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW)")
    return f"""
WITH b AS (
  SELECT {user_col}, CAST({value_col} AS BIGINT) AS y,
         CAST(row_number() OVER (PARTITION BY {user_col}
              ORDER BY {ts_col}, {id_col}) AS BIGINT) AS rn
  FROM ({base_select}) s)
SELECT {user_col}, rn,
       count(*) OVER {wspec} * sum(rn * y) OVER {wspec}
         - sum(rn) OVER {wspec} * sum(y) OVER {wspec} AS num,
       count(*) OVER {wspec} * sum(rn * rn) OVER {wspec}
         - sum(rn) OVER {wspec} * sum(rn) OVER {wspec} AS den
FROM b"""


def max_subarray(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> DataFrame:
    """Maximum-sum contiguous subarray (Kadane) as pure window codegen.

    Uses the prefix-extremum identity (the cusum lesson): the best sum of a
    nonempty run ending at t is ``S_t - min(0, min_{s<t} S_s)`` where S is
    the running prefix sum — no recurrence, no applyInPandas; two window
    passes (min-over-running-sum cannot nest) and one row_number pick.
    Scale shape: everything is per-key windows — one shuffle on the key,
    arbitrarily many keys.  Tie rule: earliest end rank wins.

    Reference parity note: SIS has no sequence analytics; this extends the
    engine's exact-statistics suite (U/math/Statistics.java is the closest
    reference analog — streaming accumulators over ordered values).
    """
    word = Window.partitionBy(key_col).orderBy(order_col)
    wsum = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wprev = word.rowsBetween(Window.unboundedPreceding, -1)
    zero = F.lit(0).cast("long")
    d = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("v"))
        .withColumn("s", F.sum("v").over(wsum))
        .withColumn("rn", F.row_number().over(word).cast("long"))
    )
    d = d.withColumn(
        "best",
        F.col("s") - F.least(zero, F.coalesce(F.min("s").over(wprev), zero)),
    )
    pick = Window.partitionBy(key_col).orderBy(F.col("best").desc(), "rn")
    return (
        d.withColumn("pk", F.row_number().over(pick))
        .filter(F.col("pk") == 1)
        .select(F.col(key_col), F.col("best").alias("max_sum"), F.col("rn").alias("end_rank"))
    )


def max_subarray_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> str:
    """DuckDB twin of ``max_subarray`` (same two window passes)."""
    return f"""
WITH b AS (
  SELECT {key_col}, {order_col}, CAST({value_col} AS BIGINT) AS v
  FROM ({base_select}) s),
p AS (
  SELECT {key_col}, {order_col}, v,
         sum(v) OVER (PARTITION BY {key_col} ORDER BY {order_col}
                      ROWS UNBOUNDED PRECEDING) AS s,
         CAST(row_number() OVER (PARTITION BY {key_col} ORDER BY {order_col})
              AS BIGINT) AS rn
  FROM b),
q AS (
  SELECT {key_col}, rn,
         s - least(0, coalesce(min(s) OVER (PARTITION BY {key_col} ORDER BY {order_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS best
  FROM p)
SELECT {key_col}, best AS max_sum, rn AS end_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_col}
      ORDER BY best DESC, rn) AS pk FROM q) r
WHERE pk = 1"""


def wht64(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
    n: int = 64,
) -> DataFrame:
    """Walsh-Hadamard transform of each key's first ``n`` (power of two)
    samples, EXACT: WHT[k] = sum_i v_i * (-1)^popcount(i AND k) — the
    closed form over bit_count, all int64, missing trailing samples are
    zeros.  The +/-1 kernel makes the spectrum oracle-replayable where a
    DFT's cos/sin cannot be (dft pins quantized values; this is exact).

    Scale shape: one window rank, one n-way explode, one map-side-combined
    aggregation — O(n^2) work per key with tiny constants (n=64 -> 4096
    terms), embarrassingly parallel across keys.  The butterfly O(n log n)
    form is the documented single-key-giant-signal path."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    d = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("v"))
        .withColumn("i", (F.row_number().over(word) - 1).cast("long"))
        .filter(F.col("i") < n)
    )
    ex = d.select(
        key_col, "i", "v",
        F.explode(F.sequence(F.lit(0), F.lit(int(n) - 1))).alias("k"),
    )
    sgn = 1 - 2 * (F.expr("bit_count(i & k)") % 2)
    return (
        ex.groupBy(key_col, "k")
        .agg(F.sum(F.col("v") * sgn).alias("coef"))
        .select(key_col, F.col("k").cast("long").alias("k"), "coef")
    )


def wht64_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
    n: int = 64,
) -> str:
    """DuckDB twin of ``wht64``."""
    return f"""
WITH b AS (
  SELECT {key_col}, CAST({value_col} AS BIGINT) AS v,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) - 1 AS BIGINT) AS i
  FROM ({base_select}) s),
ex AS (
  SELECT {key_col}, i, v, k.k
  FROM b, (SELECT unnest(range({int(n)})) AS k) k
  WHERE i < {int(n)})
SELECT {key_col}, k, sum(v * (1 - 2 * (bit_count(i & k) % 2))) AS coef
FROM ex GROUP BY 1, 2"""


def max_drawdown(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> DataFrame:
    """Maximum drawdown of each key's cumulative signal, pure window
    codegen: s = running sum of v, dd_t = running max(s) - s_t, answer =
    max dd with the earliest rank on ties — kadane's prefix-extremum
    sibling (peak-to-trough instead of trough-to-peak)."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    wrun = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("v"))
        .withColumn("s", F.sum("v").over(wrun))
        .withColumn("rn", F.row_number().over(word).cast("long"))
        .withColumn("dd", F.max("s").over(wrun) - F.col("s"))
    )
    pick = Window.partitionBy(key_col).orderBy(F.col("dd").desc(), "rn")
    return (
        d.withColumn("pk", F.row_number().over(pick))
        .filter(F.col("pk") == 1)
        .select(key_col, F.col("dd").alias("max_dd"), F.col("rn").alias("at_rank"))
    )


def max_drawdown_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> str:
    """DuckDB twin of ``max_drawdown``."""
    return f"""
WITH b AS (
  SELECT {key_col}, {order_col}, CAST({value_col} AS BIGINT) AS v
  FROM ({base_select}) s),
p AS (
  SELECT {key_col}, {order_col},
         sum(v) OVER (PARTITION BY {key_col} ORDER BY {order_col}
                      ROWS UNBOUNDED PRECEDING) AS s,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM b),
d AS (
  SELECT {key_col},
         max(s) OVER (PARTITION BY {key_col} ORDER BY {order_col}
                      ROWS UNBOUNDED PRECEDING) - s AS dd,
         rn
  FROM p)
SELECT {key_col}, dd AS max_dd, rn AS at_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY {key_col}
      ORDER BY dd DESC, rn) AS pk FROM d) r
WHERE pk = 1"""


def ohlc_bars(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    price_col: str = "price",
    bucket_col: str = "bucket",
) -> DataFrame:
    """OHLC candle aggregation per (key, bucket): open/close are the
    prices at the min/max order key (min_by/max_by — tie-free because the
    order key is unique), high/low are extremes, volume the row count —
    one map-side-combined aggregation, the canonical time-series
    downsampling of market/telemetry feeds."""
    return (
        df.groupBy(key_col, bucket_col)
        .agg(
            F.min_by(price_col, order_col).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, order_col).alias("close"),
            F.count("*").alias("volume"),
        )
    )


def ohlc_bars_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    price_col: str = "price",
    bucket_col: str = "bucket",
) -> str:
    """DuckDB twin of ``ohlc_bars`` (arg_min/arg_max)."""
    return f"""
SELECT {key_col}, {bucket_col},
       arg_min({price_col}, {order_col}) AS open,
       max({price_col}) AS high,
       min({price_col}) AS low,
       arg_max({price_col}, {order_col}) AS close,
       count(*) AS volume
FROM ({base_select}) s
GROUP BY 1, 2"""


def _varint_bytes(col):
    """Bytes of an unsigned LEB128 varint for a zigzagged int64 column."""
    return (
        F.when(col < 128, 1)
        .when(col < 16384, 2)
        .when(col < 1 << 21, 3)
        .when(col < 1 << 28, 4)
        .when(col < 1 << 35, 5)
        .when(col < 1 << 42, 6)
        .when(col < 1 << 49, 7)
        .when(col < 1 << 56, 8)
        .otherwise(9)
        .cast("long")
    )


def gorilla_size(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> DataFrame:
    """Gorilla/Prometheus-style compressed-size estimate per key: the
    first sample costs 8 bytes, the second the varint of its zigzagged
    delta, the rest the varint of the zigzagged delta-of-delta — the
    standard time-series storage model (Facebook Gorilla, public paper),
    with byte counts exact integers (zigzag z = 2|x| - [x<0]; LEB128
    thresholds as CASE arms).  The what-will-this-cost planner for
    telemetry retention.

    Scale shape: two lag windows + one aggregation, all codegen."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    d = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("v"))
        .withColumn("d1", F.col("v") - F.lag("v").over(word))
        .withColumn("dod", F.col("d1") - F.lag("d1").over(word))
        .withColumn("rn", F.row_number().over(word))
    )
    enc = F.when(F.col("rn") == 1, F.lit(8).cast("long")).otherwise(
        _varint_bytes(
            2 * F.abs(F.coalesce(F.col("dod"), F.col("d1")))
            - F.when(F.coalesce(F.col("dod"), F.col("d1")) < 0, 1).otherwise(0)
        )
    )
    return (
        d.withColumn("bytes", enc)
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n"),
            F.sum("bytes").alias("total_bytes"),
            F.max("bytes").alias("max_bytes"),
        )
    )


def gorilla_size_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> str:
    """DuckDB twin of ``gorilla_size``."""
    z = "(2 * abs(coalesce(dod, d1)) - CASE WHEN coalesce(dod, d1) < 0 THEN 1 ELSE 0 END)"
    arms = " ".join(
        f"WHEN {z} < {1 << (7 * k)} THEN {k}" for k in range(1, 9)
    )
    return f"""
WITH b AS (
  SELECT {key_col}, {order_col}, CAST({value_col} AS BIGINT) AS v
  FROM ({base_select}) s),
d0 AS (
  SELECT {key_col}, {order_col},
         v - lag(v) OVER w AS d1,
         row_number() OVER w AS rn
  FROM b WINDOW w AS (PARTITION BY {key_col} ORDER BY {order_col})),
d AS (
  SELECT {key_col}, d1,
         d1 - lag(d1) OVER (PARTITION BY {key_col} ORDER BY {order_col}) AS dod,
         rn
  FROM d0)
SELECT {key_col}, count(*) AS n,
       sum(CASE WHEN rn = 1 THEN 8 ELSE CASE {arms} ELSE 9 END END) AS total_bytes,
       max(CASE WHEN rn = 1 THEN 8 ELSE CASE {arms} ELSE 9 END END) AS max_bytes
FROM d GROUP BY 1"""


def sliding_distinct(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "val",
    window: int = 8,
) -> DataFrame:
    """Distinct values among the last ``window`` rows per key (sliding
    COUNT(DISTINCT) — which window frames cannot express in either
    engine): each row CONTRIBUTES its value to the next ``window`` ranks
    via a bounded explode, and one count-distinct per (key, target rank)
    collects them; the semi-join back to real ranks drops phantom targets
    past the series end.

    Scale shape: fan-out = window (constant), one keyed aggregation —
    the same shape at any data size; no per-key state."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    d = df.select(
        key_col, order_col, F.col(value_col).alias("val")
    ).withColumn("rn", F.row_number().over(word).cast("long"))
    contrib = d.select(
        key_col, "val",
        F.explode(F.sequence(F.col("rn"),
                             F.col("rn") + F.lit(int(window) - 1))).alias("trn"),
    )
    targets = d.select(key_col, F.col("rn").alias("trn"),
                       F.col(order_col).alias("o"))
    return (
        contrib.join(targets, [key_col, "trn"])
        .groupBy(key_col, "trn", "o")
        .agg(F.countDistinct("val").alias("n_distinct"))
        .select(key_col, F.col("o").alias(order_col),
                F.col("trn").alias("rn"), "n_distinct")
    )


def sliding_distinct_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "val",
    window: int = 8,
) -> str:
    """DuckDB twin of ``sliding_distinct``."""
    return f"""
WITH d AS (
  SELECT {key_col}, {order_col}, {value_col} AS val,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s),
contrib AS (
  SELECT {key_col}, val, rn + j.j AS trn
  FROM d, (SELECT unnest(range({int(window)})) AS j) j)
SELECT c.{key_col}, t.{order_col}, t.rn, count(DISTINCT c.val) AS n_distinct
FROM contrib c JOIN d t ON t.{key_col} = c.{key_col} AND t.rn = c.trn
GROUP BY 1, 2, 3"""


def spectral_flux(
    df: DataFrame,
    key_col: str = "user_id",
    t_col: str = "t",
    x_col: str = "x",
    period: int = 32,
    freqs: tuple = (1, 2, 3, 4),
    threshold: int = 0,
    guard: int = 2,
) -> DataFrame:
    """Spectral-flux onset detection (the classic audio novelty function,
    public literature) over fixed frames: per frame the quantized-LUT DFT
    energies E_f = (c^2 + s^2) div 2^20 (keep |x| <= ~90 so c^2 fits
    int64), flux = sum_f max(0, E_f - E_f(prev frame)), and an ONSET is a
    frame whose flux exceeds ``threshold`` and wins the packed-key
    +/-guard NMS (the shot_cuts rule on the spectral novelty instead of
    pixel SAD).

    Scale shape: the dft_coeffs LUT aggregation per (key, frame) + two
    windows — map-side combined, no FP, no trig."""
    d = df.select(
        key_col,
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    ).withColumn("frame", F.expr(f"t div {int(period)}"))
    co = dft_coeffs(d, t_col="t", x_col="x", key_cols=(key_col, "frame"),
                    period=period, freqs=freqs)
    e = co.select(
        key_col, "frame", "freq",
        F.expr("(c * c + s * s) div 1048576").alias("e"),
    )
    wl = Window.partitionBy(key_col, "freq").orderBy("frame")
    d2 = e.withColumn(
        "d", F.greatest(F.lit(0).cast("long"),
                        F.col("e") - F.coalesce(F.lag("e").over(wl), F.col("e")))
    )
    flux = d2.groupBy(key_col, "frame").agg(F.sum("d").alias("flux"))
    word = Window.partitionBy(key_col).orderBy("frame")
    wnb = word.rowsBetween(-int(guard), int(guard))
    pk = F.col("flux") * F.lit(1048576) + (F.lit(1048575) - F.col("frame"))
    return (
        flux.withColumn("pk", pk)
        .withColumn(
            "is_onset",
            (F.col("flux") > int(threshold))
            & (F.col("pk") == F.max("pk").over(wnb)),
        )
        .select(key_col, "frame", "flux", "is_onset")
    )


def spectral_flux_sql(
    base_select: str,
    key_col: str = "user_id",
    t_col: str = "t",
    x_col: str = "x",
    period: int = 32,
    freqs: tuple = (1, 2, 3, 4),
    threshold: int = 0,
    guard: int = 2,
) -> str:
    """DuckDB twin of ``spectral_flux``."""
    inner = (f"SELECT {key_col}, t % {int(period)} AS t, "
             f"t // {int(period)} AS frame, x FROM ("
             f"SELECT {key_col}, CAST({t_col} AS BIGINT) AS t, "
             f"CAST({x_col} AS BIGINT) AS x FROM ({base_select}) s0) s1")
    co = dft_coeffs_sql(inner, t_col="t", x_col="x",
                        key_cols=(key_col, "frame"),
                        period=period, freqs=freqs)
    return f"""
WITH co AS ({co}),
e AS (SELECT {key_col}, frame, freq, (c * c + s * s) // 1048576 AS e FROM co),
d AS (
  SELECT {key_col}, frame,
         greatest(0, e - coalesce(lag(e) OVER (PARTITION BY {key_col}, freq
             ORDER BY frame), e)) AS d
  FROM e),
flux AS (
  SELECT {key_col}, frame, sum(d) AS flux FROM d GROUP BY 1, 2),
p AS (
  SELECT {key_col}, frame, flux,
         flux * 1048576 + (1048575 - frame) AS pk
  FROM flux)
SELECT {key_col}, frame, flux,
       (flux > {int(threshold)} AND pk = max(pk) OVER (
           PARTITION BY {key_col} ORDER BY frame
           ROWS BETWEEN {int(guard)} PRECEDING AND {int(guard)} FOLLOWING))
         AS is_onset
FROM p"""


def mann_kendall(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
    cap: int = 40,
) -> DataFrame:
    """Mann-Kendall trend test per key, EXACT: S = sum over i<j of
    sign(x_j - x_i) and the tie-corrected variance NUMERATOR
    18*Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) — both pure int64, so
    the classic hydrology trend test (Mann 1945 / Kendall, public
    literature) emits with no FP; the z-statistic is derivable downstream
    (the Theil-Sen gate supplies the matching slope estimate).

    First ``cap`` rows per key (the bounded pairwise join contract).
    Output: (key, n, s, var18)."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    b = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("x"))
        .withColumn("rn", F.row_number().over(word).cast("long"))
        .filter(F.col("rn") <= int(cap))
    )
    a = b.select(key_col, F.col("rn").alias("ri"), F.col("x").alias("xi"))
    c = b.select(key_col, F.col("rn").alias("rj"), F.col("x").alias("xj"))
    pairs = a.join(c, key_col).filter(F.col("ri") < F.col("rj"))
    s = pairs.groupBy(key_col).agg(
        F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long")).alias("s")
    )
    ties = (
        b.groupBy(key_col, "x").agg(F.count(F.lit(1)).alias("t"))
        .groupBy(key_col)
        .agg(
            F.sum("t").alias("n"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias("tt"),
        )
    )
    return (
        s.join(ties, key_col)
        .select(
            key_col, "n", "s",
            (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
             - F.col("tt")).alias("var18"),
        )
    )


def mann_kendall_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
    cap: int = 40,
) -> str:
    """DuckDB twin of ``mann_kendall``."""
    return f"""
WITH b AS (
  SELECT {key_col}, CAST({value_col} AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s0
  QUALIFY rn <= {int(cap)}),
s AS (
  SELECT a.{key_col}, sum(CASE WHEN c.x > a.x THEN 1
                               WHEN c.x < a.x THEN -1 ELSE 0 END) AS s
  FROM b a JOIN b c ON c.{key_col} = a.{key_col} AND a.rn < c.rn
  GROUP BY 1),
ties AS (
  SELECT {key_col}, sum(t) AS n,
         sum(t * (t - 1) * (2 * t + 5)) AS tt
  FROM (SELECT {key_col}, x, count(*) AS t FROM b GROUP BY 1, 2) q
  GROUP BY 1)
SELECT s.{key_col}, ties.n, s.s,
       ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tt AS var18
FROM s JOIN ties ON ties.{key_col} = s.{key_col}"""


def lindley_waits(
    df: DataFrame,
    key_col: str = "server",
    order_col: str = "n",
    service_col: str = "s",
    inter_col: str = "a",
) -> DataFrame:
    """G/G/1 waiting times by the Lindley recursion
    W_{n+1} = max(0, W_n + S_n - A_{n+1}), solved in CLOSED FORM via the
    prefix-extremum identity (the kadane/cusum discipline): with
    U = cumsum(S_prev - A), W_n = U_n - min(0, min prefix U) — two window
    passes, no recurrence, exact integers.  The queueing-theory workload
    simulator as pure codegen.

    Output: (key, n, wait)."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    wrun = word.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    zero = F.lit(0).cast("long")
    d = (
        df.select(key_col, order_col,
                  F.col(service_col).cast("long").alias("s"),
                  F.col(inter_col).cast("long").alias("a"))
        .withColumn("inc", F.coalesce(F.lag("s").over(word), zero) - F.col("a"))
        .withColumn("u", F.sum("inc").over(wrun))
    )
    return d.withColumn(
        "wait",
        F.col("u") - F.least(zero, F.min("u").over(wrun)),
    ).select(key_col, order_col, "wait")


def lindley_waits_sql(
    base_select: str,
    key_col: str = "server",
    order_col: str = "n",
    service_col: str = "s",
    inter_col: str = "a",
) -> str:
    """DuckDB twin of ``lindley_waits`` (two window passes)."""
    return f"""
WITH b AS (
  SELECT {key_col}, {order_col}, CAST({service_col} AS BIGINT) AS s,
         CAST({inter_col} AS BIGINT) AS a
  FROM ({base_select}) q),
i AS (
  SELECT {key_col}, {order_col},
         coalesce(lag(s) OVER (PARTITION BY {key_col}
                               ORDER BY {order_col}), 0) - a AS inc
  FROM b),
u AS (
  SELECT {key_col}, {order_col},
         sum(inc) OVER (PARTITION BY {key_col} ORDER BY {order_col}
                        ROWS UNBOUNDED PRECEDING) AS u
  FROM i)
SELECT {key_col}, {order_col},
       u - least(0, min(u) OVER (PARTITION BY {key_col} ORDER BY {order_col}
                                 ROWS UNBOUNDED PRECEDING)) AS wait
FROM u"""


def hdr_histogram(
    df: DataFrame,
    key_col: str = "g",
    value_col: str = "v",
    mantissa_bits: int = 2,
) -> DataFrame:
    """Log-bucketed latency histogram (the HdrHistogram layout, public):
    bucket = (bit length of v, the top ``mantissa_bits`` mantissa bits) —
    exponentially-spaced buckets with bounded relative error, computed by
    the exact length(bin()) integer log2 (no FP log).  Percentile reads
    are downstream sums.  One map-side-combined aggregation.

    Output: (g, exp, mant, n, v_min, v_max) per occupied bucket."""
    mb = int(mantissa_bits)
    e = F.expr("length(bin(v))").cast("long")
    mant = F.expr(
        f"CASE WHEN length(bin(v)) <= {mb} THEN 0 "
        f"ELSE (v div (CASE length(bin(v)) "
        + " ".join(f"WHEN {k} THEN {1 << (k - 1 - mb)}"
                   for k in range(mb + 1, 64)) + " END)) % " + str(1 << mb)
        + " END"
    ).cast("long")
    b = df.select(
        F.col(key_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v") > 0)
    return (
        b.withColumn("exp", e).withColumn("mant", mant)
        .groupBy("g", "exp", "mant")
        .agg(F.count("*").alias("n"), F.min("v").alias("v_min"),
             F.max("v").alias("v_max"))
    )


def hdr_histogram_sql(
    base_select: str,
    key_col: str = "g",
    value_col: str = "v",
    mantissa_bits: int = 2,
) -> str:
    """DuckDB twin of ``hdr_histogram``."""
    mb = int(mantissa_bits)
    arms = " ".join(f"WHEN {k} THEN {1 << (k - 1 - mb)}"
                    for k in range(mb + 1, 64))
    mant = (f"CASE WHEN length(bin(v)) <= {mb} THEN 0 "
            f"ELSE (v // (CASE length(bin(v)) {arms} END)) % {1 << mb} END")
    return f"""
WITH b AS (
  SELECT {key_col} AS g, CAST({value_col} AS BIGINT) AS v
  FROM ({base_select}) s WHERE {value_col} > 0)
SELECT g, CAST(length(bin(v)) AS BIGINT) AS exp,
       CAST({mant} AS BIGINT) AS mant,
       count(*) AS n, min(v) AS v_min, max(v) AS v_max
FROM b GROUP BY 1, 2, 3"""


def seasonal_medians(
    df: DataFrame,
    period: int = 7,
    trend_window: int = 15,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> DataFrame:
    """Robust seasonal decomposition (the median-based STL-lite of
    robust statistics): trend = centered rolling MEDIAN (exact odd-window
    order statistic), detrended = v - trend, seasonal(phase) = exact
    lower median of the detrended values at that phase (rank div 2 + 1
    order stat), remainder = detrended - seasonal.  Everything an integer
    order statistic — no FP, outlier-immune.

    Output: (key, order, v, trend, phase, seasonal, remainder); edge rows
    without a full trend window emit NULL trend/remainder (documented).

    Scale shape: one sliding window (sorted small array via
    array_sort(collect_list) over the frame), one phase aggregation, two
    joins back — all keyed."""
    w = int(trend_window)
    half = w // 2
    word = Window.partitionBy(key_col).orderBy(order_col)
    wfr = word.rowsBetween(-half, half)
    b = (
        df.select(key_col, order_col, F.col(value_col).cast("long").alias("v"))
        .withColumn("rn", F.row_number().over(word).cast("long"))
        .withColumn("arr", F.array_sort(F.collect_list("v").over(wfr)))
        .withColumn(
            "trend",
            F.when(F.size("arr") == w,
                   F.element_at("arr", half + 1)).cast("long"),
        )
        .drop("arr")
        .withColumn("phase", ((F.col("rn") - 1) % period).cast("long"))
        .withColumn("det", F.col("v") - F.col("trend"))
    )
    wp = Window.partitionBy(key_col, "phase").orderBy("det", "rn")
    wpc = Window.partitionBy(key_col, "phase")
    seas = (
        b.filter(F.col("det").isNotNull())
        .withColumn("r", F.row_number().over(wp).cast("long"))
        .withColumn("cnt", F.count(F.lit(1)).over(wpc).cast("long"))
        .filter(F.col("r") == F.expr("cnt div 2 + 1"))
        .select(key_col, "phase", F.col("det").alias("seasonal"))
    )
    return (
        b.join(seas, [key_col, "phase"], "left")
        .select(
            key_col, order_col, "v", "trend", "phase", "seasonal",
            (F.col("det") - F.col("seasonal")).alias("remainder"),
        )
    )


def seasonal_medians_sql(
    base_select: str,
    period: int = 7,
    trend_window: int = 15,
    key_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "v",
) -> str:
    """DuckDB twin of ``seasonal_medians``."""
    w = int(trend_window)
    half = w // 2
    return f"""
WITH b0 AS (
  SELECT {key_col}, {order_col}, CAST({value_col} AS BIGINT) AS v,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn,
         list_sort(list(CAST({value_col} AS BIGINT)) OVER (
           PARTITION BY {key_col} ORDER BY {order_col}
           ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)) AS arr
  FROM ({base_select}) s),
b AS (
  SELECT {key_col}, {order_col}, v, rn,
         CASE WHEN len(arr) = {w} THEN arr[{half + 1}] END AS trend,
         (rn - 1) % {int(period)} AS phase,
         v - CASE WHEN len(arr) = {w} THEN arr[{half + 1}] END AS det
  FROM b0),
seas AS (
  SELECT {key_col}, phase, det AS seasonal FROM (
    SELECT {key_col}, phase, det,
           row_number() OVER (PARTITION BY {key_col}, phase
                              ORDER BY det, rn) AS r,
           count(*) OVER (PARTITION BY {key_col}, phase) AS cnt
    FROM b WHERE det IS NOT NULL) q
  WHERE r = cnt // 2 + 1)
SELECT b.{key_col}, b.{order_col}, b.v, b.trend, b.phase, s.seasonal,
       b.det - s.seasonal AS remainder
FROM b LEFT JOIN seas s
  ON s.{key_col} = b.{key_col} AND s.phase = b.phase"""


ALLEN_RELATIONS = [
    "precedes", "meets", "overlaps", "finished_by", "contains", "starts",
    "equals", "started_by", "during", "finishes", "overlapped_by",
    "met_by", "preceded_by",
]


def allen_join(
    intervals: DataFrame,
    key_col: str = "user_id",
    id_col: str = "iid",
    t0_col: str = "t0",
    t1_col: str = "t1",
) -> DataFrame:
    """Allen-relation labeling join (Allen 1983 interval algebra — the
    engine's temporal_allen predicates turned into a classifying JOIN):
    every ordered pair of a key's intervals (a.id < b.id) is labeled with
    exactly one of the 13 relations by pure endpoint comparisons.

    Output: (key, a_id, b_id, relation).  Scale shape: one self-equi-join
    on the key (per-key counts bound the fan-out) + codegen CASE — the
    exhaustive relation matrix the reference's TemporalFilter
    (F/filter/TemporalFilter.java) evaluates one predicate at a time."""
    b = intervals.select(
        F.col(key_col).alias("k"), F.col(id_col).cast("long").alias("iid"),
        F.col(t0_col).cast("long").alias("t0"),
        F.col(t1_col).cast("long").alias("t1"),
    )
    a = b.select(F.col("k"), F.col("iid").alias("a_id"),
                 F.col("t0").alias("a0"), F.col("t1").alias("a1"))
    c = b.select(F.col("k"), F.col("iid").alias("b_id"),
                 F.col("t0").alias("b0"), F.col("t1").alias("b1"))
    rel = F.expr("""
        CASE
          WHEN a1 < b0 THEN 'precedes'
          WHEN a1 = b0 THEN 'meets'
          WHEN b1 < a0 THEN 'preceded_by'
          WHEN b1 = a0 THEN 'met_by'
          WHEN a0 = b0 AND a1 = b1 THEN 'equals'
          WHEN a0 = b0 AND a1 < b1 THEN 'starts'
          WHEN a0 = b0 AND a1 > b1 THEN 'started_by'
          WHEN a1 = b1 AND a0 > b0 THEN 'finishes'
          WHEN a1 = b1 AND a0 < b0 THEN 'finished_by'
          WHEN a0 > b0 AND a1 < b1 THEN 'during'
          WHEN a0 < b0 AND a1 > b1 THEN 'contains'
          WHEN a0 < b0 AND a1 > b0 AND a1 < b1 THEN 'overlaps'
          ELSE 'overlapped_by'
        END""")
    return (
        a.join(c, "k")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("k", "a_id", "b_id", rel.alias("relation"))
    )


def allen_join_sql(
    base_select: str,
    key_col: str = "user_id",
    id_col: str = "iid",
    t0_col: str = "t0",
    t1_col: str = "t1",
) -> str:
    """DuckDB twin of ``allen_join`` (identical CASE ladder)."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, CAST({id_col} AS BIGINT) AS iid,
         CAST({t0_col} AS BIGINT) AS t0, CAST({t1_col} AS BIGINT) AS t1
  FROM ({base_select}) s)
SELECT a.k, a.iid AS a_id, c.iid AS b_id,
       CASE
         WHEN a.t1 < c.t0 THEN 'precedes'
         WHEN a.t1 = c.t0 THEN 'meets'
         WHEN c.t1 < a.t0 THEN 'preceded_by'
         WHEN c.t1 = a.t0 THEN 'met_by'
         WHEN a.t0 = c.t0 AND a.t1 = c.t1 THEN 'equals'
         WHEN a.t0 = c.t0 AND a.t1 < c.t1 THEN 'starts'
         WHEN a.t0 = c.t0 AND a.t1 > c.t1 THEN 'started_by'
         WHEN a.t1 = c.t1 AND a.t0 > c.t0 THEN 'finishes'
         WHEN a.t1 = c.t1 AND a.t0 < c.t0 THEN 'finished_by'
         WHEN a.t0 > c.t0 AND a.t1 < c.t1 THEN 'during'
         WHEN a.t0 < c.t0 AND a.t1 > c.t1 THEN 'contains'
         WHEN a.t0 < c.t0 AND a.t1 > c.t0 AND a.t1 < c.t1 THEN 'overlaps'
         ELSE 'overlapped_by'
       END AS relation
FROM b a JOIN b c ON c.k = a.k AND a.iid < c.iid"""


def longest_streaks(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    flag_col: str = "hit",
) -> DataFrame:
    """Longest and current success streak per key (the gaps-and-islands
    trick): island id = rank - rank-among-hits, islands aggregate to
    lengths, the max and the currently-open streak (island touching the
    last row) read off — pure window codegen, the engagement/reliability
    metric every product dashboard carries.

    Output: (key, n, n_hits, longest, current)."""
    word = Window.partitionBy(key_col).orderBy(order_col)
    b = (
        df.select(key_col, order_col, F.col(flag_col).cast("long").alias("h"))
        .withColumn("rn", F.row_number().over(word).cast("long"))
        .withColumn("hr", F.sum("h").over(
            word.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    isl = (
        b.filter(F.col("h") == 1)
        .withColumn("island", F.col("rn") - F.row_number().over(word))
        .groupBy(key_col, "island")
        .agg(F.count(F.lit(1)).alias("len"), F.max("rn").alias("end_rn"))
    )
    tot = b.groupBy(key_col).agg(F.max("rn").alias("n"),
                                 F.sum("h").alias("n_hits"))
    agg = isl.groupBy(key_col).agg(F.max("len").alias("longest"))
    cur = (
        isl.join(tot, key_col)
        .filter(F.col("end_rn") == F.col("n"))
        .select(key_col, F.col("len").alias("current"))
    )
    return (
        tot.join(agg, key_col, "left")
        .join(cur, key_col, "left")
        .select(
            key_col, "n", "n_hits",
            F.coalesce("longest", F.lit(0)).cast("long").alias("longest"),
            F.coalesce("current", F.lit(0)).cast("long").alias("current"),
        )
    )


def longest_streaks_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    flag_col: str = "hit",
) -> str:
    """DuckDB twin of ``longest_streaks``."""
    return f"""
WITH b AS (
  SELECT {key_col}, CAST({flag_col} AS BIGINT) AS h,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s),
isl AS (
  SELECT {key_col},
         rn - row_number() OVER (PARTITION BY {key_col} ORDER BY rn) AS island,
         rn
  FROM b WHERE h = 1),
il AS (
  SELECT {key_col}, island, count(*) AS len, max(rn) AS end_rn
  FROM isl GROUP BY 1, 2),
tot AS (
  SELECT {key_col}, max(rn) AS n, sum(h) AS n_hits FROM b GROUP BY 1)
SELECT t.{key_col}, t.n, t.n_hits,
       coalesce(max(il.len), 0) AS longest,
       coalesce(max(CASE WHEN il.end_rn = t.n THEN il.len END), 0) AS current
FROM tot t LEFT JOIN il ON il.{key_col} = t.{key_col}
GROUP BY 1, 2, 3"""
