"""Deterministic sampling and dataset splitting for training-data pipelines.

Train/val/test assignment at 100 TB must be a PURE FUNCTION of the row key —
not of partitioning, row order, or Spark's RNG — so that reruns, resumed
checkpoints, and incremental appends all agree on every row's split.  The
standard construction: hash the key with a salt, map the hash to [0, 1),
compare against cumulative weights.

Everything here is whole-stage codegen over md5 (no Python, no shuffle) and
bit-replicable in SQL: the first 15 hex digits of md5 form a 60-bit integer
(the simhash gate's trick), giving a uniform u in [0, 2^60) that both
engines derive identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1 << 60


def hash_u60(key: Column, salt: str) -> Column:
    """Uniform 60-bit integer from (key, salt) — JVM codegen md5."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt)).cast("binary")), 1, 15),
        16, 10,
    ).cast("long")


def hash_u60_sql(key: str, salt: str) -> str:
    """DuckDB replica of hash_u60 (md5 of the same bytes, same 15 hex
    digits).  DuckDB md5() takes VARCHAR and hashes its UTF-8 bytes —
    identical to Spark's md5(cast(string as binary))."""
    from .dedup import _hex15_to_bigint_sql

    h = f"substr(md5(CAST({key} AS VARCHAR) || ':{salt}'), 1, 15)"
    # DuckDB lacks conv(): positional digit sum (the simhash oracle's trick)
    return f"CAST({_hex15_to_bigint_sql(h)} AS BIGINT)"


def hash_sample(df: DataFrame, rate: float, key_col: str, salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli sample: keeps row iff u(key) < rate * 2^60.
    Rerun-stable, append-stable, partitioning-independent — unlike
    DataFrame.sample, which is none of those."""
    thr = int(rate * _SCALE)
    return df.filter(hash_u60(F.col(key_col), salt) < F.lit(thr))


def split_column(key: Column, weights: dict[str, float], salt: str = "split") -> Column:
    """Split-name column from cumulative weight thresholds (weights must sum
    to ~1; the last split absorbs rounding)."""
    total = sum(weights.values())
    u = hash_u60(key, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        thr = int(acc * _SCALE)
        cond = u < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame, weights: dict[str, float], key_col: str, salt: str = "split"
) -> DataFrame:
    """Add a deterministic ``split`` column (train/val/test assignment)."""
    return df.withColumn("split", split_column(F.col(key_col), weights, salt))


def split_sql(key: str, weights: dict[str, float], salt: str = "split") -> str:
    """DuckDB replica of split_column."""
    total = sum(weights.values())
    u = hash_u60_sql(key, salt)
    names = list(weights)
    acc = 0.0
    arms = []
    for name in names[:-1]:
        acc += weights[name] / total
        arms.append(f"WHEN {u} < {int(acc * _SCALE)} THEN '{name}'")
    return "(CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END)"


def stratified_sample(
    df: DataFrame, rates: dict, strata_col: str, key_col: str, salt: str = "strata"
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample hot languages):
    rows in a stratum with no configured rate are dropped."""
    expr = None
    u = hash_u60(F.col(key_col), salt)
    for stratum, rate in rates.items():
        cond = (F.col(strata_col) == F.lit(stratum)) & (u < F.lit(int(rate * _SCALE)))
        expr = cond if expr is None else expr | cond
    return df.filter(expr if expr is not None else F.lit(False))


# ---------------------------------------------------------------- per-group caps / quantiles
# The other half of corpus curation: C4/RefinedWeb-style "keep at most K
# documents per domain" and exact per-group quantile reports for threshold
# picking.  Same determinism contract as the split/sample functions above
# (pure function of the row key, never of partitioning).

def _hash_hex_sql(key_sql: str, dialect: str) -> str:
    """md5 hex digest of the key rendered as text — identical 32-char hex in
    Spark (md5 over BINARY) and DuckDB (md5 over VARCHAR)."""
    if dialect == "spark":
        return f"md5(CAST(CAST({key_sql} AS STRING) AS BINARY))"
    return f"md5(CAST({key_sql} AS VARCHAR))"


def group_cap(df: DataFrame, group_col: str, k: int, key_col: str) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically by the md5
    of the row key (stable across re-runs, partitionings, cluster sizes).
    The per-domain document cap of C4-style curation.

    Output: input columns + ``grp_rank`` (1-based rank inside the group).
    One shuffle (window over the group key); hot groups stream through the
    rank — no group ever materializes in memory."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.expr(_hash_hex_sql(key_col, "spark")), key_col
    )
    return (
        df.withColumn("grp_rank", F.row_number().over(w))
        .filter(F.col("grp_rank") <= k)
    )


def group_cap_sql(k: int, group_col: str, key_col: str, rel: str = "documents",
                  cols: str = "*") -> str:
    h = _hash_hex_sql(key_col, "duckdb")
    return f"""
SELECT * FROM (
  SELECT {cols},
         CAST(row_number() OVER (PARTITION BY {group_col} ORDER BY {h}, {key_col}) AS BIGINT)
           AS grp_rank
  FROM {rel}) t
WHERE grp_rank <= {k}"""


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs=((1, 4), (1, 2), (3, 4), (9, 10))) -> DataFrame:
    """Exact per-group quantiles of ``value_col``: the q = num/den quantile is
    the element at 0-based index ``(n-1)*num DIV den`` of the group's sorted
    multiset — pure integer index arithmetic, no FP-interpolation ambiguity.

    Output: (group, q_num, q_den, q, value).  One shuffle on the group key
    (rank + count share the window pass); the quantile spec joins as a
    broadcast 4-row dimension so the ranked table is computed ONCE (a
    per-quantile union would re-run the window per branch)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col)
    ranked = df.select(group_col, value_col).withColumn(
        "__rn", F.row_number().over(w) - 1
    ).withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    spec = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(n), int(d)) for n, d in qs], "q_num int, q_den int"
        )
    )
    return ranked.join(
        spec, F.col("__rn") == F.expr("(__n - 1) * q_num DIV q_den")
    ).select(
        F.col(group_col),
        "q_num",
        "q_den",
        (F.col("q_num") / F.col("q_den")).alias("q"),
        F.col(value_col).alias("value"),
    )


def group_quantiles_sql(group_col: str, value_col: str, rel: str = "documents",
                        qs=((1, 4), (1, 2), (3, 4), (9, 10))) -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT {group_col}, CAST({num} AS INTEGER) AS q_num,
       CAST({den} AS INTEGER) AS q_den,
       CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) AS q,
       {value_col} AS value
FROM r WHERE rn = ((n - 1) * {num}) // {den}"""
        for num, den in qs
    )
    return f"""
WITH r AS (
  SELECT {group_col}, {value_col},
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) - 1 AS rn,
         count(*) OVER (PARTITION BY {group_col}) AS n
  FROM {rel})
{arms}"""


# ---------------------------------------------------------------- training order / mixing
def shuffle_assign(df: DataFrame, shards: int, key_col: str,
                   salt: str = "shuffle") -> DataFrame:
    """Deterministic global training order WITHOUT a global sort: shard =
    u60(key) % shards (a map-only codegen column), position = rank of
    u60 within the shard.  The concatenation (shard, pos) is a uniform
    reproducible permutation of the corpus — rerun/partitioning-stable,
    and the only shuffle is the per-shard window (each shard sorts
    independently; no single-task global ORDER BY bottleneck at 100 TB).

    Output: input columns + (shard int, pos long)."""
    from pyspark.sql import Window

    u = hash_u60(F.col(key_col), salt)
    with_shard = df.withColumn("shard", (u % shards).cast("int")).withColumn("__u", u)
    w = Window.partitionBy("shard").orderBy("__u", key_col)
    return (
        with_shard.withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .drop("__u")
    )


def shuffle_assign_sql(shards: int, key_col: str, rel: str = "documents",
                       salt: str = "shuffle", cols: str = "*") -> str:
    u = hash_u60_sql(key_col, salt)
    return f"""
SELECT {cols},
       CAST(({u}) % {shards} AS INTEGER) AS shard,
       CAST(row_number() OVER (
           PARTITION BY ({u}) % {shards} ORDER BY {u}, {key_col}) AS BIGINT) - 1 AS pos
FROM {rel}"""


def mixture_rates(df: DataFrame, source_col: str, weights: dict[str, int]) -> DataFrame:
    """Data-mixing rate computation (the Pile/Dolma source-weighting step):
    given INTEGER target proportions ``weights`` (source -> parts; the
    denominator is their sum), find the largest total corpus size T
    achievable without upsampling any source, and the per-source keep
    rates that realize it.

    All sizing is integer arithmetic (T = min_s floor(n_s * W / w_s),
    target_n_s = T * w_s DIV W), so both engines agree bit-exactly; only
    the final convenience ``rate`` is an int/int double.

    Output: (source, n, weight, target_n, rate).  One groupBy + a
    broadcast weights dimension + a single-row broadcast min — nothing
    driver-side."""
    wsum = sum(weights.values())
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(s, int(w)) for s, w in weights.items()], f"{source_col} string, weight int"
        )
    )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).join(
        wdf, source_col
    )
    t = counts.agg(
        F.min(F.expr(f"n * {wsum} DIV weight")).alias("t")
    )
    return (
        counts.crossJoin(F.broadcast(t))
        .select(
            source_col,
            "n",
            "weight",
            F.expr(f"t * weight DIV {wsum}").alias("target_n"),
            F.expr("CAST(t * weight DIV " + str(wsum) + " AS DOUBLE) / CAST(n AS DOUBLE)").alias("rate"),
        )
    )


def mixture_rates_sql(source_col: str, weights: dict[str, int],
                      rel: str = "documents") -> str:
    wsum = sum(weights.values())
    vals = ", ".join(f"('{s}', {int(w)})" for s, w in weights.items())
    return f"""
WITH wts({source_col}, weight) AS (VALUES {vals}),
c AS (SELECT {source_col}, CAST(count(*) AS BIGINT) AS n
      FROM {rel} GROUP BY {source_col}),
cw AS (SELECT c.{source_col}, c.n, wts.weight FROM c JOIN wts USING ({source_col})),
t AS (SELECT CAST(min((n * {wsum}) // weight) AS BIGINT) AS t FROM cw)
SELECT {source_col}, n, weight,
       CAST((t * weight) // {wsum} AS BIGINT) AS target_n,
       CAST((t * weight) // {wsum} AS DOUBLE) / CAST(n AS DOUBLE) AS rate
FROM cw CROSS JOIN t"""


def _u60_expr_text(key: str, salt: str) -> str:
    """Spark-SQL text form of hash_u60 (needed where the composition must
    stay integer, e.g. a DIV that a double division would round at 2^60)."""
    return (
        f"conv(substring(md5(cast(concat(cast({key} AS STRING), ':{salt}') "
        f"AS BINARY)), 1, 15), 16, 10)"
    )


def weighted_topk(
    df: DataFrame, k: int, weight_col: str, key_col: str, salt: str = "wsample"
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: integer priority
    sampling — priority = u60(key) DIV max(weight, 1), keep the k smallest.

    Selection probability grows with weight (the A-ES/priority-sampling
    shape) while staying a pure function of (key, weight): rerun-stable,
    append-stable, partitioning-independent.  Integer DIV, not FP division —
    u60 is 60 bits and a double quotient would round away the low bits.
    The orderBy().limit(k) plan compiles to TakeOrderedAndProject (per-
    partition partial top-k + size-k final merge — no global sort)."""
    pri = F.expr(
        f"CAST({_u60_expr_text(key_col, salt)} AS BIGINT) "
        f"DIV greatest(CAST({weight_col} AS BIGINT), 1)"
    )
    return (
        df.withColumn("priority", pri)
        .orderBy("priority", key_col)
        .limit(k)
    )


def weighted_topk_sql(
    k: int, weight_col: str, key_col: str, salt: str = "wsample",
    rel: str = "documents",
) -> str:
    u = hash_u60_sql(key_col, salt)
    return (
        f"SELECT *, ({u}) // greatest(CAST({weight_col} AS BIGINT), 1) AS priority "
        f"FROM {rel} ORDER BY priority, {key_col} LIMIT {k}"
    )


def temporal_group_split(
    df: DataFrame,
    n_splits: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Temporal-leakage-safe dataset split -> (k, first_ts, split):
    groups (users) ordered by FIRST-SEEN time and cut into ``n_splits``
    contiguous ntile buckets — every group lands wholly in one split and
    later-arriving groups never leak into earlier splits (the temporal
    GroupShuffleSplit every training pipeline needs).  Deterministic
    ties by group key; one aggregation + one ntile window."""
    from pyspark.sql import Window, functions as F

    per = df.groupBy(F.col(key_col).alias("k")).agg(
        F.min(F.col(ts_col)).alias("first_ts")
    )
    w = Window.orderBy(F.col("first_ts").asc(), F.col("k").asc())
    return per.select(
        "k", "first_ts",
        F.ntile(int(n_splits)).over(w).cast("long").alias("split"),
    )


def temporal_group_split_sql(
    base_select: str,
    n_splits: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
) -> str:
    """DuckDB replay of ``temporal_group_split``."""
    return f"""
WITH per AS (
  SELECT {key_col} AS k, CAST(min({ts_col}) AS BIGINT) AS first_ts
  FROM ({base_select}) s GROUP BY 1)
SELECT k, first_ts,
       CAST(ntile({int(n_splits)}) OVER (ORDER BY first_ts ASC, k ASC)
            AS BIGINT) AS split
FROM per"""


def _poisson1_thresholds(max_w: int = 6) -> list[int]:
    """floor(CDF_k(Poisson(1)) * 2^60) for k = 0..max_w-1 — exact int64
    constants computed once and shared verbatim by both engines."""
    import math

    cum, term = 0.0, math.exp(-1.0)
    out = []
    for k in range(max_w):
        cum += term
        out.append(int(cum * _SCALE))
        term /= (k + 1)
    return out


def poisson_bootstrap(
    df: DataFrame,
    n_boot: int,
    key_col: str,
    value_col: str,
    salt: str = "boot",
    max_w: int = 6,
) -> DataFrame:
    """Deterministic Poisson bootstrap (the distributed bootstrap of the
    public large-scale-inference literature: per-row resample weights are
    independent Poisson(1), which converges to the multinomial bootstrap
    at scale): weight = inverse-CDF lookup of a 60-bit hash of
    (key, replicate), truncated at ``max_w`` (tail mass ~6e-4 documented).
    Returns one row per replicate: (b, n_eff, sum_x) — the bootstrap mean
    is the exact rational sum_x / n_eff, rerun/partitioning-stable.

    Scale shape: one explode (x n_boot) + ONE map-side-combined
    aggregation to n_boot rows; no collect, no state."""
    thr = _poisson1_thresholds(max_w)
    b = F.explode(F.array(*[F.lit(i) for i in range(int(n_boot))])).alias("b")
    base = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.col(value_col).cast("long").alias("x"),
    ).select("k", "x", b)
    u = hash_u60(F.concat(F.col("k"), F.lit("#"), F.col("b").cast("string")), salt)
    w = F.lit(int(max_w))
    for k in reversed(range(max_w)):
        w = F.when(u < F.lit(thr[k]), F.lit(k)).otherwise(w)
    keyed = base.select("b", "x", w.cast("long").alias("w"))
    return keyed.groupBy("b").agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("x")).alias("sum_x"),
    )


def poisson_bootstrap_sql(
    base_select: str,
    n_boot: int,
    key_col: str,
    value_col: str,
    salt: str = "boot",
    max_w: int = 6,
) -> str:
    """DuckDB replay of ``poisson_bootstrap``; ``base_select`` must yield
    the same (key, value) rows."""
    thr = _poisson1_thresholds(max_w)
    u = hash_u60_sql(
        f"CAST({key_col} AS VARCHAR) || '#' || CAST(b.b AS VARCHAR)", salt
    )
    cases = " ".join(
        f"WHEN u < {thr[k]} THEN {k}" for k in range(max_w)
    )
    return f"""
WITH keyed AS (
  SELECT b.b AS b, CAST({value_col} AS BIGINT) AS x, {u} AS u
  FROM ({base_select}) s, generate_series(0, {int(n_boot) - 1}) b(b)),
w AS (
  SELECT b, x, CASE {cases} ELSE {max_w} END AS w FROM keyed)
SELECT CAST(b AS INT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
       CAST(sum(w * x) AS BIGINT) AS sum_x
FROM w GROUP BY 1"""


def kcenter_greedy(
    points: DataFrame,
    k: int,
    id_col: str = "id",
    x_col: str = "qx",
    y_col: str = "qy",
) -> list[tuple[int, int, int]]:
    """Farthest-first traversal (Gonzalez 1985 k-center / coreset
    diversity selection, public literature) over quantized int64 points
    -> [(rank, id, d2)]: seed = smallest id, then k-1 rounds each picking
    the point with the MAX exact squared distance to its nearest selected
    center (ties by smallest id; d2 is that distance at selection time).

    Scale shape: the running min-distance column is updated by one
    narrow map per round against the single new center (a 3-literal
    broadcast, no join, no all-pairs); the only driver traffic is the
    k argmax rows themselves — which ARE the output."""
    pts = points.select(
        F.col(id_col).alias("pid").cast("long"),
        F.col(x_col).alias("px").cast("long"),
        F.col(y_col).alias("py").cast("long"),
    ).persist()
    seed = pts.orderBy("pid").limit(1).collect()[0]
    centers = [(0, int(seed.pid), 0)]
    cur = pts.withColumn(
        "d2",
        (F.col("px") - F.lit(int(seed.px))) * (F.col("px") - F.lit(int(seed.px)))
        + (F.col("py") - F.lit(int(seed.py))) * (F.col("py") - F.lit(int(seed.py))),
    ).localCheckpoint()
    for rank in range(1, int(k)):
        far = cur.orderBy(F.col("d2").desc(), F.col("pid").asc()).limit(1).collect()[0]
        centers.append((rank, int(far.pid), int(far.d2)))
        nd2 = (
            (F.col("px") - F.lit(int(far.px))) * (F.col("px") - F.lit(int(far.px)))
            + (F.col("py") - F.lit(int(far.py))) * (F.col("py") - F.lit(int(far.py)))
        )
        cur = cur.withColumn("d2", F.least(F.col("d2"), nd2)).localCheckpoint()
    pts.unpersist()
    return centers


def kcenter_greedy_sql(base_select: str, k: int) -> str:
    """DuckDB replay of ``kcenter_greedy``: one chained CTE pair per round
    (dist-update against the previous center row, then the argmax row);
    ``base_select`` -> (id, qx, qy)."""
    blocks = [
        f"p AS MATERIALIZED (SELECT id, qx, qy FROM ({base_select}) s)",
        "c0 AS MATERIALIZED (SELECT id, qx, qy, CAST(0 AS BIGINT) AS d2 "
        "FROM p ORDER BY id LIMIT 1)",
        "d0 AS MATERIALIZED (SELECT p.id, p.qx, p.qy, "
        "(p.qx - c.qx) * (p.qx - c.qx) + (p.qy - c.qy) * (p.qy - c.qy) AS d2 "
        "FROM p CROSS JOIN c0 c)",
    ]
    for i in range(1, int(k)):
        blocks.append(
            f"c{i} AS MATERIALIZED (SELECT id, qx, qy, d2 FROM d{i - 1} "
            f"ORDER BY d2 DESC, id LIMIT 1)"
        )
        if i < int(k) - 1:
            blocks.append(
                f"d{i} AS MATERIALIZED (SELECT d.id, d.qx, d.qy, "
                f"LEAST(d.d2, (d.qx - c.qx) * (d.qx - c.qx) "
                f"+ (d.qy - c.qy) * (d.qy - c.qy)) AS d2 "
                f"FROM d{i - 1} d CROSS JOIN c{i} c)"
            )
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, id, d2 FROM c{i}"
        for i in range(int(k))
    )
    return "WITH " + ",\n".join(blocks) + "\n" + sel


def neyman_allocation(
    df: "DataFrame",
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> "DataFrame":
    """Neyman-optimal stratified sampling allocation: n_h proportional to
    N_h * sigma_h, with the weight computed EXACTLY as
    floor(sqrt(N_h * sum(x^2) - sum(x)^2) * 1024) — N_h*sigma_h*N_h^0 ==
    sqrt(N_h * M2_h) from two integer moments, one correctly-rounded IEEE
    sqrt (identical across engines), then integer seats via the
    largest-remainder apportionment already gated (`apportion`).

    The sampling-design layer above stratified_sample: minimal-variance
    budget split for a fixed total sample size (Neyman 1934, public
    literature).  One aggregation + the tiny apportion table."""
    from pyspark.sql import functions as F

    from .analytics import apportion_largest_remainder

    w = (
        df.select(
            F.col(stratum_col).alias("h"),
            F.col(value_col).cast("long").alias("x"),
        )
        .groupBy("h")
        .agg(
            F.count("*").cast("long").alias("nh"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            "h", "nh",
            F.floor(
                F.sqrt((F.col("nh") * F.col("sxx")
                        - F.col("sx") * F.col("sx")).cast("double"))
                * 1024
            ).cast("long").alias("wgt"),
        )
    )
    alloc = apportion_largest_remainder(w, "h", "wgt", seats=int(total_n))
    return (
        alloc.select(F.col("k").alias(stratum_col), F.col("v").alias("wgt"),
                     "quota", "rem", F.col("seats").alias("n_alloc"))
        .join(w.select(F.col("h").alias(stratum_col), "nh"), stratum_col)
    )


def neyman_allocation_sql(base_select: str, stratum_col: str,
                          value_col: str, total_n: int) -> str:
    """DuckDB twin of ``neyman_allocation``."""
    from .analytics import apportion_sql

    w = f"""
SELECT h, nh,
       CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)) * 1024) AS BIGINT) AS wgt
FROM (
  SELECT {stratum_col} AS h, count(*) AS nh,
         sum(CAST({value_col} AS BIGINT)) AS sx,
         sum(CAST({value_col} AS BIGINT) * CAST({value_col} AS BIGINT)) AS sxx
  FROM ({base_select}) s GROUP BY 1) m"""
    ap = apportion_sql(w, "h", "wgt", int(total_n))
    return f"""
SELECT a.k AS {stratum_col}, a.v AS wgt, a.quota, a.rem, a.seats AS n_alloc, ww.nh
FROM ({ap}) a JOIN ({w}) ww ON ww.h = a.k"""
