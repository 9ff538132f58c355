"""Mergeable distributed sketches: HyperLogLog, Bloom filter, Count-Min.

OUR addition (the reference has no sketch machinery; its closest analog is
the Statistics accumulator combine in `storage/.../FeatureQuery` aggregates) —
at 100 TB, cardinality ("how many distinct URLs"), membership ("was this doc
id already ingested") and frequency ("is this token a heavy hitter") must be
answered by FIXED-SIZE mergeable state, not by a distinct/groupBy over the
raw keys.  Each sketch here is a small DataFrame (its registers/words/
counters), built by ONE map-side-combined aggregation over the input and
merged across batches by the same aggregation over a union — the classic
commutative-monoid shape that tree-aggregates on a 1000-executor cluster.

Bit-exactness: every register/word/counter is derived from the 60-bit md5
hash (`sampling.hash_u60`) with pure integer arithmetic — shifts, masks,
`length(bin(w))` for bit-length — so the DuckDB oracles replay the sketch
CONTENTS bit-for-bit, not just the final estimates.  The only FP anywhere is
the HLL estimate itself, which is kept out of the gates (pytest checks its
accuracy instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sampling import hash_u60, hash_u60_sql

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

_U60_BITS = 60


def hll_registers(
    df: DataFrame, key_col: str, p: int = 8, salt: str = "hll"
) -> DataFrame:
    """HyperLogLog register table for the distinct count of ``key_col``.

    Register index = top ``p`` bits of u60(key); rho = position of the first
    1-bit in the remaining (60-p)-bit suffix (suffix 0 -> 60-p+1, the
    conventional saturation).  Output: exactly 2^p rows (reg, max_rho),
    empty registers emitted with 0 so the sketch shape is stable and two
    sketches merge positionally.

    One groupBy over 2^p keys: partial max() map-side, 2^p-row shuffle —
    input-size-independent state, the whole point.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    suffix_bits = _U60_BITS - p
    u = hash_u60(F.col(key_col), salt)
    reg = F.shiftright(u, suffix_bits)
    w = u.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    # bit-length via length(bin(w)) — exact in both dialects, no FP log2
    rho = F.when(w > 0, F.lit(suffix_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(suffix_bits + 1)
    )
    regs = (
        df.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    spark = df.sparkSession
    full = spark.range(m).select(F.col("id").alias("reg"))
    return (
        full.join(regs, "reg", "left")
        .select("reg", F.coalesce("max_rho", F.lit(0)).cast("long").alias("max_rho"))
    )


def hll_registers_sql(
    key: str, p: int = 8, salt: str = "hll", rel: str = "documents"
) -> str:
    """DuckDB replay of hll_registers — identical hash, shifts, bin()."""
    m = 1 << p
    suffix_bits = _U60_BITS - p
    u = hash_u60_sql(key, salt)
    mask = (1 << suffix_bits) - 1
    return f"""
WITH h AS (SELECT {u} AS u FROM {rel}),
r AS (SELECT u >> {suffix_bits} AS reg, u & {mask} AS w FROM h),
s AS (SELECT reg,
             max(CASE WHEN w > 0 THEN {suffix_bits + 1} - length(bin(w))
                      ELSE {suffix_bits + 1} END) AS mr
      FROM r GROUP BY reg)
SELECT g.reg AS reg, CAST(COALESCE(s.mr, 0) AS BIGINT) AS max_rho
FROM generate_series(0, {m - 1}) g(reg) LEFT JOIN s ON g.reg = s.reg
"""


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL register tables: positional max — the monoid combine."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("reg").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame) -> float:
    """Cardinality estimate from a register table (driver-side over 2^p
    rows).  Standard HLL with the small-range linear-counting correction."""
    import math

    rows = registers.collect()
    m = len(rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -r["max_rho"] for r in rows)
    est = alpha * m * m / s
    zeros = sum(1 for r in rows if r["max_rho"] == 0)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

_WORD_BITS = 60  # 60 bits per word keeps 1<<bit clear of the int64 sign bit


def _bloom_positions(key: F.Column, bits: int, k: int, salt: str):
    return [hash_u60(key, f"{salt}:{i}") % F.lit(bits) for i in range(k)]


def bloom_build(
    df: DataFrame, key_col: str, bits: int = 4800, k: int = 3, salt: str = "bloom"
) -> DataFrame:
    """Build a Bloom bitmap over ``key_col``: ceil(bits/60) words of 60 set
    bits each, as (word, bits) rows.  bit_or is the map-side-combinable
    monoid; the shuffle moves at most bits/60 rows."""
    if bits % _WORD_BITS:
        raise ValueError("bits must be a multiple of 60")
    key = F.col(key_col)
    pos = F.explode(F.array(*_bloom_positions(key, bits, k, salt))).alias("pos")
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("long").alias("word"),
            bit.alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )
    return words


def bloom_probe(
    probe: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    bits: int = 4800,
    k: int = 3,
    salt: str = "bloom",
) -> DataFrame:
    """Membership test: key maybe-present iff ALL k bit positions are set.
    Probe explodes to k rows, equi-joins the (broadcastable) bitmap on word,
    bool_and's back down — no per-row Python, no driver state."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_bloom_positions(key, bits, k, salt))).alias("pos")
    bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))")
    probed = probe.select(key.alias(key_col), pos).select(
        key_col,
        (F.col("pos") / _WORD_BITS).cast("long").alias("word"),
        bit.alias("b"),
    )
    joined = probed.join(F.broadcast(bitmap), "word", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("b")) != 0).alias("hit")
    return (
        joined.select(key_col, hit)
        .groupBy(key_col)
        .agg(F.bool_and("hit").alias("maybe"))
    )


def bloom_probe_sql(
    build_pred: str,
    bits: int = 4800,
    k: int = 3,
    salt: str = "bloom",
    key: str = "doc_id",
    rel: str = "documents",
) -> str:
    """DuckDB replay: build words over ``rel WHERE build_pred``, probe every
    row of ``rel`` — identical positions, words, bit tests."""
    pos_exprs = ", ".join(
        f"({hash_u60_sql(key, f'{salt}:{i}')} % {bits})" for i in range(k)
    )
    return f"""
WITH bpos AS (
  SELECT unnest([{pos_exprs}]) AS pos FROM {rel} WHERE {build_pred}
),
words AS (
  SELECT pos // {_WORD_BITS} AS word, bit_or(1::BIGINT << CAST(pos % {_WORD_BITS} AS INTEGER)) AS bits
  FROM bpos GROUP BY 1
),
ppos AS (
  SELECT {key}, unnest([{pos_exprs}]) AS pos FROM {rel}
),
probed AS (
  SELECT {key}, pos // {_WORD_BITS} AS word, 1::BIGINT << CAST(pos % {_WORD_BITS} AS INTEGER) AS b
  FROM ppos
)
SELECT p.{key} AS {key}, bool_and((COALESCE(w.bits, 0) & p.b) <> 0) AS maybe
FROM probed p LEFT JOIN words w ON p.word = w.word
GROUP BY p.{key}
"""


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def countmin_build(
    df: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch over a (possibly exploded) term column: depth x width
    integer counters as (row, col, n) rows — one count() aggregation with
    map-side partial combine; sketch size is depth*width regardless of input."""
    cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    (hash_u60(F.col(term_col), f"{salt}:{r}") % F.lit(width)).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    return (
        df.select(cols)
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    probe: DataFrame,
    sketch: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
) -> DataFrame:
    """Point estimates for probe terms: min over the depth counters — the
    classic one-sided (never under-counting) CM guarantee.  Sketch is tiny
    (depth*width rows) -> broadcast equi-join."""
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    (hash_u60(F.col(term_col), f"{salt}:{r}") % F.lit(width)).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    probed = probe.select(F.col(term_col), rc).select(term_col, "rc.row", "rc.col")
    return (
        probed.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("est"))
    )


def countmin_sql(
    depth: int = 4,
    width: int = 512,
    salt: str = "cm",
    rel: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    probe_pred: str = "TRUE",
) -> str:
    """DuckDB replay: explode space-split terms, build the counters, probe
    the distinct terms of rows satisfying ``probe_pred``; output
    (term, est, true_n)."""
    hash_cols = ", ".join(
        f"({hash_u60_sql('term', f'{salt}:{r}')} % {width}) AS c{r}" for r in range(depth)
    )
    rc_union = " UNION ALL ".join(
        f"SELECT {r} AS row, c{r} AS col FROM terms_h" for r in range(depth)
    )
    probe_rc = " UNION ALL ".join(
        f"SELECT term, {r} AS row, c{r} AS col FROM probe_h" for r in range(depth)
    )
    return f"""
WITH terms AS (
  SELECT {id_col}, unnest(string_split({text}, ' ')) AS term FROM {rel}
),
terms_h AS (SELECT term, {hash_cols} FROM terms),
sketch AS (
  SELECT row, col, CAST(count(*) AS BIGINT) AS n FROM ({rc_union}) GROUP BY row, col
),
probe AS (
  SELECT DISTINCT term FROM (
    SELECT {id_col}, unnest(string_split({text}, ' ')) AS term FROM {rel} WHERE {probe_pred}
  )
),
probe_h AS (SELECT term, {hash_cols} FROM probe),
ests AS (
  SELECT p.term AS term, min(COALESCE(s.n, 0)) AS est
  FROM ({probe_rc}) p LEFT JOIN sketch s ON p.row = s.row AND p.col = s.col
  GROUP BY p.term
),
truth AS (SELECT term, CAST(count(*) AS BIGINT) AS true_n FROM terms GROUP BY term)
SELECT e.term AS term, CAST(e.est AS BIGINT) AS est, t.true_n AS true_n
FROM ests e JOIN truth t ON e.term = t.term
"""


# ---------------------------------------------------------------------------
# KMV / theta sketch (k minimum values)
# ---------------------------------------------------------------------------
#
# The fourth mergeable sketch: distinct counting WITH set algebra.  HLL
# answers |A| but cannot answer |A ∩ B|; a KMV sketch (the k smallest
# distinct hash values) supports union (k smallest of the merged value
# sets) and intersection (common values below the smaller theta) with
# relative error ~1/sqrt(k) — the DataSketches "theta sketch" family.
#
# Estimates stay in exact int64 by computing at 52-bit precision:
# (k-1) << 52 fits a BIGINT for k <= 2048, and theta >> 8 >= 1 whenever
# theta >= 256 (always, for any non-trivial input).  The same shifted
# division runs in Spark (`div`) and DuckDB (`//`), so the gate pins the
# sketch CONTENTS and the integer estimates bit-for-bit.

_KMV_SHIFT = 8  # estimate precision: u60 >> 8 = 52-bit


def kmv_build(df: DataFrame, key_col: str, k: int = 64, salt: str = "kmv") -> DataFrame:
    """KMV sketch of ``key_col``: the ``k`` smallest DISTINCT u60 hash
    values, as rows (u).  The distinct is a map-side-combined aggregate and
    the k-min compiles to TakeOrderedAndProject (per-partition partial
    top-k, size-k merge) — state is O(k) end to end."""
    if not 2 <= k <= 2048:
        raise ValueError("k must be in [2, 2048]")
    u = hash_u60(F.col(key_col), salt)
    return df.select(u.alias("u")).distinct().orderBy("u").limit(k)


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Union of KMV sketches = KMV of the union: merge the value sets,
    keep the k smallest distinct hashes — the monoid combine."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("u").limit(k)


def _kmv_est(n_seen: int, k: int, theta: int) -> int:
    """(k-1) / theta-fraction estimate in exact shifted-int arithmetic.
    ``n_seen`` short-circuits the exact small case (sketch not full)."""
    if n_seen < k:
        return n_seen
    return ((k - 1) << (60 - _KMV_SHIFT)) // max(theta >> _KMV_SHIFT, 1)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> int:
    """Distinct-count estimate from a sketch (driver-side over <=k rows)."""
    us = sorted(r["u"] for r in sketch.collect())
    return _kmv_est(len(us), k, us[-1]) if us else 0


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, k: int = 64) -> int:
    """|A ∩ B| estimate: theta = min of the two k-th minima; count hash
    values present in BOTH sketches below theta; scale by 2^60/theta.
    Driver-side over two <=k-row states."""
    ua = sorted(r["u"] for r in a.collect())
    ub = sorted(r["u"] for r in b.collect())
    if not ua or not ub:
        return 0
    if len(ua) < k and len(ub) < k:
        return len(set(ua) & set(ub))
    theta = min(ua[-1], ub[-1])
    common = len({u for u in ua if u <= theta} & {u for u in ub if u <= theta})
    return (common << (60 - _KMV_SHIFT)) // max(theta >> _KMV_SHIFT, 1)


def kmv_summary(
    a: DataFrame, b: DataFrame, k: int = 64
) -> "DataFrame":
    """One-row set-algebra summary of two sketches, entirely in DataFrame
    ops (no driver state): (theta_a, theta_b, sum_a, sum_b, est_a, est_b,
    est_union, est_intersect).  The thetas + low-40-bit content sums pin
    the sketch values (a full sum of k u60 values would overflow int64);
    the estimates pin the shifted-integer division.  Every input here is
    <=k rows, so all joins are broadcasts of tiny aggregates."""
    shift = 60 - _KMV_SHIFT
    km1 = k - 1

    def stats(s: DataFrame, tag: str) -> DataFrame:
        return s.agg(
            F.sum(F.col("u") % F.lit(1 << 40)).alias(f"sum_{tag}"),
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.max("u").alias(f"theta_{tag}"),
        )

    sa, sb = stats(a, "a"), stats(b, "b")
    su = stats(kmv_merge(a, b, k=k), "u")
    # common values below min(theta_a, theta_b): inner join of the sketches
    common = a.join(b, "u").select("u")
    est = (
        sa.crossJoin(sb)
        .crossJoin(su)
        .crossJoin(
            common.crossJoin(sa.select("theta_a"))
            .crossJoin(sb.select("theta_b"))
            .agg(
                F.count(
                    F.when(
                        F.col("u") <= F.least("theta_a", "theta_b"), F.lit(1)
                    )
                ).alias("n_common")
            )
        )
    )

    def scaled(num, theta):
        return F.expr(f"({num}) div greatest(({theta}) div {1 << _KMV_SHIFT}, 1)")

    est_a = F.when(F.col("n_a") < k, F.col("n_a")).otherwise(
        scaled(f"{km1 << shift}", "theta_a")
    )
    est_b = F.when(F.col("n_b") < k, F.col("n_b")).otherwise(
        scaled(f"{km1 << shift}", "theta_b")
    )
    est_u = F.when(F.col("n_u") < k, F.col("n_u")).otherwise(
        scaled(f"{km1 << shift}", "theta_u")
    )
    est_i = F.when(
        (F.col("n_a") < k) & (F.col("n_b") < k), F.col("n_common")
    ).otherwise(
        scaled(
            f"n_common * {1 << shift}",
            f"least(theta_a, theta_b) ",
        )
    )
    return est.select(
        F.col("theta_a").cast("long").alias("theta_a"),
        F.col("theta_b").cast("long").alias("theta_b"),
        F.col("sum_a").cast("long").alias("sum_a"),
        F.col("sum_b").cast("long").alias("sum_b"),
        est_a.cast("long").alias("est_a"),
        est_b.cast("long").alias("est_b"),
        est_u.cast("long").alias("est_union"),
        est_i.cast("long").alias("est_intersect"),
    )


def kmv_summary_sql(
    pred_a: str,
    pred_b: str,
    k: int = 64,
    salt: str = "kmv",
    key: str = "doc_id",
    rel: str = "documents",
) -> str:
    """DuckDB replay of kmv_build x2 + kmv_summary over ``rel`` subsets
    ``pred_a`` / ``pred_b`` — identical hashes, k-min sets, shifted-integer
    estimates."""
    u = hash_u60_sql(key, salt)
    shift = 60 - _KMV_SHIFT
    km1 = k - 1
    return f"""
WITH ka AS (
  SELECT DISTINCT {u} AS u FROM {rel} WHERE {pred_a} ORDER BY u LIMIT {k}
),
kb AS (
  SELECT DISTINCT {u} AS u FROM {rel} WHERE {pred_b} ORDER BY u LIMIT {k}
),
ku AS (
  SELECT DISTINCT u FROM (SELECT u FROM ka UNION ALL SELECT u FROM kb)
  ORDER BY u LIMIT {k}
),
sa AS (SELECT CAST(sum(u % {1 << 40}) AS BIGINT) AS sum_a, count(*) AS n_a, max(u) AS theta_a FROM ka),
sb AS (SELECT CAST(sum(u % {1 << 40}) AS BIGINT) AS sum_b, count(*) AS n_b, max(u) AS theta_b FROM kb),
su AS (SELECT count(*) AS n_u, max(u) AS theta_u FROM ku),
sc AS (
  SELECT count(*) AS n_common
  FROM ka JOIN kb USING (u), sa, sb
  WHERE u <= least(theta_a, theta_b)
)
SELECT
  CAST(theta_a AS BIGINT) AS theta_a, CAST(theta_b AS BIGINT) AS theta_b,
  sum_a, sum_b,
  CAST(CASE WHEN n_a < {k} THEN n_a
       ELSE {km1 << shift} // greatest(theta_a // {1 << _KMV_SHIFT}, 1) END AS BIGINT) AS est_a,
  CAST(CASE WHEN n_b < {k} THEN n_b
       ELSE {km1 << shift} // greatest(theta_b // {1 << _KMV_SHIFT}, 1) END AS BIGINT) AS est_b,
  CAST(CASE WHEN n_u < {k} THEN n_u
       ELSE {km1 << shift} // greatest(theta_u // {1 << _KMV_SHIFT}, 1) END AS BIGINT) AS est_union,
  CAST(CASE WHEN n_a < {k} AND n_b < {k} THEN n_common
       ELSE (n_common * {1 << shift}) // greatest(least(theta_a, theta_b) // {1 << _KMV_SHIFT}, 1) END AS BIGINT) AS est_intersect
FROM sa, sb, su, sc
"""


# ---------------------------------------------------------------------------
# Quantile histogram (fixed dyadic buckets)
# ---------------------------------------------------------------------------
#
# The quantile member of the sketch family (cardinality = HLL/KMV,
# membership = Bloom, frequency = Count-Min): a fixed-width bucket
# histogram over a known non-negative integer domain.  State is one count
# per bucket — a single map-side-combined aggregation, mergeable by
# positional sum — and any quantile resolves to the first bucket whose
# cumulative count reaches ceil(q * n), with q rational so the threshold
# is exact integer arithmetic.  Error is bounded by the bucket width
# (domain / 2^p); like the other sketches the gate pins the CONTENTS and
# the integer quantile answers, not an FP estimate.


def quantile_hist(
    df: DataFrame, value_col: str, domain_bits: int, p: int = 10
) -> DataFrame:
    """Bucket-count table (bucket, cnt) for non-negative ``value_col`` in
    [0, 2^domain_bits): bucket = value >> (domain_bits - p); exactly 2^p
    rows, empty buckets emitted with 0 so two sketches merge
    positionally."""
    if not 1 <= p <= domain_bits:
        raise ValueError("need 1 <= p <= domain_bits")
    shift = domain_bits - p
    b = F.shiftright(F.col(value_col).cast("long"), shift).alias("bucket")
    counts = df.select(b).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    full = df.sparkSession.range(1 << p).select(F.col("id").alias("bucket"))
    return full.join(counts, "bucket", "left").select(
        "bucket", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt")
    )


def quantile_hist_merge(*sketches: DataFrame) -> DataFrame:
    """Positional sum — the monoid combine."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def quantile_from_hist(
    hist: DataFrame, q_num: int, q_den: int, domain_bits: int, p: int = 10
) -> DataFrame:
    """One-row quantile answer from a bucket table: the first bucket whose
    running count reaches ceil(q*n) (exact: (q_num*n + q_den - 1) div
    q_den), reported as the bucket's inclusive value range [lo, hi]."""
    shift = domain_bits - p
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    n = hist.agg(F.sum("cnt").alias("n"))
    thr = F.expr(f"({q_num} * n + {q_den - 1}) div {q_den}")
    return (
        cum.crossJoin(n)
        .filter(F.col("cum") >= thr)
        .orderBy("bucket")
        .limit(1)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            (F.col("bucket") * (1 << shift)).cast("long").alias("lo"),
            ((F.col("bucket") + 1) * (1 << shift) - 1).cast("long").alias("hi"),
            F.col("cum").cast("long").alias("cum"),
            F.col("n").cast("long").alias("n"),
        )
    )


def quantile_hist_sql(
    value_expr: str,
    domain_bits: int,
    p: int = 10,
    quantiles: tuple[tuple[int, int], ...] = ((1, 2), (9, 10), (99, 100)),
    rel: str = "documents",
) -> str:
    """DuckDB replay: bucket counts + the first-bucket-reaching-threshold
    rule for each rational quantile; output one row per quantile
    (q_num, q_den, bucket, lo, hi, cum, n)."""
    shift = domain_bits - p
    qrows = ", ".join(f"({n}, {d})" for n, d in quantiles)
    return f"""
WITH vals AS (SELECT ({value_expr}) >> {shift} AS bucket FROM {rel}),
counts AS (SELECT bucket, count(*) AS cnt FROM vals GROUP BY 1),
fullb AS (
  SELECT g.range AS bucket, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
  FROM range(0, {1 << p}) g LEFT JOIN counts c ON c.bucket = g.range),
cum AS (
  SELECT bucket, cnt,
         sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
  FROM fullb),
nn AS (SELECT sum(cnt) AS n FROM fullb),
qs AS (SELECT * FROM (VALUES {qrows}) q(q_num, q_den))
SELECT q.q_num AS q_num, q.q_den AS q_den, t.bucket AS bucket,
       CAST(t.bucket * {1 << shift} AS BIGINT) AS lo,
       CAST((t.bucket + 1) * {1 << shift} - 1 AS BIGINT) AS hi,
       CAST(t.cum AS BIGINT) AS cum, CAST(nn.n AS BIGINT) AS n
FROM qs q, nn,
LATERAL (
  SELECT bucket, cum FROM cum
  WHERE cum >= (q.q_num * nn.n + q.q_den - 1) // q.q_den
  ORDER BY bucket LIMIT 1) t
ORDER BY q_num, q_den"""


def hll_registers_grouped(
    df: DataFrame, group_col: str, key_col: str, p: int = 8, salt: str = "hll"
) -> DataFrame:
    """Per-GROUP HyperLogLog register tables: (group, reg, max_rho), 2^p
    rows per group (empty registers emitted with 0).  The grouped form of
    hll_registers — per-group distinct counts as fixed-size mergeable
    state, one map-side-combined aggregation keyed by (group, reg);
    merging two runs is the same positional max per group."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    suffix_bits = _U60_BITS - p
    u = hash_u60(F.col(key_col), salt)
    reg = F.shiftright(u, suffix_bits)
    w = u.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    rho = F.when(w > 0, F.lit(suffix_bits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(suffix_bits + 1)
    )
    regs = (
        df.select(F.col(group_col), reg.alias("reg"), rho.alias("rho"))
        .groupBy(group_col, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    spark = df.sparkSession
    groups = df.select(group_col).distinct()
    full = groups.crossJoin(spark.range(m).select(F.col("id").alias("reg")))
    return full.join(regs, [group_col, "reg"], "left").select(
        group_col, "reg",
        F.coalesce("max_rho", F.lit(0)).cast("long").alias("max_rho"),
    )


def hll_registers_grouped_sql(
    group: str, key: str, p: int = 8, salt: str = "hll", rel: str = "documents"
) -> str:
    """DuckDB replay of hll_registers_grouped."""
    m = 1 << p
    suffix_bits = _U60_BITS - p
    u = hash_u60_sql(key, salt)
    mask = (1 << suffix_bits) - 1
    return f"""
WITH h AS (SELECT {group} AS g, {u} AS u FROM {rel}),
r AS (SELECT g, u >> {suffix_bits} AS reg, u & {mask} AS w FROM h),
s AS (SELECT g, reg,
             max(CASE WHEN w > 0 THEN {suffix_bits + 1} - length(bin(w))
                      ELSE {suffix_bits + 1} END) AS mr
      FROM r GROUP BY g, reg),
groups AS (SELECT DISTINCT {group} AS g FROM {rel})
SELECT groups.g AS {group}, gr.reg AS reg,
       CAST(COALESCE(s.mr, 0) AS BIGINT) AS max_rho
FROM groups CROSS JOIN generate_series(0, {m - 1}) gr(reg)
LEFT JOIN s ON s.g = groups.g AND s.reg = gr.reg
"""


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_col: str,
    small_col: str,
    bits: int = 4800,
    k: int = 3,
    salt: str = "bloomjoin",
) -> DataFrame:
    """Semi-join ``big`` against ``small`` with a Bloom prefilter: build
    the 60-bit-word bitmap from the small side (bloom_build's ONE bit_or
    aggregation), collect the sketch (bits/60 ints — sketch-sized, never
    data-sized), prefilter the big side with a pure-codegen bit test per
    hash (broadcast literal array, no join), then run the exact semi-join
    on the survivors.

    Result is EXACTLY ``big SEMI JOIN small`` — the Bloom layer only
    shrinks the shuffle (false positives die in the final join, false
    negatives are impossible).  At 100 TB this is the standard selective
    dim filter: the big side's exchange volume drops by the filter's
    selectivity before any shuffle happens."""
    n_words = bits // _WORD_BITS
    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_build(small, small_col, bits, k, salt).collect()
    }
    bitmap = F.array(*[F.lit(words.get(w, 0)) for w in range(n_words)])
    positions = _bloom_positions(F.col(big_col), bits, k, salt)
    tmp = big
    probe = None
    for j, p in enumerate(positions):
        tmp = tmp.withColumn(f"__bp{j}", p)
        test = (
            F.element_at(
                bitmap, (F.col(f"__bp{j}") / _WORD_BITS).cast("int") + 1
            ).bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(__bp{j} % {_WORD_BITS} AS INT))"
                )
            )
            != 0
        )
        probe = test if probe is None else (probe & test)
    pre = tmp.filter(probe).drop(*[f"__bp{j}" for j in range(k)])
    return pre.join(
        small.select(F.col(small_col).alias("__k")).distinct(),
        pre[big_col] == F.col("__k"),
        "semi",
    )


def ams_f2(
    df: DataFrame,
    key_col: str,
    reps: int = 16,
    salt: str = "ams",
) -> DataFrame:
    """AMS / tug-of-war second-moment sketch (Alon, Matias & Szegedy
    1996) -> (rep, z, z2): estimator rep j keeps Z_j = sum over ROWS of
    sign_j(key) where sign_j(x) = 1 - 2*bit_j(md5(x:salt)) — the same
    item always draws the same sign, so Z_j = sum_x f(x)*sign_j(x) and
    E[Z_j^2] = F2 = sum_x f(x)^2.  Fully derandomized (md5 bits), so
    the oracle replays it exactly; averaging z2 across reps is the F2
    estimate, and the sketch is mergeable (Z sums add).  ONE explode
    (x reps) + ONE map-side-combinable agg — the streaming join-size /
    skew estimator."""
    from .sampling import hash_u60

    h = hash_u60(F.col(key_col), salt)
    rows = df.select(h.alias("h"))
    out = (
        rows.select(
            F.explode(
                F.array(*[F.lit(j) for j in range(int(reps))])
            ).alias("rep"),
            "h",
        )
        .select(
            "rep",
            F.expr("1 - 2 * (shiftright(h, CAST(rep AS INT)) & 1)")
            .alias("sign"),
        )
        .groupBy("rep")
        .agg(F.sum("sign").alias("z"))
    )
    return out.select(
        F.col("rep").cast("long").alias("rep"),
        F.col("z").cast("long").alias("z"),
        (F.col("z") * F.col("z")).alias("z2"),
    )


def ams_f2_sql(base_select: str, key_col: str, reps: int = 16,
               salt: str = "ams") -> str:
    """DuckDB oracle for ``ams_f2``."""
    from .sampling import hash_u60_sql

    h = hash_u60_sql(key_col, salt)
    return f"""
SELECT CAST(rep AS BIGINT) AS rep, CAST(z AS BIGINT) AS z,
       CAST(z * z AS BIGINT) AS z2
FROM (
  SELECT rep, sum(1 - 2 * ((h >> CAST(rep AS INT)) & 1)) AS z
  FROM (SELECT {h} AS h FROM ({base_select}) b),
       (SELECT unnest(range({int(reps)})) AS rep) reps
  GROUP BY rep) t"""


def space_saving(
    df: DataFrame,
    key_col: str = "user_id",
    order_col: str = "event_id",
    item_col: str = "item",
    k: int = 4,
) -> DataFrame:
    """Space-Saving heavy hitters (Metwally et al. 2005, public
    literature), derandomized: the k-counter stream summary processed in
    the deterministic ``order_col`` order — hit increments; miss with
    room inserts (count 1, err 0); miss without room REPLACES the
    minimum counter (ties: smallest count, then smallest item) with
    (min+1, err=min).  One update per step, so the oracle replays the
    stream as a lockstep recursive CTE carrying the counter LIST; the
    engine is one applyInPandas pass per key (the stay_points
    discipline).  Guarantees: count overestimates by <= err, every item
    with true frequency > n/k is present.

    Output: (key, item, cnt, err) for the final counters."""
    import pandas as pd

    def fn(key, pdf):
        pdf = pdf.sort_values("rn")
        counters = {}
        for it in pdf["it"]:
            it = int(it)
            if it in counters:
                c, e = counters[it]
                counters[it] = (c + 1, e)
            elif len(counters) < k:
                counters[it] = (1, 0)
            else:
                mit = min(counters, key=lambda x: (counters[x][0], x))
                mc, _ = counters.pop(mit)
                counters[it] = (mc + 1, mc)
        return pd.DataFrame([
            {"k": key[0], "item": it, "cnt": c, "err": e}
            for it, (c, e) in sorted(counters.items())
        ])

    word = Window.partitionBy(key_col).orderBy(order_col)
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(item_col).cast("long").alias("it"),
        F.row_number().over(word).cast("long").alias("rn"),
    )
    return b.groupBy("k").applyInPandas(
        fn, "k long, item long, cnt long, err long"
    ).select(F.col("k").alias(key_col), "item", "cnt", "err")


def space_saving_sql(
    base_select: str,
    key_col: str = "user_id",
    order_col: str = "event_id",
    item_col: str = "item",
    k: int = 4,
) -> str:
    """DuckDB twin of ``space_saving`` (lockstep recursive CTE; counters
    carried as a LIST of (item, cnt, err) structs)."""
    return f"""
WITH RECURSIVE b AS MATERIALIZED (
  SELECT {key_col} AS kk, CAST({item_col} AS BIGINT) AS it,
         CAST(row_number() OVER (PARTITION BY {key_col}
              ORDER BY {order_col}) AS BIGINT) AS rn
  FROM ({base_select}) s),
st AS (
  SELECT kk, CAST(0 AS BIGINT) AS rn,
         CAST([] AS STRUCT(item BIGINT, cnt BIGINT, err BIGINT)[]) AS cs
  FROM (SELECT DISTINCT kk FROM b) u
  UNION ALL
  SELECT r.kk, r.rn + 1,
         CASE
           WHEN len(list_filter(r.cs, c -> c.item = q.it)) > 0 THEN
             list_transform(r.cs, c -> CASE WHEN c.item = q.it
               THEN {{'item': c.item, 'cnt': c.cnt + 1, 'err': c.err}}
               ELSE c END)
           WHEN len(r.cs) < {int(k)} THEN
             list_append(r.cs, {{'item': q.it, 'cnt': CAST(1 AS BIGINT),
                                 'err': CAST(0 AS BIGINT)}})
           ELSE
             list_append(
               list_filter(r.cs, c -> NOT (
                 c.cnt = list_min(list_transform(r.cs, x -> x.cnt))
                 AND c.item = list_min(list_transform(
                   list_filter(r.cs, x -> x.cnt = list_min(
                     list_transform(r.cs, y -> y.cnt))), x -> x.item)))),
               {{'item': q.it,
                 'cnt': list_min(list_transform(r.cs, x -> x.cnt)) + 1,
                 'err': list_min(list_transform(r.cs, x -> x.cnt))}})
         END AS cs
  FROM st r JOIN b q ON q.kk = r.kk AND q.rn = r.rn + 1)
SELECT f.kk AS {key_col}, u.c.item AS item, u.c.cnt AS cnt, u.c.err AS err
FROM (
  SELECT st.kk, st.cs FROM st
  JOIN (SELECT kk, max(rn) AS mx FROM b GROUP BY 1) m
    ON m.kk = st.kk AND m.mx = st.rn) f,
  unnest(f.cs) AS u(c)"""


def bitmap_index(
    df: DataFrame,
    key_col: str = "k",
    row_col: str = "rn",
    word_bits: int = 60,
) -> DataFrame:
    """Bitmap index over row-number buckets: per key and 60-bit word,
    word = bit_or of (1 << rn mod 60) — bit 60+ would hit the int64 sign
    (the bloom-filter contract); AND/OR/COUNT queries over keys become
    word-aligned joins + bit_count sums (`bitmap_and_count`).  The
    Roaring-style acceleration primitive of OLAP predicates."""
    wb = int(word_bits)
    return (
        df.select(
            F.col(key_col).alias("k"),
            F.expr(f"{row_col} div {wb}").alias("w"),
            F.expr(f"{row_col} % {wb}").alias("b"),
        )
        .groupBy("k", "w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)))")
             .alias("bits"))
    )


def bitmap_and_count(index: DataFrame, ka, kb) -> DataFrame:
    """Count of rows where BOTH keys are set: word-aligned equi-join of
    the two keys' bitmaps + sum of bit_count(a & b) — no row explosion."""
    a = index.filter(F.col("k") == ka).select("w", F.col("bits").alias("ba"))
    b = index.filter(F.col("k") == kb).select("w", F.col("bits").alias("bb"))
    return a.join(b, "w").agg(
        F.sum(F.expr("bit_count(ba & bb)")).alias("n_and")
    )


def bitmap_index_sql(base_select: str, key_col: str = "k",
                     row_col: str = "rn", word_bits: int = 60) -> str:
    """DuckDB twin of ``bitmap_index``."""
    wb = int(word_bits)
    return f"""
SELECT {key_col} AS k, {row_col} // {wb} AS w,
       bit_or(CAST(1 AS BIGINT) << CAST({row_col} % {wb} AS INT)) AS bits
FROM ({base_select}) s
GROUP BY 1, 2"""
