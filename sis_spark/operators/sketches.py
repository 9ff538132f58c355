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

from pyspark.sql import DataFrame, SparkSession
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
