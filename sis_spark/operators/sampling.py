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
