"""Hot-bucket protection for banded candidate generation.

Every LSH-style candidate generator here (minhash bands, simhash bands,
sign-random-projection bands) groups rows by bucket key and expands
in-bucket pairs.  A degenerate bucket — a constant embedding plane, a
stop-shingle, every empty document hashing identically — materializes an
O(b) ``collect_list`` in one aggregation buffer and an O(b^2) pair list in
one task.  ``cap_buckets`` excludes such buckets BEFORE any list
materializes, with driver-side drop accounting (no silent truncation): the
skipped bucket count and member rows are logged at WARNING, so a pipeline
operator sees exactly what recall was given up and can re-run the oversized
keys through a dedicated path (e.g. exact dedup by hash, which is what a
constant-key bucket usually means anyway).
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: Drop accounting for the most recent ``cap_buckets`` call per operator
#: tag: ``{what: {"buckets": int, "members": int, "max_bucket": int}}``.
#: Inspect after a default-capped run to see exactly what recall was given
#: up (empty when nothing was dropped).
LAST_DROP_STATS: dict[str, dict] = {}


class BucketCapWarning(UserWarning):
    """Raised (as a warning) when cap_buckets drops oversized buckets."""

#: Default bucket-size cap for banded candidate generation.  At the default
#: band widths a genuine near-dup cluster rarely exceeds a few hundred
#: members; 100k members in ONE bucket is always a degenerate key
#: (empty docs, constant vectors) whose 5e9 in-bucket pairs would be
#: worthless candidates.  Callers pass None to disable.
DEFAULT_MAX_BUCKET = 100_000


def cap_buckets(bands: DataFrame, group_cols: list[str],
                max_bucket: int | None, what: str) -> DataFrame:
    """Drop buckets with more than ``max_bucket`` members from ``bands``.

    Runs one small counting aggregate eagerly (the oversized set is
    collected — it is at most a handful of keys by construction), logs the
    accounting, and anti-joins the oversized keys out.  Callers should have
    the input persisted (or derived from a persisted frame) so the counting
    pass does not recompute an expensive upstream pipeline."""
    if max_bucket is None:
        return bands
    counts = bands.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    dropped = counts.filter(F.col("__n") > max_bucket)
    info = dropped.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("__n").alias("members"),
    ).first()
    if not info["buckets"]:
        LAST_DROP_STATS.pop(what, None)
        return bands
    LAST_DROP_STATS[what] = {
        "buckets": int(info["buckets"]),
        "members": int(info["members"]),
        "max_bucket": int(max_bucket),
    }
    msg = (
        f"{what}: dropping {info['buckets']} oversized bucket(s) "
        f"(> {max_bucket} members, {info['members']} member rows total) "
        "from candidate generation — in-bucket pairs for these keys are "
        "NOT emitted; route their members through an exact path instead, "
        "or pass max_bucket=None (buckets.LAST_DROP_STATS has the counts)"
    )
    log.warning(msg)
    warnings.warn(msg, BucketCapWarning, stacklevel=3)
    return bands.join(
        F.broadcast(dropped.select(*group_cols)), group_cols, "left_anti"
    )
