"""Loop-state truncation for iterative DataFrame algorithms.

Every iterative operator here (connected components, pointer doubling,
k-core peeling, kNN ring rounds) re-derives its state DataFrame from the
previous round and truncates lineage with ``localCheckpoint()``.  That is
NOT enough on long loops: a join-bearing localCheckpoint chain hits an
exponential execution cliff at ~18 links — measured on this engine's
pyspark (each round's eager checkpoint job doubles in wall time from
round ~18 even though the logical plan, partition count, and row count
stay constant; BENCH/BASELINE.md round 4).  A parquet write+read is a
TRUE provenance break: with a bounce every ``BOUNCE_EVERY`` rounds, 40+
round loops run at constant per-round cost.

``loop_truncate`` is the shared discipline: localCheckpoint normally,
parquet-bounce periodically.  Bounce files alternate between two slots
per loop tag, so disk stays bounded no matter how many rounds run.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

#: Rounds between parquet bounces — safely below the ~18-link cliff.
BOUNCE_EVERY = 10

_BASE: str | None = None


def _base_dir() -> str:
    global _BASE
    if _BASE is None:
        _BASE = tempfile.mkdtemp(prefix="sis_loop_state_")
    return _BASE


def loop_truncate(df: DataFrame, round_idx: int, tag: str,
                  bounce_every: int = BOUNCE_EVERY) -> DataFrame:
    """Truncate an iterative loop's state after round ``round_idx``.

    localCheckpoint on most rounds (cheap, in-memory); every
    ``bounce_every``-th round the state bounces through parquet instead —
    the provenance break that keeps long join-bearing loops off the
    exponential checkpoint cliff.  ``tag`` names the loop; its two bounce
    slots alternate so disk usage is bounded."""
    if bounce_every and (round_idx + 1) % bounce_every == 0:
        path = os.path.join(_base_dir(), f"{tag}_{(round_idx // bounce_every) % 2}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()
