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
parquet-bounce periodically.  Each loop invocation gets its OWN slot
namespace (``new_loop_tag``), so two invocations of the same operator —
or concurrent actions over both results — never overwrite each other's
bounce files.  Within one invocation the two slots alternate, so disk
stays bounded no matter how many rounds run.

Cluster note: the bounce path must be visible to every executor.  In
``local[*]`` mode a driver-temp dir is fine (one machine).  On a real
cluster the caller must have set a shared checkpoint dir
(``sparkContext.setCheckpointDir``) or ``spark.sis.loopStateDir`` — a
driver-local tempdir there would silently lose executor-written
partitions, so we refuse rather than guess.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

#: Rounds between parquet bounces — safely below the ~18-link cliff.
BOUNCE_EVERY = 10

_BASE: str | None = None
_INVOCATION = itertools.count()


def _local_base_dir() -> str:
    global _BASE
    if _BASE is None:
        _BASE = tempfile.mkdtemp(prefix="sis_loop_state_")
        atexit.register(shutil.rmtree, _BASE, ignore_errors=True)
    return _BASE


def _base_dir(df: DataFrame) -> str:
    spark = df.sparkSession
    conf_dir = spark.conf.get("spark.sis.loopStateDir", None)
    if conf_dir:
        return conf_dir
    sc = spark.sparkContext
    master = sc.master or ""
    if master.startswith("local"):
        return _local_base_dir()
    ckpt = sc.getCheckpointDir()
    if ckpt:
        return os.path.join(ckpt, "sis_loop_state")
    raise RuntimeError(
        "loop_truncate needs a shared bounce directory on a cluster: set "
        "sparkContext.setCheckpointDir(...) or spark.sis.loopStateDir "
        "(a driver-local tempdir would lose executor-written partitions)")


def new_loop_tag(tag: str) -> str:
    """Return a per-invocation unique slot namespace for one loop.

    Call ONCE before the loop and pass the result to every
    ``loop_truncate`` in that loop — two invocations of the same
    operator then bounce through disjoint files, so a result DataFrame
    that is still a lazy parquet read of its final slot can never be
    clobbered by a later invocation."""
    return f"{tag}_i{next(_INVOCATION)}"


def loop_truncate(df: DataFrame, round_idx: int, tag: str,
                  bounce_every: int = BOUNCE_EVERY) -> DataFrame:
    """Truncate an iterative loop's state after round ``round_idx``.

    localCheckpoint on most rounds (cheap, in-memory); every
    ``bounce_every``-th round the state bounces through parquet instead —
    the provenance break that keeps long join-bearing loops off the
    exponential checkpoint cliff.  ``tag`` names the loop invocation
    (use ``new_loop_tag``); its two bounce slots alternate so disk usage
    is bounded."""
    if bounce_every and (round_idx + 1) % bounce_every == 0:
        path = os.path.join(
            _base_dir(df), f"{tag}_{(round_idx // bounce_every) % 2}")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint()
