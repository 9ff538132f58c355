"""Custom stateful streaming operators (Structured Streaming).

The reference has NO streaming engine (SURVEY §2.9) — its closest analogs
are the StoreListeners event bus and incremental tile loading.  This module
is the engine's forward-looking ingestion surface: the north-star workload
(continuously arriving image+caption rows) needs *incremental* cell
statistics without rescanning the table, which is exactly Spark's
applyInPandasWithState: per-group state on the shuffle key, Arrow-batched
updates, checkpointed exactly-once.

``running_cell_counts`` keeps one state row per spatial cell — (total rows,
micro-batches seen) — and emits the updated totals each micro-batch: the
streaming twin of the batch cell histogram (operators/spatial_join.py
cell_histogram), whose totals it must equal on the same data (proven in
tests/test_stateful_streaming.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_exprs import cell_col

OUT_SCHEMA = "cell long, n long, batches int"
STATE_SCHEMA = "n long, batches int"


def running_cell_counts(
    stream_df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", res: int = 12
) -> DataFrame:
    """Per-cell running row counts over a stream (update output mode).

    The cell id is computed JVM-side (codegen expression); only the tiny
    (cell) key crosses into Python, where GroupState holds (n, batches).
    State is partitioned by cell — the same skew caveat as the batch join
    applies, and the same mitigation (the state store hash-partitions on
    the full cell id, so hot *regions* spread across many cells).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    cells = stream_df.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), res))

    def fn(key, pdf_iter, state):
        n_new = 0
        for pdf in pdf_iter:
            n_new += len(pdf)
        if state.exists:
            n, batches = state.get
        else:
            n, batches = 0, 0
        n += n_new
        batches += 1
        state.update((n, batches))
        yield pd.DataFrame({"cell": [key[0]], "n": [n], "batches": [batches]})

    return cells.groupBy("cell").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def running_cell_counts_tws(
    stream_df: DataFrame, lon_col: str = "lon", lat_col: str = "lat", res: int = 12
) -> DataFrame:
    """Spark 4 transformWithStateInPandas variant of running_cell_counts:
    the successor API (SPARK-49411) with explicit typed state handles and
    per-processor lifecycle — same semantics (one ValueState row per cell,
    updated totals emitted each micro-batch), same equality-to-batch
    contract (tests/test_stateful_streaming.py; the test auto-skips where
    google.protobuf — required by the TWS state-server protocol — is not
    installed, as in this container)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    cells = stream_df.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), res))

    class CellCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("counts", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n_new = 0
            for pdf in rows:
                n_new += len(pdf)
            if self._state.exists():
                n, batches = self._state.get()
            else:
                n, batches = 0, 0
            n += n_new
            batches += 1
            self._state.update((n, batches))
            yield pd.DataFrame({"cell": [key[0]], "n": [n], "batches": [batches]})

        def close(self) -> None:
            pass

    return cells.groupBy("cell").transformWithStateInPandas(
        statefulProcessor=CellCount(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
