"""applyInPandasWithState cell counter: streaming totals over progressively
arriving files must equal the batch histogram on the same rows, and state
must survive across micro-batches (batches >= 2 for re-seen cells)."""

from __future__ import annotations

import pandas as pd
import pytest


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data handling: an event arriving after the watermark passed its
    window is DROPPED from the append-mode windowed aggregate (the
    watermark semantics the reference has no analog for — SURVEY §2.9)."""
    import datetime as dt

    from pyspark.sql import functions as F

    src = tmp_path / "late_in"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")

    def chunk(name, ts_list):
        pd.DataFrame(
            {"ts": [dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m) for m in ts_list],
             "v": list(range(len(ts_list)))}
        ).to_parquet(src / name, coerce_timestamps="us", allow_truncated_timestamps=True)

    # window 10 min, watermark 10 min
    chunk("a.parquet", [5, 60])       # w[0:10) gets 1 row; watermark -> 00:50
    stream = (
        spark.readStream.schema("ts timestamp_ntz, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("late_demo")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # late row for the long-closed w[0:10) + a fresh row pushing time on
        chunk("b.parquet", [6, 120])
        q.processAllAvailable()
        chunk("c.parquet", [180])     # close remaining windows
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["window"]["start"].minute + 60 * r["window"]["start"].hour): r["n"]
        for r in spark.sql("SELECT * FROM late_demo").collect()
    }
    # w[0:10) emitted with ONE row: the minute-6 row arrived too late
    assert out.get(0) == 1
    assert out.get(60) == 1 and out.get(120) == 1


@pytest.mark.parametrize("res", [6])
def test_running_cell_counts_equals_batch(spark, tmp_path, res):
    from pyspark.sql import functions as F

    from sis_spark import synth
    from sis_spark.functions.spark_exprs import cell_col
    from sis_spark.streaming.stateful import running_cell_counts

    src = tmp_path / "stream_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def chunk(path, ids):
        lon, lat = synth.point_lonlat_np(pd.Series(ids).to_numpy())
        pd.DataFrame({"event_id": ids, "lon": lon, "lat": lat}).to_parquet(path)

    chunk(src / "a.parquet", list(range(0, 400)))

    stream = (
        spark.readStream.schema("event_id long, lon double, lat double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_cell_counts(stream, res=res)
    q = (
        out.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # second chunk OVERLAPS the first spatially (same id residues -> same
        # hot cells), forcing state updates rather than fresh keys only
        chunk(src / "b.parquet", list(range(400, 800)))
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.sql("SELECT cell, max(n) AS n, max(batches) AS batches FROM cellcounts GROUP BY cell")
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(str(src))
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert len(got) == len(batch)
    assert (got["cell"].to_numpy() == batch["cell"].to_numpy()).all()
    assert (got["n"].to_numpy() == batch["n"].to_numpy()).all()
    # hot cells were hit by both files -> their state crossed micro-batches
    assert int(got["batches"].max()) >= 2


@pytest.mark.parametrize("res", [6])
def test_running_cell_counts_tws_equals_batch(spark, tmp_path, res):
    """Spark 4 transformWithStateInPandas variant: identical contract —
    streaming running totals equal the batch histogram, state survives
    micro-batches.

    The TWS state-server protocol needs google.protobuf, which this
    container does not ship (no installs allowed) — skip when absent; the
    operator itself is import-tested either way."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs protobuf (absent in image)",
    )
    from pyspark.sql import functions as F

    from sis_spark import synth
    from sis_spark.functions.spark_exprs import cell_col
    from sis_spark.streaming.stateful import running_cell_counts_tws

    src = tmp_path / "tws_in"
    src.mkdir()
    ckpt = str(tmp_path / "tws_ckpt")

    def chunk(path, ids):
        lon, lat = synth.point_lonlat_np(pd.Series(ids).to_numpy())
        pd.DataFrame({"event_id": ids, "lon": lon, "lat": lat}).to_parquet(path)

    chunk(src / "a.parquet", list(range(0, 400)))
    stream = (
        spark.readStream.schema("event_id long, lon double, lat double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_cell_counts_tws(stream, res=res)
    q = (
        out.writeStream.format("memory")
        .queryName("cellcounts_tws")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        chunk(src / "b.parquet", list(range(400, 800)))
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.sql("SELECT cell, max(n) AS n, max(batches) AS batches "
                  "FROM cellcounts_tws GROUP BY cell")
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    batch = (
        spark.read.parquet(str(src))
        .withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    assert list(got["cell"]) == list(batch["cell"])
    assert list(got["n"]) == list(batch["n"])
    assert got["batches"].max() >= 2  # state survived across micro-batches
