"""applyInPandasWithState cell counter: streaming totals over progressively
arriving files must equal the batch histogram on the same rows, and state
must survive across micro-batches (batches >= 2 for re-seen cells)."""

from __future__ import annotations

import pandas as pd
import pytest


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
