"""Streaming spatial-join pipeline == the batch plan on the same data.

The stream-static broadcast join runs the flagship's stateless plan per
micro-batch; feeding the sf0.001 events through a file stream in two chunks
must reproduce the batch spatial_join rows exactly, and the watermarked
tile rollup must equal the batch tile histogram."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def event_stream_dir(spark, sf_dir, tmp_path):
    """sf0.001 events written as two parquet chunks (two micro-batches
    under availableNow)."""
    from sis_spark.queries import _events_points

    pts = _events_points(spark, sf_dir).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("event_id") % 120)
    )
    d = str(tmp_path / "stream_in")
    pts.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(d)
    pts.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(d)
    return d, pts


def _run_available_now(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_join_equals_batch(spark, sf_dir, event_stream_dir):
    from sis_spark.operators.spatial_join import spatial_join
    from sis_spark.queries import _supplier_polygons
    from sis_spark.streaming.pipeline import streaming_spatial_join

    d, pts = event_stream_dir
    polys = _supplier_polygons(spark, sf_dir)

    stream = (
        spark.readStream.schema("event_id long, lon double, lat double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    joined = streaming_spatial_join(stream, polys).select("event_id", "poly_key")
    _run_available_now(joined, "sj_stream")

    got = sorted(
        (r["event_id"], r["poly_key"])
        for r in spark.sql("SELECT * FROM sj_stream").collect()
    )
    want = sorted(
        (r["event_id"], r["poly_key"])
        for r in spatial_join(pts.drop("ts"), polys).select("event_id", "poly_key").collect()
    )
    assert got == want and len(got) > 0


def test_streaming_tile_counts_equal_batch(spark, sf_dir, event_stream_dir):
    from sis_spark.operators.spatial_join import spatial_join
    from sis_spark.operators.tiling import assign_tiles
    from sis_spark.queries import _supplier_polygons
    from sis_spark.streaming.pipeline import (
        streaming_spatial_join,
        streaming_tile_counts,
    )

    d, pts = event_stream_dir
    polys = _supplier_polygons(spark, sf_dir)
    stream = (
        spark.readStream.schema("event_id long, lon double, lat double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    rollup = streaming_tile_counts(
        streaming_spatial_join(stream, polys), "ts", zoom=8,
        window="10 minutes", watermark="0 seconds",
    )
    # update mode: append would hold back the final window until a LATER
    # event advances the watermark past its end (availableNow stops first);
    # counts grow monotonically, so each key's max update is its total
    q = (
        rollup.writeStream.format("memory")
        .queryName("tile_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["poly_key"], r["tx"], r["ty"], r["n"])
        for r in spark.sql(
            "SELECT poly_key, tx, ty, max(n) AS n FROM tile_stream"
            " GROUP BY poly_key, tx, ty"
        ).collect()
    )

    batch = (
        assign_tiles(spatial_join(pts, polys), "lon", "lat", 8)
        .groupBy("poly_key", "tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = sorted(
        (r["poly_key"], r["tx"], r["ty"], r["n"]) for r in batch.collect()
    )
    assert got == want and len(got) > 0


def test_streaming_rejects_batch_input(spark, sf_dir):
    from sis_spark.queries import _events_points, _supplier_polygons
    from sis_spark.streaming.pipeline import streaming_spatial_join

    with pytest.raises(ValueError, match="must be a streaming"):
        streaming_spatial_join(
            _events_points(spark, sf_dir), _supplier_polygons(spark, sf_dir)
        )


def test_streaming_dedup_exact(spark, tmp_path):
    """Duplicates across micro-batches are dropped; result key set equals
    the batch distinct, with watermark-bounded state."""
    import pandas as pd

    from sis_spark.streaming.pipeline import streaming_dedup_exact

    rows = pd.DataFrame({
        "doc": [f"d{i % 7}" for i in range(40)],     # 7 distinct keys
        "ts": pd.to_datetime(1_700_000_000 + (pd.RangeIndex(40) * 3), unit="s"),
    })
    d = str(tmp_path / "dedup_in")
    df = spark.createDataFrame(rows)
    df.filter(F.col("ts") < F.timestamp_seconds(F.lit(1_700_000_060))).coalesce(1).write.parquet(d)
    df.filter(F.col("ts") >= F.timestamp_seconds(F.lit(1_700_000_060))).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("doc string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = streaming_dedup_exact(stream, ["doc"], time_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc"] for r in spark.sql("SELECT doc FROM dedup_stream").collect())
    assert got == sorted(f"d{i}" for i in range(7))
