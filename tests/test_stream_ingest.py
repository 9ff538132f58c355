"""Streaming ingest job end-to-end: watermark dedup across restarts,
exactly-once manifests, batch-vs-stream join parity."""

import json
import os
import shutil

import pandas as pd
import pytest

from sis_spark import synth
from sis_spark.operators.spatial_join import spatial_join
from jobs.stream_ingest import build_query


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    out = tmp_path / "out"
    landing.mkdir()
    return str(landing), str(out)


def _wave(spark, path, ids, ts, dup_of=None):
    """Write a landing parquet of images; dup_of clones content from other
    ids under fresh image_ids (same phash+bytes => dedup keys collide)."""
    from sis_spark.sources.images import make_row

    rows = []
    for i in ids:
        r = make_row(i)
        r["ts"] = ts
        rows.append(r)
    for j, src in enumerate(dup_of or []):
        r = make_row(src)
        r["image_id"] = f"dup-{j:06d}"
        r["ts"] = ts
        rows.append(r)
    pdf = pd.DataFrame(rows)
    lon, lat = synth.point_lonlat_np(
        [int(s[4:]) if s.startswith("img-") else 10_000 + k
         for k, s in enumerate(pdf["image_id"])]
    )
    pdf["lon"], pdf["lat"] = lon, lat
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def _run(spark, landing, out, polygons):
    q = build_query(spark, landing, out, polygons, watermark="10 minutes").start()
    q.awaitTermination()


def _manifest_rows(out):
    root = os.path.join(out, "manifests")
    total, n = 0, 0
    for m in sorted(os.listdir(root)):
        with open(os.path.join(root, m)) as f:
            total += json.load(f)["rows"]
        n += 1
    return n, total


def test_stream_ingest_end_to_end(spark, dirs):
    landing, out = dirs
    polygons = synth.polygon_table_np(list(range(1, 11)))
    ts1 = pd.Timestamp("2026-01-01 00:00:00")

    _wave(spark, landing, ids=list(range(40)), ts=ts1)
    _run(spark, landing, out, polygons)

    # parity: streamed result == batch flagship join over the same rows
    got = spark.read.parquet(os.path.join(out, "data"))
    pts = spark.read.parquet(landing).drop("bytes")
    want = spatial_join(pts, polygons, "lon", "lat")
    assert got.count() == want.count() > 0
    assert (
        got.select("image_id", "poly_key").exceptAll(
            want.select("image_id", "poly_key")
        ).count() == 0
    )
    n_man_1, rows_1 = _manifest_rows(out)
    assert n_man_1 >= 1 and rows_1 == got.count()

    # wave 2: 10 clones of wave-1 content (same phash+bytes, fresh ids,
    # within the watermark) + 20 genuinely new rows; restart the stream
    ts2 = pd.Timestamp("2026-01-01 00:05:00")
    _wave(spark, landing, ids=list(range(40, 60)), ts=ts2, dup_of=list(range(10)))
    _run(spark, landing, out, polygons)

    got2 = spark.read.parquet(os.path.join(out, "data"))
    # cross-restart dedup: no dup- ids survive (state came from checkpoint)
    assert got2.filter("image_id LIKE 'dup-%'").count() == 0
    # re-read the landing dir (the wave-1 `pts` captured the old file list):
    # streamed total == batch join over every unique (non-clone) point
    all_pts = spark.read.parquet(landing).drop("bytes").filter(
        "image_id NOT LIKE 'dup-%'"
    )
    assert got2.count() == spatial_join(all_pts, polygons, "lon", "lat").count()

    # idempotent drain: nothing new arrived, nothing new written
    n_man_2, rows_2 = _manifest_rows(out)
    _run(spark, landing, out, polygons)
    assert _manifest_rows(out) == (n_man_2, rows_2)
