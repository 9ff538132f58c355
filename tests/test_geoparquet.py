import os

import pytest
from pyspark.sql import functions as F


def test_geoparquet_roundtrip_and_prune(spark, tmp_path):
    from sis_spark.functions.sqlmm import st_point_udf
    from sis_spark.sources.geoparquet import (
        prune_files, read_geo_metadata, read_geoparquet, write_geoparquet,
    )

    df = spark.range(200).selectExpr(
        "id", "CAST(id % 100 - 50 AS DOUBLE) AS lon",
        "CAST(id % 60 - 30 AS DOUBLE) AS lat",
    ).withColumn("geometry", st_point_udf()(F.col("lon"), F.col("lat")))
    out = str(tmp_path / "gp")
    man = write_geoparquet(df.repartition(4), out).collect()
    assert sum(r["n"] for r in man) == 200
    assert len(man) == 4

    meta = read_geo_metadata(out)
    assert len(meta) == 4
    for g in meta.values():
        assert g["columns"]["geometry"]["encoding"] == "WKB"
        assert g["columns"]["geometry"]["geometry_types"] == ["Point"]
        b = g["columns"]["geometry"]["bbox"]
        assert b[0] <= b[2] and b[1] <= b[3]

    # full read returns every row; bbox read is exact on lon/lat
    assert read_geoparquet(spark, out).count() == 200
    got = read_geoparquet(spark, out, bbox=(0, 0, 50, 30)).count()
    exp = df.filter("lon >= 0 AND lon <= 50 AND lat >= 0 AND lat <= 30").count()
    assert got == exp

    # a window outside every file bbox opens zero files
    assert prune_files(out, 1000, 1000, 2000, 2000) == []
    assert read_geoparquet(spark, out, bbox=(1000, 1000, 2000, 2000)).count() == 0

    # manifest persisted beside the data
    assert os.path.exists(os.path.join(out, "_manifest.json"))
