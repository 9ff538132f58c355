"""CSV feature store — the reference's primary text FeatureSet
(S/csv/Store.java:91; header-driven schema inference :254-262).

Spark's csv reader supplies parsing; this layer adds the store contract:
schema inference on read (the reference infers from the Moving-Features
header; plain CSV infers from data), explicit schema round-trip, and a
writable-feature-set analog (WritableFeatureSet, S/WritableFeatureSet.java).
Timestamps are ISO-8601 in UTC (session timezone is pinned by session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_feature_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    r = spark.read.option("header", True)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    # both TZ and NTZ formats: TESTDATA parquet carries timestamp_ntz
    r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")
    r = r.option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    return r.csv(path)


def write_feature_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )
