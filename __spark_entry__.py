"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship two-phase spatial join + tile assignment at
sf0.001; ``queries``/``oracle_sql`` expose the full catalog in
sis_spark/queries.py (each Spark query vs an independent DuckDB SQL
re-derivation — differential testing per SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: skewed points -> cell prefilter -> broadcast PIP join ->
    Web-Mercator tile assignment, at sf0.001."""
    from pyspark.sql import functions as F

    from sis_spark.operators.tiling import assign_tiles
    from sis_spark.queries import _events_points, _supplier_polygons
    from sis_spark.operators.spatial_join import spatial_join

    sf_dir = "/root/testdata/sf0.001"
    pts = _events_points(spark, sf_dir)
    polys = _supplier_polygons(spark, sf_dir)
    joined = spatial_join(pts, polys, "lon", "lat")
    return assign_tiles(joined, "lon", "lat", zoom=12).select(
        F.col("event_id").alias("pid"), "poly_key", "tx", "ty"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sis_spark.queries import QUERIES

    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from sis_spark.queries import QUERIES

    return {
        name: oracle()
        for name, (_fn, oracle) in QUERIES.items()
        if oracle is not None
    }
