"""Point-cloud analytics over (xi, yi, zi) integer triplets (the LAS
store's raw coordinates — see sources/las.py).

Public-literature operators re-expressed as Spark aggregations; exact
integer arithmetic throughout so every gate has a bit-stable DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_ground_stats(
    points: DataFrame,
    cell: int,
    dz: int,
    x_col: str = "xi",
    y_col: str = "yi",
    z_col: str = "zi",
) -> DataFrame:
    """Grid-based ground filtering + canopy stats (the simple-morphology
    member of the lidar ground-extraction family, public literature):
    per grid cell of side ``cell`` (floor division of the integer
    coordinates), z_min is the ground estimate; points within ``dz`` of
    it are ground returns; z_max - z_min is the canopy height proxy.
    Returns (cx, cy, n, z_min, z_max, n_ground, chm).

    Shape: ONE map-side-combined aggregation for the cell stats, then
    one window pass tags ground points — the per-point ground flag never
    needs a second shuffle because the window shares the (cx, cy) keyed
    exchange; all int64."""
    from pyspark.sql import Window

    c = float(int(cell))
    b = points.select(
        F.floor(F.col(x_col).cast("double") / F.lit(c)).cast("long").alias("cx"),
        F.floor(F.col(y_col).cast("double") / F.lit(c)).cast("long").alias("cy"),
        F.col(z_col).cast("long").alias("z"),
    )
    w = Window.partitionBy("cx", "cy")
    tagged = b.withColumn("zmin", F.min("z").over(w)).withColumn(
        "ground", (F.col("z") - F.col("zmin") <= int(dz)).cast("long")
    )
    return tagged.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("z").alias("z_min"),
        F.max("z").alias("z_max"),
        F.sum("ground").alias("n_ground"),
        (F.max("z") - F.min("z")).alias("chm"),
    )


def grid_ground_stats_sql(base_select: str, cell: int, dz: int) -> str:
    """DuckDB replay of ``grid_ground_stats``; ``base_select`` -> (xi,
    yi, zi)."""
    c = float(int(cell))
    return f"""
WITH b AS (
  SELECT CAST(floor(CAST(xi AS DOUBLE) / {c}) AS BIGINT) AS cx,
         CAST(floor(CAST(yi AS DOUBLE) / {c}) AS BIGINT) AS cy,
         CAST(zi AS BIGINT) AS z
  FROM ({base_select}) s),
t AS (
  SELECT cx, cy, z, min(z) OVER (PARTITION BY cx, cy) AS zmin
  FROM b)
SELECT cx, cy, CAST(count(*) AS BIGINT) AS n,
       min(z) AS z_min, max(z) AS z_max,
       CAST(sum(CASE WHEN z - zmin <= {int(dz)} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ground,
       max(z) - min(z) AS chm
FROM t GROUP BY 1, 2"""
