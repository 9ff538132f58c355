"""Web-Mercator tile assignment + tile pyramid rollups over point DataFrames.

Tile index convention: ``floorDiv(global_pixel, TILE)`` exactly as the
reference (S/tiling/TiledGridCoverage.java:326,489), inclusive-low bounds
(F/coverage/grid/GridExtent.java:340).  The multi-resolution pyramid mirrors
TileMatrixSet's zoom hierarchy (S/tiling/TileMatrixSet.java:53): parent tile
= child >> 1 on both axes, aggregates roll up with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_exprs import tile_cols


def assign_tiles(df: DataFrame, lon_col: str, lat_col: str, zoom: int,
                 tx_col: str = "tx", ty_col: str = "ty") -> DataFrame:
    tx, ty = tile_cols(F.col(lon_col), F.col(lat_col), zoom)
    return df.withColumn(tx_col, tx).withColumn(ty_col, ty)


def tile_counts(df: DataFrame, lon_col: str, lat_col: str, zoom: int) -> DataFrame:
    """Rows per tile at one zoom (the raster-side cell histogram)."""
    return (
        assign_tiles(df, lon_col, lat_col, zoom)
        .groupBy("tx", "ty")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def pyramid_rollup(tile_df: DataFrame, max_zoom: int, min_zoom: int = 0,
                   agg_col: str = "n") -> DataFrame:
    """Roll a (tx, ty, n)@max_zoom table up through the pyramid to min_zoom.

    Output: (z, tx, ty, n) for z in [min_zoom, max_zoom].  Each level is the
    sum of its 4 children — computed level-by-level so every step is a
    partial-agg shuffle on an already-reduced input (not a re-scan).
    """
    levels = [tile_df.withColumn("z", F.lit(max_zoom))]
    cur = tile_df
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        cur = (
            cur.select(
                F.shiftright(F.col("tx"), 1).alias("tx"),
                F.shiftright(F.col("ty"), 1).alias("ty"),
                F.col(agg_col),
            )
            .groupBy("tx", "ty")
            .agg(F.sum(agg_col).alias(agg_col))
        )
        levels.append(cur.withColumn("z", F.lit(z)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select("z", "tx", "ty", agg_col)
