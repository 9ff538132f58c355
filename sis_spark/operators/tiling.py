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


# ---------------------------------------------------------------- cell-set compaction (H3 compact analog)
# In the Morton cell scheme of functions/cells.py (cell = marker | interleave),
# the parent is exactly ``cell >> 2`` (the marker bit shifts along) and the
# four children of p are ``(p << 2) | {0,1,2,3}`` — so compaction is pure
# integer codegen, no UDF.  Reference parity: the covering-set minimization
# mirrors TileMatrixSet's zoom hierarchy (S/tiling/TileMatrixSet.java:53)
# applied to the gazetteer cell ids (G/GeohashReferenceSystem.java).

def cell_res_expr(cell_col: str = "cell"):
    """Resolution of a cell id by exact integer range tests (res r ids live
    in [4^r, 2*4^r)) — no FP log2, whose ulp behavior differs per libm."""
    from ..functions.cells import MAX_RES

    arms = " ".join(
        f"WHEN {cell_col} >= {4 ** r} AND {cell_col} < {2 * 4 ** r} THEN {r}"
        for r in range(1, MAX_RES + 1)
    )
    return F.expr(f"CASE {arms} END")


def compact_cells(cells: DataFrame, cell_col: str = "cell",
                  min_res: int = 1) -> DataFrame:
    """Minimal mixed-resolution cover of a cell set: wherever all four
    children of a parent are present, they are replaced by the parent,
    recursively.  Input rows may be any mix of resolutions (duplicates
    removed); output is (cell, res) with no cell an ancestor of another.

    Plan shape: one groupBy(parent) per resolution level, bottom-up — each
    round operates only on the current level's cells (already reduced), so
    the total shuffled volume is bounded by the input cell count.  Driver
    traffic per round is two scalars (level min/max); no collect of cells.

    The distinct cell set is localCheckpoint-ed up front: the per-level
    ``res == r`` filters would otherwise be pushed BELOW the distinct,
    substituting the caller's cell-derivation expression into every CASE
    arm of cell_res_expr — a Morton-encode lineage (spark_exprs.cell_col
    references itself twice per spread step, 2^6 copies of the lon/lat
    subtree) explodes exponentially under that rewrite and OOMs codegen.
    Materializing once also makes each round's scan O(cells), which by
    construction is small relative to the input table."""
    cur = (
        cells.select(F.col(cell_col).alias("cell")).distinct()
        .withColumn("res", cell_res_expr())
        .localCheckpoint()
    )
    bounds = cur.agg(F.max("res").alias("hi"), F.min("res").alias("lo")).first()
    hi, lo = bounds["hi"], bounds["lo"]
    if hi is None:
        return cur
    out = []
    level = cur.filter(F.col("res") == hi).select("cell")
    for r in range(hi, min_res, -1):
        parents = (
            level.groupBy(F.shiftright("cell", 2).alias("parent"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        full = parents.filter(F.col("n") == 4).select(
            F.col("parent").alias("cell"))
        kept = level.join(
            full.withColumnRenamed("cell", "parent"),
            F.shiftright(level["cell"], 2) == F.col("parent"),
            "left_anti",
        )
        out.append(kept.withColumn("res", F.lit(r)))
        promoted = full
        if r - 1 >= lo:
            promoted = promoted.unionByName(
                cur.filter(F.col("res") == r - 1).select("cell")
            ).distinct()
        level = promoted.localCheckpoint()  # truncate round-over-round lineage
    res_out = level.withColumn("res", F.lit(min_res))
    for part in out:
        res_out = res_out.unionByName(part)
    return res_out


def uncompact_cells(cells: DataFrame, to_res: int, cell_col: str = "cell",
                    res_col: str = "res") -> DataFrame:
    """Inverse of compact_cells: expand every (cell, res) to its res=to_res
    descendants — ``(cell << 2d) + i`` for i in [0, 4^d) — as a distributed
    sequence/explode (a hot coarse cell costs rows, not driver memory)."""
    return (
        cells
        .filter(F.col(res_col) <= to_res)
        .select(
            F.expr(
                f"explode(sequence(0, shiftleft(CAST(1 AS BIGINT), "
                f"2 * ({to_res} - {res_col})) - 1))"
            ).alias("_i"),
            F.col(cell_col),
            F.col(res_col),
        )
        .select(
            F.expr(
                f"shiftleft({cell_col}, CAST(2 * ({to_res} - {res_col}) AS INT))"
                " + _i"
            ).alias(cell_col)
        )
    )


def line_cells(
    segs: DataFrame,
    cell: int,
    id_col: str = "seg_id",
    x1_col: str = "x1",
    y1_col: str = "y1",
    x2_col: str = "x2",
    y2_col: str = "y2",
) -> DataFrame:
    """Supercover line rasterization: every grid cell (side ``cell``,
    integer endpoint coordinates) a segment passes through ->
    (seg_id, ix, iy).  Cell membership is EXACT: bbox overlap + the
    integer separating-axis test (the segment misses the cell iff all
    four cell corners lie strictly on one side of its supporting line —
    int64 cross products, no FP).  Corner-touching cells count as
    covered (documented closed semantics).

    Scale shape: pure whole-stage codegen — sequence/explode the bbox
    candidate columns/rows per segment, filter by the SAT predicate.
    Candidate fan-out is the segment's cell-bbox area; split long
    segments first (line_clip) when that bound matters — the vector
    twin of rasterize_polygons' cell-center burn."""
    c = int(cell)
    e = lambda s: F.expr(s)
    b = segs.select(
        F.col(id_col).alias("seg_id"),
        F.col(x1_col).alias("x1"), F.col(y1_col).alias("y1"),
        F.col(x2_col).alias("x2"), F.col(y2_col).alias("y2"),
    )
    # floor-div bounds (coordinates may be negative: use floor semantics)
    fd = lambda v: f"(({v}) - ((({v}) % {c}) + {c}) % {c}) DIV {c}"
    cand = (
        b.withColumn("ix", F.explode(e(
            f"sequence({fd('least(x1, x2)')}, {fd('greatest(x1, x2)')})"
        )))
        .withColumn("iy", F.explode(e(
            f"sequence({fd('least(y1, y2)')}, {fd('greatest(y1, y2)')})"
        )))
    )
    # cross products of the 4 cell corners against the segment line
    cross = (
        "((x2 - x1) * (({cy}) - y1) - (y2 - y1) * (({cx}) - x1))"
    )
    corners = [
        (f"ix * {c}", f"iy * {c}"),
        (f"(ix + 1) * {c}", f"iy * {c}"),
        (f"ix * {c}", f"(iy + 1) * {c}"),
        (f"(ix + 1) * {c}", f"(iy + 1) * {c}"),
    ]
    ds = [cross.format(cx=cx, cy=cy) for cx, cy in corners]
    not_separated = (
        "NOT (" + " AND ".join(f"({d}) > 0" for d in ds) + ")"
        " AND NOT (" + " AND ".join(f"({d}) < 0" for d in ds) + ")"
    )
    return cand.filter(e(not_separated)).select("seg_id", "ix", "iy")


def line_cells_sql(segs_select: str, cell: int) -> str:
    """DuckDB replay of ``line_cells``; ``segs_select`` ->
    (seg_id, x1, y1, x2, y2)."""
    c = int(cell)
    fd = lambda v: f"(({v}) - ((({v}) % {c}) + {c}) % {c}) // {c}"
    cross = "((x2 - x1) * (({cy}) - y1) - (y2 - y1) * (({cx}) - x1))"
    corners = [
        (f"ix * {c}", f"iy * {c}"),
        (f"(ix + 1) * {c}", f"iy * {c}"),
        (f"ix * {c}", f"(iy + 1) * {c}"),
        (f"(ix + 1) * {c}", f"(iy + 1) * {c}"),
    ]
    ds = [cross.format(cx=cx, cy=cy) for cx, cy in corners]
    not_sep = (
        "NOT (" + " AND ".join(f"({d}) > 0" for d in ds) + ")"
        " AND NOT (" + " AND ".join(f"({d}) < 0" for d in ds) + ")"
    )
    return f"""
WITH b AS ({segs_select}),
cand AS (
  SELECT b.*, gx.ix, gy.iy
  FROM b,
       LATERAL (SELECT unnest(range({fd('least(x1, x2)')},
                                    {fd('greatest(x1, x2)')} + 1)) AS ix) gx,
       LATERAL (SELECT unnest(range({fd('least(y1, y2)')},
                                    {fd('greatest(y1, y2)')} + 1)) AS iy) gy)
SELECT seg_id, CAST(ix AS BIGINT) AS ix, CAST(iy AS BIGINT) AS iy
FROM cand WHERE {not_sep}"""


def region_quadtree(pixels: DataFrame, levels: int,
                    x_col: str = "x", y_col: str = "y",
                    val_col: str = "v") -> DataFrame:
    """Region-quadtree leaves of a 2^levels x 2^levels integer raster:
    bottom-up uniformity roll-up (a block is uniform when its four
    children are uniform with equal value); a LEAF is a uniform block
    whose parent is not uniform (or the root) — the maximal-uniform-block
    compression of classified/binary rasters (Samet's region quadtree,
    the raster twin of the PointTree reference, F/index/tree/PointTree.java).

    Output: (lvl, bx, by, val) with lvl = block size log2.

    Scale shape: ``levels`` chained 4-to-1 aggregations (block counts
    shrink geometrically) + one join per level for the leaf test — no
    iteration-to-convergence, depth is fixed by the raster size."""
    cur = pixels.select(
        F.col(x_col).cast("long").alias("bx"),
        F.col(y_col).cast("long").alias("by"),
        F.col(val_col).cast("long").alias("vmin"),
        F.col(val_col).cast("long").alias("vmax"),
        F.lit(1).cast("long").alias("nu"),
    )
    lvls = [cur]
    for _ in range(levels):
        prev = lvls[-1]
        nxt = (
            prev.groupBy(
                (F.col("bx") / 2).cast("long").alias("bx"),
                (F.col("by") / 2).cast("long").alias("by"),
            )
            .agg(
                F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax"),
                F.sum(
                    F.when((F.col("nu") == 1) & (F.col("vmin") == F.col("vmax")),
                           1).otherwise(0)
                ).alias("eq"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .select(
                "bx", "by", "vmin", "vmax",
                F.when((F.col("eq") == 4) & (F.col("cnt") == 4)
                       & (F.col("vmin") == F.col("vmax")), 1)
                .otherwise(0).cast("long").alias("nu"),
            )
        )
        lvls.append(nxt)
    out = None
    for lvl in range(levels + 1):
        cur = lvls[lvl].filter(
            (F.col("nu") == 1) & (F.col("vmin") == F.col("vmax"))
        )
        if lvl == levels:
            leaf = cur
        else:
            par = lvls[lvl + 1].filter(
                (F.col("nu") == 1) & (F.col("vmin") == F.col("vmax"))
            ).select(
                F.col("bx").alias("pbx"), F.col("by").alias("pby"),
                F.lit(1).alias("pu"),
            )
            leaf = (
                cur.join(
                    par,
                    ((F.col("bx") / 2).cast("long") == F.col("pbx"))
                    & ((F.col("by") / 2).cast("long") == F.col("pby")),
                    "left",
                )
                .filter(F.col("pu").isNull())
                .select("bx", "by", "vmin", "vmax", "nu")
            )
        row = leaf.select(
            F.lit(lvl).cast("long").alias("lvl"), "bx", "by",
            F.col("vmin").alias("val"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def region_quadtree_sql(base_select: str, levels: int,
                        x_col: str = "x", y_col: str = "y",
                        val_col: str = "v") -> str:
    """DuckDB twin of ``region_quadtree`` (chained roll-up CTEs)."""
    blocks = [
        f"l0 AS MATERIALIZED (SELECT CAST({x_col} AS BIGINT) AS bx, "
        f"CAST({y_col} AS BIGINT) AS by, CAST({val_col} AS BIGINT) AS vmin, "
        f"CAST({val_col} AS BIGINT) AS vmax, CAST(1 AS BIGINT) AS nu "
        f"FROM ({base_select}) s"
    ]
    for i in range(1, levels + 1):
        blocks.append(f"""l{i} AS MATERIALIZED (
  SELECT bx // 2 AS bx, by // 2 AS by, min(vmin) AS vmin, max(vmax) AS vmax,
         CAST(CASE WHEN sum(CASE WHEN nu = 1 AND vmin = vmax THEN 1 ELSE 0 END) = 4
                    AND count(*) = 4 AND min(vmin) = max(vmax)
              THEN 1 ELSE 0 END AS BIGINT) AS nu
  FROM l{i - 1} GROUP BY 1, 2""")
    sel = []
    for lvl in range(levels + 1):
        if lvl == levels:
            sel.append(
                f"SELECT CAST({lvl} AS BIGINT) AS lvl, bx, by, vmin AS val "
                f"FROM l{lvl} WHERE nu = 1 AND vmin = vmax"
            )
        else:
            sel.append(f"""SELECT CAST({lvl} AS BIGINT) AS lvl, c.bx, c.by, c.vmin AS val
FROM l{lvl} c LEFT JOIN l{lvl + 1} p
  ON p.bx = c.bx // 2 AND p.by = c.by // 2 AND p.nu = 1 AND p.vmin = p.vmax
WHERE c.nu = 1 AND c.vmin = c.vmax AND p.bx IS NULL""")
    return ("WITH " + "),\n".join(blocks) + ")\n"
            + "\nUNION ALL ".join(sel))
