"""Point-in-polygon spatial join: cell-key equi-join prefilter + exact PIP refine.

The reference has spatial *filters* only (F/filter/BinarySpatialFilter.java) —
a spatial join must be phrased as a per-row filter (nested loop,
S/aggregate/JoinFeatureSet.java:485-512).  This operator is the Spark-native
replacement: a **two-phase** join per the north rule:

Phase 1 (prefilter, plan-time + map-side):
    * driver computes each polygon's covering cells at a resolution chosen
      from the polygon size distribution (the GridDerivation-style pruning of
      F/coverage/grid/GridDerivation.java:332 done as plan construction);
    * points get their cell id via a JVM codegen expression (no Python);
    * candidates = points ⋈ broadcast(poly_cells) on cell — a broadcast hash
      join, so the skewed hot cells never shuffle.

Phase 2 (refine, Arrow-vectorized):
    * mapInPandas ray-casting PIP (numpy even-odd kernel) against the
      polygon vertex arrays shipped once per executor via a Spark broadcast —
      the "broadcast STRtree" role of the north star; envelopes are checked
      first (cheap numpy mask), then full PIP.

For polygon sets too big to broadcast, ``strategy="shuffle"`` joins on cell
with optional salting of hot cells (see salt_hot_cells) — the long-tail path
of the two-phase broadcast-then-shuffle design.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells as _cells
from ..functions import geometry as _geo
from ..functions.spark_exprs import cell_col


def choose_resolution(polygons: list[dict]) -> int:
    """Cell res whose cell size ~ median polygon diameter (1-4 covering cells
    per typical polygon, fine enough to prune the point side)."""
    if not polygons:
        return 7
    widths = [max(p["xmax"] - p["xmin"], (p["ymax"] - p["ymin"]) * 2.0) for p in polygons]
    med = float(np.median(widths)) or 1.0
    res = int(math.floor(math.log2(360.0 / med)))
    return max(1, min(res, 14))


def polygon_cells(polygons: list[dict], res: int, classify: bool = False) -> pd.DataFrame:
    """(cell, poly_idx, envelope[, sure]) covering table — plan-time, driver.

    Carrying the part envelope per row lets the candidate join apply a
    JVM-side envelope filter BEFORE the Arrow PIP refine: cells only
    approximate the envelope, so 30-60% of cell-matched candidates fail the
    exact envelope test — pruning them in codegen keeps those rows from ever
    crossing the Python boundary.

    ``classify=True`` additionally marks each covering cell ``sure`` when it
    is PROVABLY interior to the polygon: all 4 cell corners inside (even-odd
    over all rings) and no ring edge intersecting the cell rectangle
    (Liang–Barsky; a hole fully inside the cell shows up as edges inside the
    rect, so holes are handled).  Points in a sure cell are matches by
    construction and skip the PIP refine entirely — at the engine's skewed
    workloads ~70% of candidate pairs fall in sure cells at res+3."""
    cell_list = []
    idx_list = []
    envs = []
    sures = []
    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n
    for i, p in enumerate(polygons):
        cov = _cells.covering_cells(p["xmin"], p["ymin"], p["xmax"], p["ymax"], res)
        cell_list.append(cov)
        idx_list.append(np.full(cov.shape, i, dtype=np.int64))
        envs.append(
            np.broadcast_to(
                np.array([[p["xmin"], p["ymin"], p["xmax"], p["ymax"]]]), (len(cov), 4)
            )
        )
        if classify:
            ix, iy = _cells.cell_to_ixiy(cov, res)
            x0 = ix.astype(np.float64) * cw - 180.0
            y0 = iy.astype(np.float64) * ch - 90.0
            x1, y1 = x0 + cw, y0 + ch
            corners_in = np.ones(len(cov), dtype=bool)
            for cx, cy in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
                acc = np.zeros(len(cov), dtype=np.int64)
                for vx, vy in p["rings"]:
                    acc += _geo.points_in_polygon(cx, cy, vx, vy).astype(np.int64)
                corners_in &= (acc % 2).astype(bool)
            hit = np.zeros(len(cov), dtype=bool)
            for vx, vy in p["rings"]:
                wx, wy = np.roll(vx, -1), np.roll(vy, -1)
                hit |= _geo.segments_intersect_rects(vx, vy, wx, wy, x0, y0, x1, y1)
            sures.append(corners_in & ~hit)
    cols = ["cell", "poly_idx", "e_xmin", "e_ymin", "e_xmax", "e_ymax"] + (
        ["sure"] if classify else []
    )
    if not cell_list:
        return pd.DataFrame({c: [] for c in cols})
    env = np.concatenate(envs)
    out = {
        "cell": np.concatenate(cell_list),
        "poly_idx": np.concatenate(idx_list),
        "e_xmin": env[:, 0],
        "e_ymin": env[:, 1],
        "e_xmax": env[:, 2],
        "e_ymax": env[:, 3],
    }
    if classify:
        out["sure"] = np.concatenate(sures)
    return pd.DataFrame(out)


def normalize_polygons(polygons: list[dict]) -> list[dict]:
    """Canonical polygon parts: each output dict has key, rings (outer +
    holes), and envelope.  Polygons given in *continuous* longitudes beyond
    ±180 (the natural way to write an anti-meridian-crossing ring) are SPLIT
    at the meridian into two parts with the same key
    (R/geometry/WraparoundMethod.java:55 SPLIT applied to polygon geometry).
    """
    out = []
    for p in polygons:
        rings = [(np.asarray(p["vx"], dtype=np.float64), np.asarray(p["vy"], dtype=np.float64))]
        for hvx, hvy in p.get("holes", []):
            rings.append((np.asarray(hvx, dtype=np.float64), np.asarray(hvy, dtype=np.float64)))
        all_x = np.concatenate([r[0] for r in rings])
        parts: list[list] = []
        if all_x.max() > 180.0:
            lo = [_geo.clip_polygon_x(vx, vy, 180.0, keep_leq=True) for vx, vy in rings]
            hi = [
                (cvx - 360.0, cvy)
                for cvx, cvy in (_geo.clip_polygon_x(vx, vy, 180.0, keep_leq=False) for vx, vy in rings)
            ]
            parts = [lo, hi]
        elif all_x.min() < -180.0:
            hi = [_geo.clip_polygon_x(vx, vy, -180.0, keep_leq=False) for vx, vy in rings]
            lo = [
                (cvx + 360.0, cvy)
                for cvx, cvy in (_geo.clip_polygon_x(vx, vy, -180.0, keep_leq=True) for vx, vy in rings)
            ]
            parts = [hi, lo]
        else:
            parts = [rings]
        for part in parts:
            part = [(vx, vy) for vx, vy in part if len(vx) >= 3]
            if not part:
                continue
            ox = np.concatenate([r[0] for r in part])
            oy = np.concatenate([r[1] for r in part])
            out.append({
                "key": int(p["key"]),
                "rings": part,
                "xmin": float(ox.min()),
                "ymin": float(oy.min()),
                "xmax": float(ox.max()),
                "ymax": float(oy.max()),
            })
    return out


def _pack_polygons(parts: list[dict]):
    """Dense padded ring arrays for the vectorized refine kernel
    (geometry.pad_polygons: duplicate-vertex padding is exact for even-odd).
    ``parts`` must be normalize_polygons output."""
    rings_vx: list = []
    rings_vy: list = []
    ring_start = np.zeros(len(parts) + 1, dtype=np.int64)
    for i, p in enumerate(parts):
        for vx, vy in p["rings"]:
            rings_vx.append(vx)
            rings_vy.append(vy)
        ring_start[i + 1] = ring_start[i] + len(p["rings"])
    RVX, RVY = _geo.pad_polygons(rings_vx, rings_vy)
    env = np.array(
        [[p["xmin"], p["ymin"], p["xmax"], p["ymax"]] for p in parts]
    ) if parts else np.zeros((0, 4))
    keys = np.array([p["key"] for p in parts], dtype=np.int64)
    return {"RVX": RVX, "RVY": RVY, "ring_start": ring_start, "env": env, "keys": keys}


def spatial_join(
    points: DataFrame,
    polygons: list[dict],
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int | None = None,
    poly_key_col: str = "poly_key",
    strategy: str = "broadcast",
    salt: int | str | None = None,
    interior_skip: bool = True,
) -> DataFrame:
    """Inner join: one output row per (point row, containing polygon).

    ``polygons``: list of dicts with key/vx/vy/xmin..ymax (synth.polygon_table_np
    shape, or built from WKB via sources.polygons_from_wkb).

    ``interior_skip``: run the prefilter 3 resolutions finer and classify
    covering cells at plan time; candidates in provably-interior cells are
    emitted as matches WITHOUT the Arrow PIP refine (~70% of pairs under the
    engine's skewed workloads).  Exact — a sure cell admits no false
    positives by construction.
    """
    spark = points.sparkSession
    polygons = normalize_polygons(polygons)  # holes + anti-meridian SPLIT
    if not polygons:
        return points.limit(0).withColumn(poly_key_col, F.lit(None).cast("long"))
    if res is None:
        res = choose_resolution(polygons)
        if interior_skip:
            res = min(res + 3, 14)
    packed = _pack_polygons(polygons)
    bc = spark.sparkContext.broadcast(packed)

    pc = polygon_cells(polygons, res, classify=interior_skip)
    # covering-table guardrail: if the finer resolution explodes the
    # broadcast side (huge polygons), back off to the coarse plan
    if interior_skip and len(pc) > 2_000_000:
        res = choose_resolution(polygons)
        interior_skip = False
        pc = polygon_cells(polygons, res)
    pc = pc.astype({"cell": "int64", "poly_idx": "int64"})
    cand_df = spark.createDataFrame(pc)
    # CPU-bound refine must not inherit a tiny-scan partitioning: a small
    # parquet (1 rowgroup) scans as ONE split, which would serialize the
    # whole map-side pipeline.  At 100 TB the scan has thousands of splits;
    # here we restore parallelism explicitly when the source lacks it.
    par = spark.sparkContext.defaultParallelism
    if not points.isStreaming and points.rdd.getNumPartitions() < max(2, par // 2):
        # (streaming sources own their partitioning; .rdd is illegal there)
        points = points.repartition(par)
    pts = points.withColumn("__cell", cell_col(F.col(lon_col), F.col(lat_col), res))

    if strategy == "broadcast":
        cand = pts.join(F.broadcast(cand_df), pts["__cell"] == cand_df["cell"], "inner")
    else:  # shuffle path with optional hot-cell salting
        if salt == "auto":
            # measure, don't guess: sampled cell histogram -> hot cell set +
            # salt factor sized so a hot cell's rows spread over ~target
            # rows per shuffle partition (the cell-frequency sampling +
            # salted-repartition design of the north rule).  Only HOT cells
            # pay the dimension-side explosion; the long tail joins plain.
            hot = hot_cells_with_counts(points, lon_col, lat_col, res)
            if hot:
                hot_set = {int(c) for c in hot}
                max_est = max(hot.values())
                salt_n = int(min(64, max(2, max_est // TARGET_ROWS_PER_SALT + 1)))
                # split the DIMENSION side only (tiny, driver-side pandas) —
                # each equi-join then routes points by itself; no isin over
                # the big cell expression on the fact side (an isin there
                # blows whole-stage codegen past the 64 KB method limit and
                # drops the scan to interpreted mode)
                pc_hot = pc[pc["cell"].isin(hot_set)]
                pc_cold = pc[~pc["cell"].isin(hot_set)]
                parts = []
                if len(pc_cold):
                    cold_df = spark.createDataFrame(pc_cold)
                    parts.append(pts.join(cold_df, pts["__cell"] == cold_df["cell"], "inner"))
                if len(pc_hot):
                    pts_s = pts.withColumn(
                        "__salt", F.pmod(F.hash(F.col(lon_col), F.col(lat_col)), F.lit(salt_n))
                    )
                    hot_exploded = pc_hot.loc[pc_hot.index.repeat(salt_n)].reset_index(drop=True)
                    hot_exploded["__salt"] = np.tile(np.arange(salt_n), len(pc_hot))
                    hot_df = spark.createDataFrame(
                        hot_exploded.astype({"__salt": "int64"})
                    )
                    parts.append(
                        pts_s.join(
                            hot_df,
                            (pts_s["__cell"] == hot_df["cell"]) & (pts_s["__salt"] == hot_df["__salt"]),
                            "inner",
                        ).drop("__salt")
                    )
                cand = parts[0]
                for extra in parts[1:]:
                    cand = cand.unionByName(extra)
            else:
                cand = pts.join(cand_df, pts["__cell"] == cand_df["cell"], "inner")
        elif salt:
            # salt the fact side; explode the dimension side over the salt
            # range so hot cells spread across `salt` shuffle partitions
            pts = pts.withColumn("__salt", F.pmod(F.hash(F.col(lon_col), F.col(lat_col)), F.lit(salt)))
            salts = spark.range(salt).withColumnRenamed("id", "__salt")
            cand_df = cand_df.crossJoin(salts)
            cand = pts.join(
                cand_df,
                (pts["__cell"] == cand_df["cell"]) & (pts["__salt"] == cand_df["__salt"]),
                "inner",
            ).drop("__salt")
        else:
            cand = pts.join(cand_df, pts["__cell"] == cand_df["cell"], "inner")

    # exact-envelope prune in codegen (plain column compares) so rows the
    # PIP could never accept don't pay the Arrow transfer
    env_ok = (
        (F.col(lon_col) >= F.col("e_xmin")) & (F.col(lon_col) <= F.col("e_xmax"))
        & (F.col(lat_col) >= F.col("e_ymin")) & (F.col(lat_col) <= F.col("e_ymax"))
    )
    drop_cols = ["cell", "__cell", "e_xmin", "e_ymin", "e_xmax", "e_ymax"] + (
        ["sure"] if interior_skip else []
    )

    # Refine as a SCALAR Arrow UDF used in a filter: only (lon, lat,
    # poly_idx) cross the Python boundary; every other column stays JVM-side
    # (ArrowEvalPython is a projection, not a row pipe).
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def pip_ok(lon_s: pd.Series, lat_s: pd.Series, gi_s: pd.Series) -> pd.Series:
        p = bc.value
        px = lon_s.to_numpy(dtype=np.float64)
        py = lat_s.to_numpy(dtype=np.float64)
        gi = gi_s.to_numpy(dtype=np.int64)
        # dense (N, K) crossing passes, one per ring ordinal (1 for hole-free)
        keep = _geo.points_in_padded_rings(
            px, py, gi, p["RVX"], p["RVY"], p["ring_start"]
        )
        return pd.Series(keep)

    if interior_skip:
        # interior cells ARE matches (no envelope, no PIP); boundary cells
        # go through the full refine.  Two pipelines over the same map-side
        # join — the join is cheap next to the Arrow refine it avoids.
        sure_rows = cand.filter(F.col("sure")).drop(*drop_cols)
        unsure = cand.filter(~F.col("sure")).filter(env_ok)
        refined = sure_rows.unionByName(
            unsure.filter(pip_ok(F.col(lon_col), F.col(lat_col), F.col("poly_idx"))).drop(*drop_cols)
        )
    else:
        cand = cand.filter(env_ok).drop(*drop_cols)
        refined = cand.filter(pip_ok(F.col(lon_col), F.col(lat_col), F.col("poly_idx")))

    keys_arr = packed["keys"]
    key_map = spark.createDataFrame(
        pd.DataFrame({"poly_idx": np.arange(len(keys_arr)), poly_key_col: keys_arr})
    )
    return refined.join(F.broadcast(key_map), "poly_idx").drop("poly_idx")


def cell_histogram(points: DataFrame, lon_col: str, lat_col: str, res: int) -> DataFrame:
    """groupBy(cell).count() — the cell-frequency sampling input for salting
    decisions (map-side partial aggregation makes skew harmless here)."""
    return (
        points.withColumn("cell", cell_col(F.col(lon_col), F.col(lat_col), res))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hot_cells(points: DataFrame, lon_col: str, lat_col: str, res: int,
              sample_fraction: float = 0.01, threshold: int = 1000) -> list[int]:
    """Sampled cell-frequency scan -> list of hot cell ids (driver-side plan
    input for salting; the sampling-over-joins idea from PAPERS.md)."""
    return list(hot_cells_with_counts(points, lon_col, lat_col, res, sample_fraction, threshold))


# rows of one hot cell that should land in a single shuffle partition before
# another salt bucket is added (sized for the Arrow-refine throughput)
TARGET_ROWS_PER_SALT = 250_000


def hot_cells_with_counts(points: DataFrame, lon_col: str, lat_col: str, res: int,
                          sample_fraction: float = 0.01, threshold: int = 1000) -> dict[int, int]:
    """Like hot_cells but returns {cell: estimated_total_rows} so the caller
    can size the salt factor from the worst cell (spatial_join salt='auto')."""
    hist = cell_histogram(points.sample(sample_fraction, seed=42), lon_col, lat_col, res)
    rows = hist.filter(F.col("n") >= threshold * sample_fraction).collect()
    return {int(r["cell"]): int(r["n"] / sample_fraction) for r in rows}


# ----------------------------------------------- distributed polygon dimension
#
# spatial_join() holds the polygon set on the driver (fine for broadcastable
# dims).  spatial_join_dist keeps the polygon side a DataFrame END TO END:
# normalize, covering-cell generation, and classification all run as Arrow
# stages on executors, so millions of polygons never materialize driver-side
# (JoinFeatureSet's set-vs-set contract, S/aggregate/JoinFeatureSet.java:74).
# Boundary ("unsure") covering cells carry their part's WKB through the cell
# equi-join; interior cells carry NULL and skip the refine entirely.

def _choose_res_dist(parts: DataFrame) -> int:
    """choose_resolution over a distributed parts table: approximate median
    part diameter via one tiny percentile_approx aggregate."""
    row = parts.select(
        F.percentile_approx(
            F.greatest(F.col("xmax") - F.col("xmin"), (F.col("ymax") - F.col("ymin")) * 2.0),
            F.lit(0.5),
        ).alias("med")
    ).first()
    med = float(row["med"] or 1.0) or 1.0
    return max(1, min(int(math.floor(math.log2(360.0 / med))), 14))


def polygon_parts_df(polygons_df: DataFrame, key_col: str = "key", wkb_col: str = "wkb") -> DataFrame:
    """(key, wkb) polygon table -> normalized parts table
    (key, wkb, xmin, ymin, xmax, ymax): anti-meridian SPLIT, MultiPolygon
    member expansion, holes preserved — the distributed analog of
    normalize_polygons (BinaryGeometryFilter.optimize plan normalization)."""
    from ..functions import geometry as geo
    from ..sources import polygons_from_wkb

    def norm(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            parts = normalize_polygons(
                polygons_from_wkb(zip(pdf[key_col].tolist(), pdf[wkb_col].tolist()))
            )
            yield pd.DataFrame({
                "key": np.array([p["key"] for p in parts], dtype=np.int64),
                "wkb": [bytes(geo.wkb_polygon(p["rings"])) for p in parts],
                "xmin": np.array([p["xmin"] for p in parts]),
                "ymin": np.array([p["ymin"] for p in parts]),
                "xmax": np.array([p["xmax"] for p in parts]),
                "ymax": np.array([p["ymax"] for p in parts]),
            })

    return polygons_df.select(F.col(key_col), F.col(wkb_col)).mapInPandas(
        norm, schema="key long, wkb binary, xmin double, ymin double, xmax double, ymax double"
    )


def polygon_cells_df(parts: DataFrame, res: int, classify: bool = True) -> DataFrame:
    """Distributed covering table: one row per (covering cell, part), with the
    part envelope for the codegen prune, ``sure`` for provably-interior cells,
    and the part WKB on NON-sure rows only (interior matches never pay the
    geometry transfer).  Same classification as polygon_cells."""
    from ..sources import polygons_from_wkb

    n = 1 << res
    cw, ch = 360.0 / n, 180.0 / n

    def cover(batches):
        for pdf in batches:
            for key, wkb, xmin, ymin, xmax, ymax in zip(
                pdf["key"], pdf["wkb"], pdf["xmin"], pdf["ymin"], pdf["xmax"], pdf["ymax"]
            ):
                cov = _cells.covering_cells(xmin, ymin, xmax, ymax, res)
                m = len(cov)
                if m == 0:
                    continue
                if classify:
                    (part,) = polygons_from_wkb([(key, wkb)])
                    rings = [(part["vx"], part["vy"])] + list(part["holes"])
                    ix, iy = _cells.cell_to_ixiy(cov, res)
                    x0 = ix.astype(np.float64) * cw - 180.0
                    y0 = iy.astype(np.float64) * ch - 90.0
                    x1, y1 = x0 + cw, y0 + ch
                    corners_in = np.ones(m, dtype=bool)
                    for cx, cy in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
                        acc = np.zeros(m, dtype=np.int64)
                        for vx, vy in rings:
                            acc += _geo.points_in_polygon(cx, cy, vx, vy).astype(np.int64)
                        corners_in &= (acc % 2).astype(bool)
                    hit = np.zeros(m, dtype=bool)
                    for vx, vy in rings:
                        wx, wy = np.roll(vx, -1), np.roll(vy, -1)
                        hit |= _geo.segments_intersect_rects(vx, vy, wx, wy, x0, y0, x1, y1)
                    sure = corners_in & ~hit
                else:
                    sure = np.zeros(m, dtype=bool)
                yield pd.DataFrame({
                    "cell": cov,
                    "pkey": np.full(m, key, dtype=np.int64),
                    "e_xmin": np.full(m, xmin),
                    "e_ymin": np.full(m, ymin),
                    "e_xmax": np.full(m, xmax),
                    "e_ymax": np.full(m, ymax),
                    "sure": sure,
                    "pwkb": [None if s else bytes(wkb) for s in sure],
                })

    return parts.mapInPandas(
        cover,
        schema="cell long, pkey long, e_xmin double, e_ymin double, "
               "e_xmax double, e_ymax double, sure boolean, pwkb binary",
    )


def compact_cover(cov: DataFrame, res: int, levels: int) -> DataFrame:
    """Mixed-resolution covering table: the ``sure`` (provably-interior) rows
    of a ``polygon_cells_df(res)`` output are compacted per polygon part —
    wherever all four Morton siblings are interior they are replaced by the
    parent, up to ``levels`` times (operators/tiling.compact_cells per key).
    Boundary (non-sure) rows pass through untouched at ``res``.

    Output = input columns + ``cres`` (the resolution each row now lives at).
    The result is still a disjoint cover per part: a promoted parent's
    descendants were all sure, so no surviving row is its ancestor or
    descendant — a point therefore still matches at most one covering row
    per part, no candidate dedup needed.

    Scale rationale: interior cell count grows ~4^levels with covering
    resolution while the boundary ring grows ~2^levels; compaction caps the
    interior at its coarse-resolution size, often pulling a
    continental-polygon covering table back under the broadcast threshold.
    The fact side pays an ancestor-chain explode of (levels+1) rows per
    point (pure codegen) — see spatial_join_dist(compact_levels=...)."""
    levels = max(0, min(levels, res - 1))  # never promote above res 1
    env_cols = ["e_xmin", "e_ymin", "e_xmax", "e_ymax"]
    unsure = cov.filter(~F.col("sure")).withColumn("cres", F.lit(res))
    level = cov.filter(F.col("sure")).localCheckpoint()
    out = []
    for d in range(levels):
        parents = (
            level.groupBy(F.col("pkey"), F.shiftright("cell", 2).alias("pcell"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.first(c).alias(c) for c in env_cols],
            )
        )
        full = parents.filter(F.col("n") == 4)
        fsel = full.select(F.col("pkey").alias("fpkey"), F.col("pcell").alias("fpcell"))
        kept = level.join(
            fsel,
            (level["pkey"] == fsel["fpkey"])
            & (F.shiftright(level["cell"], 2) == fsel["fpcell"]),
            "left_anti",
        )
        out.append(kept.withColumn("cres", F.lit(res - d)))
        level = (
            full.select(
                F.col("pcell").alias("cell"), "pkey", *env_cols,
                F.lit(True).alias("sure"),
                F.lit(None).cast("binary").alias("pwkb"),
            )
            .localCheckpoint()  # truncate round-over-round lineage
        )
    res_out = level.withColumn("cres", F.lit(res - levels))
    for part in out:
        res_out = res_out.unionByName(part)
    return res_out.unionByName(unsure)


def spatial_join_dist(
    points: DataFrame,
    polygons_df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int | None = None,
    poly_key_col: str = "poly_key",
    key_col: str = "key",
    wkb_col: str = "wkb",
    interior_skip: bool = True,
    broadcast_threshold: int = 0,
    compact_levels: int = 0,
) -> DataFrame:
    """Point-in-polygon join with a DataFrame polygon side (never collected
    on the pure-distributed path).

    Same two-phase semantics and output as spatial_join: one row per
    (point row, containing polygon key).  The covering table joins on cell
    as a plain equi-join (AQE broadcasts it when small, shuffles + skew-splits
    it when not); the PIP refine parses each candidate's own part WKB inside
    the Arrow batch, grouped by geometry so each part is decoded once per
    batch.

    ``broadcast_threshold``: ADAPTIVE strategy pick (the AQE-style decision
    the reference leaves to its store, SQLStore pushdown analog) — when the
    normalized parts table is at most this many rows, the dimension is
    collected and the proven broadcast plan of ``spatial_join`` runs
    instead (faster: packed-array refine, no per-candidate WKB transfer).
    0 (default) forces the fully distributed plan.

    ``compact_levels``: mixed-resolution covering (requires interior_skip).
    The interior of each polygon's cover is compacted up to this many
    Morton levels (compact_cover), shrinking the dimension table ~4^levels
    on the interior; the point side joins through an ancestor-cell chain
    explode of (compact_levels+1) rows per point (pure codegen shiftright).
    Value-identical output to every other strategy.  ``"auto"`` picks the
    level from one measured aggregate over the parts table (the
    measure-then-plan discipline of the salting path): estimated interior
    cell count (Σ area / cell area) over estimated boundary cell count
    (Σ perimeter / cell edge) — compaction beyond the point where the
    boundary ring dominates buys nothing, and each extra level costs a
    fact-side explode row, so levels = ceil(log4(interior/boundary)),
    capped at 6.
    """
    from ..sources import polygons_from_wkb

    spark = points.sparkSession
    parts = polygon_parts_df(polygons_df, key_col, wkb_col).persist()
    if broadcast_threshold:
        n_parts = parts.limit(broadcast_threshold + 1).count()
        if n_parts <= broadcast_threshold:
            rows = [(r["key"], bytes(r["wkb"])) for r in parts.collect()]
            return spatial_join(
                points, polygons_from_wkb(rows), lon_col, lat_col,
                res=res, poly_key_col=poly_key_col, interior_skip=interior_skip,
            )
    if res is None:
        res = _choose_res_dist(parts)
        if interior_skip:
            res = min(res + 3, 14)
    cov = polygon_cells_df(parts, res, classify=interior_skip)

    par = spark.sparkContext.defaultParallelism
    if not points.isStreaming and points.rdd.getNumPartitions() < max(2, par // 2):
        # (streaming sources own their partitioning; .rdd is illegal there)
        points = points.repartition(par)
    pts = points.withColumn("__cell", cell_col(F.col(lon_col), F.col(lat_col), res))

    drop_cols = ["cell", "__cell", "e_xmin", "e_ymin", "e_xmax", "e_ymax", "sure", "pwkb"]
    if compact_levels == "auto":
        if not interior_skip:
            raise ValueError("compact_levels requires interior_skip=True")
        st = parts.agg(
            F.sum((F.col("xmax") - F.col("xmin")) * (F.col("ymax") - F.col("ymin"))).alias("area"),
            F.sum(2.0 * ((F.col("xmax") - F.col("xmin")) + (F.col("ymax") - F.col("ymin")))).alias("perim"),
        ).first()
        cw, ch = 360.0 / (1 << res), 180.0 / (1 << res)
        interior = max(float(st["area"] or 0.0) / (cw * ch), 1.0)
        boundary = max(float(st["perim"] or 0.0) / min(cw, ch), 1.0)
        compact_levels = max(0, min(
            6, res - 1, int(math.ceil(math.log(interior / boundary, 4.0)))
        ))
    if compact_levels:
        if not interior_skip:
            raise ValueError("compact_levels requires interior_skip=True")
        compact_levels = max(0, min(compact_levels, res - 1))
        cov = compact_cover(cov, res, compact_levels)
        # ancestor chain: the point's cell at res, res-1, ..., res-levels —
        # exactly one of them can hit each part's (disjoint) mixed-res cover
        pts = pts.withColumn(
            "__jcell",
            F.explode(F.array(*[
                F.shiftright("__cell", 2 * d) for d in range(compact_levels + 1)
            ])),
        )
        cand = pts.join(cov, pts["__jcell"] == cov["cell"], "inner")
        drop_cols += ["__jcell", "cres"]
    else:
        cand = pts.join(cov, pts["__cell"] == cov["cell"], "inner")
    env_ok = (
        (F.col(lon_col) >= F.col("e_xmin")) & (F.col(lon_col) <= F.col("e_xmax"))
        & (F.col(lat_col) >= F.col("e_ymin")) & (F.col(lat_col) <= F.col("e_ymax"))
    )

    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def pip_ok_wkb(lon_s: pd.Series, lat_s: pd.Series, wkb_s: pd.Series) -> pd.Series:
        from ..functions import geometry as geo

        px = lon_s.to_numpy(dtype=np.float64)
        py = lat_s.to_numpy(dtype=np.float64)
        out = np.zeros(len(px), dtype=bool)
        # group rows by geometry: each part decoded once per Arrow batch
        grp: dict[bytes, list[int]] = {}
        for i, b in enumerate(wkb_s):
            grp.setdefault(bytes(b), []).append(i)
        for buf, idxs in grp.items():
            _, rings = geo.wkb_parse(buf)
            ii = np.asarray(idxs, dtype=np.int64)
            acc = np.zeros(len(ii), dtype=np.int64)
            for vx, vy in rings:
                if len(vx) >= 2 and vx[0] == vx[-1] and vy[0] == vy[-1]:
                    vx, vy = vx[:-1], vy[:-1]  # open the ring (implicit close)
                acc += geo.points_in_polygon(px[ii], py[ii], vx, vy).astype(np.int64)
            out[ii] = (acc % 2).astype(bool)
        return pd.Series(out)

    if interior_skip:
        sure_rows = cand.filter(F.col("sure")).drop(*drop_cols)
        unsure = cand.filter(~F.col("sure")).filter(env_ok)
        refined = sure_rows.unionByName(
            unsure.filter(pip_ok_wkb(F.col(lon_col), F.col(lat_col), F.col("pwkb"))).drop(*drop_cols)
        )
    else:
        refined = cand.filter(env_ok).filter(
            pip_ok_wkb(F.col(lon_col), F.col(lat_col), F.col("pwkb"))
        ).drop(*drop_cols)
    return refined.withColumnRenamed("pkey", poly_key_col)


# ------------------------------------------------- polygon-vs-polygon pair join
#
# Arbitrary-pair spatial predicates (BinarySpatialFilter.java:43 dispatching
# to GeometryWrapper.predicate:287) need a polygon-polygon JOIN at engine
# level.  Same covering-cell bucket shape as the point join: candidates are
# key pairs sharing a covering cell (complete: two intersecting envelopes
# share the cell containing any common point), envelope-pruned in codegen,
# then refined by the DE-9IM kernel (functions/relate.py) over WKB pairs.

def polygon_pair_join(
    polygons_df: DataFrame,
    res: int | None = None,
    key_col: str = "key",
    wkb_col: str = "wkb",
) -> DataFrame:
    """Self-join of a polygon table on spatial intersection.

    Output: (a, b, contains_ab, contains_ba) for every pair a < b whose
    polygons intersect (general-position model, functions/relate.py).
    Assumes one part per key (no MultiPolygon / anti-meridian operands —
    those need union-level predicate semantics the general-position model
    does not define)."""
    from ..functions.relate import relate_polygons_pred_batch

    parts = polygon_parts_df(polygons_df, key_col, wkb_col).persist()
    if res is None:
        res = _choose_res_dist(parts)
    cov = polygon_cells_df(parts, res, classify=False).select("cell", "pkey")
    pairs = (
        cov.groupBy("cell")
        .agg(F.collect_set("pkey").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    pa = parts.select(
        F.col("key").alias("a"), F.col("wkb").alias("wkb_a"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"),
    )
    pb = parts.select(
        F.col("key").alias("b"), F.col("wkb").alias("wkb_b"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    )
    cand = (
        pairs.join(pa, "a").join(pb, "b")
        # exact envelope prune in codegen before any Python
        .filter(
            (F.col("axmin") <= F.col("bxmax")) & (F.col("bxmin") <= F.col("axmax"))
            & (F.col("aymin") <= F.col("bymax")) & (F.col("bymin") <= F.col("aymax"))
        )
    )

    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType([
            T.StructField("intersects", T.BooleanType()),
            T.StructField("contains_ab", T.BooleanType()),
            T.StructField("contains_ba", T.BooleanType()),
        ])
    )
    def rel(a_s: pd.Series, b_s: pd.Series) -> pd.DataFrame:
        # one padded-grid evaluation for the whole Arrow batch (identical
        # FP expressions to the scalar kernel — oracle-exact)
        p = relate_polygons_pred_batch(a_s, b_s)
        return pd.DataFrame({
            "intersects": p["intersects"],
            "contains_ab": p["contains"],
            "contains_ba": p["within"],
        })

    # AQE coalesces the small (tens of MB) candidate shuffle to ~1 partition,
    # which would serialize the Python refine — its cost is per-ROW CPU, not
    # bytes, so spread candidates across the executor cores explicitly.
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
    # asNondeterministic: stop Catalyst from re-evaluating the struct UDF
    # once per referenced field / pushed filter (measured 2-3x refine cost)
    out = cand.withColumn("r", rel.asNondeterministic()(F.col("wkb_a"), F.col("wkb_b")))
    return (
        out.filter(F.col("r.intersects"))
        .select(
            "a", "b",
            F.col("r.contains_ab").alias("contains_ab"),
            F.col("r.contains_ba").alias("contains_ba"),
        )
    )


def polygon_pair_join_multi(
    polygons_df: DataFrame,
    res: int | None = None,
    key_col: str = "key",
    wkb_col: str = "wkb",
) -> DataFrame:
    """polygon_pair_join for MULTI-PART keys (MultiPolygon members,
    anti-meridian split parts): part-level covering-cell candidates, DE-9IM
    on part pairs, then UNION-LEVEL aggregation per key pair:

    * intersects  = any part pair intersects;
    * contains(A,B) = EVERY part of B is contained in some part of A —
      sound under the valid-multipolygon model (disjoint member interiors):
      a connected B part strictly inside one A member cannot reach any
      other member, so per-part containment composes to union containment.

    Output (a, b, contains_ab, contains_ba) for intersecting key pairs."""
    from ..functions.relate import relate_polygons_pred_batch

    parts = (
        polygon_parts_df(polygons_df, key_col, wkb_col)
        .withColumn("uid", F.monotonically_increasing_id())
        .localCheckpoint()  # pin uids (monotonic ids are plan-dependent)
    )
    if res is None:
        res = _choose_res_dist(parts)
    cov = polygon_cells_df(
        parts.select(F.col("uid").alias("key"), "wkb", "xmin", "ymin", "xmax", "ymax"),
        res, classify=False,
    ).select("cell", F.col("pkey").alias("uid"))
    pairs = (
        cov.groupBy("cell")
        .agg(F.collect_set("uid").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(least(x, y) AS ua, greatest(x, y) AS ub))))"
                )
            ).alias("p")
        )
        .select("p.ua", "p.ub")
        .distinct()
    )
    pa = parts.select(
        F.col("uid").alias("ua"), F.col("key").alias("ka"), F.col("wkb").alias("wkb_a"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"),
    )
    pb = parts.select(
        F.col("uid").alias("ub"), F.col("key").alias("kb"), F.col("wkb").alias("wkb_b"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    )
    cand = (
        pairs.join(pa, "ua").join(pb, "ub")
        .filter(F.col("ka") != F.col("kb"))
        .filter(
            (F.col("axmin") <= F.col("bxmax")) & (F.col("bxmin") <= F.col("axmax"))
            & (F.col("aymin") <= F.col("bymax")) & (F.col("bymin") <= F.col("aymax"))
        )
    )

    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType([
            T.StructField("intersects", T.BooleanType()),
            T.StructField("a_contains_b", T.BooleanType()),
            T.StructField("b_contains_a", T.BooleanType()),
        ])
    )
    def rel(a_s: pd.Series, b_s: pd.Series) -> pd.DataFrame:
        # padded-grid batch evaluation (relate_polygons_pred_batch), not a
        # per-pair Python loop
        p = relate_polygons_pred_batch(a_s, b_s)
        return pd.DataFrame({
            "intersects": p["intersects"],
            "a_contains_b": p["contains"],
            "b_contains_a": p["within"],
        })

    # canonical key orientation: a = lesser key; swap flags where ka > kb
    # (repartition first: per-row-CPU refine must not run on an AQE-coalesced
    # single partition)
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
    flagged = cand.withColumn("r", rel.asNondeterministic()(F.col("wkb_a"), F.col("wkb_b"))).select(
        F.least("ka", "kb").alias("a"),
        F.greatest("ka", "kb").alias("b"),
        F.when(F.col("ka") <= F.col("kb"), F.col("ua")).otherwise(F.col("ub")).alias("pa_uid"),
        F.when(F.col("ka") <= F.col("kb"), F.col("ub")).otherwise(F.col("ua")).alias("pb_uid"),
        F.col("r.intersects").alias("inter"),
        F.when(F.col("ka") <= F.col("kb"), F.col("r.a_contains_b"))
         .otherwise(F.col("r.b_contains_a")).alias("cab"),
        F.when(F.col("ka") <= F.col("kb"), F.col("r.b_contains_a"))
         .otherwise(F.col("r.a_contains_b")).alias("cba"),
    )
    agg = flagged.groupBy("a", "b").agg(
        F.max("inter").alias("intersects"),
        F.count_distinct(F.when(F.col("cab"), F.col("pb_uid"))).alias("b_parts_contained"),
        F.count_distinct(F.when(F.col("cba"), F.col("pa_uid"))).alias("a_parts_contained"),
    )
    nparts = parts.groupBy("key").agg(F.count(F.lit(1)).alias("np"))
    return (
        agg.join(nparts.select(F.col("key").alias("a"), F.col("np").alias("np_a")), "a")
        .join(nparts.select(F.col("key").alias("b"), F.col("np").alias("np_b")), "b")
        .filter(F.col("intersects"))
        .select(
            "a", "b",
            (F.col("b_parts_contained") == F.col("np_b")).alias("contains_ab"),
            (F.col("a_parts_contained") == F.col("np_a")).alias("contains_ba"),
        )
    )


# ---------------------------------------------------------------- line joins

def line_parts_df(lines_df: DataFrame, key_col: str = "key", wkb_col: str = "wkb") -> DataFrame:
    """(key, wkb) LineString table -> (key, wkb, xmin, ymin, xmax, ymax).

    The line analog of polygon_parts_df.  No anti-meridian SPLIT for lines
    (out of the general-position model; callers with wrapping tracks split
    upstream, as the GPX store does per segment)."""
    from ..functions import geometry as geo

    def norm(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys, wkbs, x0, y0, x1, y1 = [], [], [], [], [], []
            for k, b in zip(pdf[key_col].tolist(), pdf[wkb_col].tolist()):
                typ, (vx, vy) = geo.wkb_parse(bytes(b))
                if typ != "linestring":
                    raise ValueError(f"line_parts_df expects LineStrings, got {typ}")
                keys.append(int(k))
                wkbs.append(bytes(b))
                x0.append(float(np.min(vx)))
                y0.append(float(np.min(vy)))
                x1.append(float(np.max(vx)))
                y1.append(float(np.max(vy)))
            yield pd.DataFrame({
                "key": np.array(keys, dtype=np.int64), "wkb": wkbs,
                "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
            })

    return lines_df.select(F.col(key_col), F.col(wkb_col)).mapInPandas(
        norm, schema="key long, wkb binary, xmin double, ymin double, xmax double, ymax double"
    )


def _line_poly_candidates(
    lines_df: DataFrame, polygons_df: DataFrame, res: int | None
) -> DataFrame:
    """Shared candidate stage for mixed-dimension joins: covering-cell
    bucket candidates for BOTH distributed sides, codegen envelope prune,
    spread across executor cores (per-row-CPU refines must not inherit an
    AQE-coalesced single partition).  Columns: lkey, pkey, wkb_l, wkb_p.

    Lifecycle: lparts/pparts are persisted because each feeds both its
    covering-cell branch and the WKB re-attach join (a consumed-twice plan
    is computed twice unpersisted); they stay cached until session end —
    callers running MANY joins per session should spark.catalog.clearCache()
    between batches."""
    lparts = line_parts_df(lines_df).persist()
    pparts = polygon_parts_df(polygons_df).persist()
    if res is None:
        res = _choose_res_dist(pparts)
    lcov = polygon_cells_df(lparts, res, classify=False).select(
        "cell", F.col("pkey").alias("lkey"))
    pcov = polygon_cells_df(pparts, res, classify=False).select("cell", "pkey")
    pairs = lcov.join(pcov, "cell").select("lkey", "pkey").distinct()
    la = lparts.select(
        F.col("key").alias("lkey"), F.col("wkb").alias("wkb_l"),
        F.col("xmin").alias("lxmin"), F.col("ymin").alias("lymin"),
        F.col("xmax").alias("lxmax"), F.col("ymax").alias("lymax"),
    )
    pb = pparts.select(
        F.col("key").alias("pkey"), F.col("wkb").alias("wkb_p"),
        F.col("xmin").alias("pxmin"), F.col("ymin").alias("pymin"),
        F.col("xmax").alias("pxmax"), F.col("ymax").alias("pymax"),
    )
    cand = (
        pairs.join(la, "lkey").join(pb, "pkey")
        .filter(
            (F.col("lxmin") <= F.col("pxmax")) & (F.col("pxmin") <= F.col("lxmax"))
            & (F.col("lymin") <= F.col("pymax")) & (F.col("pymin") <= F.col("lymax"))
        )
        .select("lkey", "pkey", "wkb_l", "wkb_p")
    )
    return cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)


def line_polygon_join(
    lines_df: DataFrame,
    polygons_df: DataFrame,
    res: int | None = None,
) -> DataFrame:
    """Distributed line-vs-polygon spatial join: covering-cell bucket
    candidates for BOTH sides (neither operand table ever lands on the
    driver), codegen envelope prune, then a single Arrow refine evaluating
    the mixed-dimension DE-9IM kernel (functions/relate.py line operands).

    Output: (lkey, pkey, within, crosses) for every intersecting pair —
    the dispatch surface of BinarySpatialFilter.java:43 for dim-1 x dim-2
    operands.  Scale shape mirrors polygon_pair_join: the cell equi-join is
    the only shuffle and the refine sees candidate pairs only."""
    from ..functions.relate import line_polygon_relate_batch

    cand = _line_poly_candidates(lines_df, polygons_df, res)

    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType([
            T.StructField("intersects", T.BooleanType()),
            T.StructField("within", T.BooleanType()),
            T.StructField("crosses", T.BooleanType()),
        ])
    )
    def rel(l_s: pd.Series, p_s: pd.Series) -> pd.DataFrame:
        # one broadcasted evaluation for the whole Arrow batch (identical
        # FP expressions to the scalar kernel — oracle-exact)
        inter, within, crosses = line_polygon_relate_batch(l_s, p_s)
        return pd.DataFrame(
            {"intersects": inter, "within": within, "crosses": crosses}
        )

    out = cand.withColumn("r", rel.asNondeterministic()(F.col("wkb_l"), F.col("wkb_p")))
    return (
        out.filter(F.col("r.intersects"))
        .select(
            "lkey", "pkey",
            F.col("r.within").alias("within"),
            F.col("r.crosses").alias("crosses"),
        )
    )


def line_clip_join(
    lines_df: DataFrame,
    polygons_df: DataFrame,
    res: int | None = None,
) -> DataFrame:
    """Distributed ST_Intersection(line, polygon) length join: the same
    candidate machinery as line_polygon_join, refined by the parametric
    clip kernel (functions/overlay.clip_line_polygon).  Output: one row per
    pair with a non-empty clip — (lkey, pkey, qclip) where qclip is the
    int64 quantized clipped length (per-interval floor at 1e7, sum —
    aggregation-order-independent, hence oracle-exact)."""
    from pyspark.sql import types as T

    from ..functions.overlay import clip_qlen_batch

    cand = _line_poly_candidates(lines_df, polygons_df, res)

    @F.pandas_udf(T.LongType())
    def qclip(l_s: pd.Series, p_s: pd.Series) -> pd.Series:
        # polygon-grouped flat-grid batch kernel (bit-identical to
        # clip_line_polygon's qlen), not a per-pair Python loop
        return pd.Series(clip_qlen_batch(l_s, p_s))

    out = cand.withColumn("qclip", qclip.asNondeterministic()(F.col("wkb_l"), F.col("wkb_p")))
    return out.filter(F.col("qclip") > 0).select("lkey", "pkey", "qclip")


def nearest_line_join(
    points_df: DataFrame,
    lines_df: DataFrame,
    lon_col: str,
    lat_col: str,
    radius: float,
    id_col: str = "event_id",
    key_col: str = "key",
    wkb_col: str = "wkb",
) -> DataFrame:
    """Nearest-polyline join (map-matching): for each point, the single
    nearest line feature within ``radius`` degrees — JoinFeatureSet.java:74's
    set-vs-set contract specialized to a top-1 distance join, the dim-0 ×
    dim-1 counterpart of the kNN join.  Broadcast-dim shape (the line table
    packs into flat segment arrays shipped in the UDF closure, the pattern of
    the ST_Distance gate): points stream through ONE vectorized Arrow stage
    computing an (n_points, n_segments) distance matrix, reduced per line by
    ``minimum.reduceat`` over key-sorted contiguous segment runs.  Ties →
    lowest line key (argmin first-hit over ascending keys).  For line
    dimensions too big to broadcast, generate candidates with the
    cell-bucket machinery of line_polygon_join instead.

    Output (id, key, qdist) with qdist = floor(1e7 · distance); points with
    no line inside the radius drop out (inner-join semantics)."""
    from ..functions import geometry as geo

    rows = sorted(
        ((int(r[key_col]), bytes(r[wkb_col])) for r in lines_df.collect()),
        key=lambda t: t[0],
    )
    vx: list[float] = []
    vy: list[float] = []
    wx: list[float] = []
    wy: list[float] = []
    keys: list[int] = []
    offsets: list[int] = []
    for k, wkb in rows:
        _typ, (lx, ly) = geo.wkb_parse(wkb)
        if len(lx) < 2:
            continue
        keys.append(k)
        offsets.append(len(vx))
        vx.extend(lx[:-1].tolist())
        vy.extend(ly[:-1].tolist())
        wx.extend(lx[1:].tolist())
        wy.extend(ly[1:].tolist())
    schema = "id long, key long, qdist long"
    if not keys:
        return points_df.sparkSession.createDataFrame([], schema)
    sa = tuple(np.asarray(a, np.float64) for a in (vx, vy, wx, wy))
    karr = np.asarray(keys, np.int64)
    offs = np.asarray(offsets, np.int64)
    rq = int(np.floor(radius * 1e7))

    pts = points_df.select(F.col(id_col).alias("id"), lon_col, lat_col)

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d2 = geo.point_segments_dist2(
                pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy(), *sa)
            per_line = np.minimum.reduceat(d2, offs, axis=1)
            qd = np.floor(np.sqrt(per_line) * 1e7).astype(np.int64)
            j = qd.argmin(axis=1)
            best = qd[np.arange(len(qd)), j]
            m = best <= rq
            yield pd.DataFrame({
                "id": pdf["id"].to_numpy()[m],
                "key": karr[j[m]],
                "qdist": best[m],
            })

    return pts.mapInPandas(fn, schema=schema)


def geometry_parts_df(gdf: DataFrame, key_col: str = "key",
                      wkb_col: str = "wkb") -> DataFrame:
    """(key, wkb) table of ANY WKB geometry type -> (key, wkb, envelope).

    The fully-generic analog of polygon_parts_df/line_parts_df (no SPLIT or
    member expansion — distance semantics need the whole geometry): envelope
    from the decomposed vertex set, any of the 7 geometry types."""
    from ..functions import geometry as geo
    from ..functions.sqlmm import geom_decompose

    def norm(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys, wkbs, x0, y0, x1, y1 = [], [], [], [], [], []
            for k, b in zip(pdf[key_col].tolist(), pdf[wkb_col].tolist()):
                D = geom_decompose(*geo.wkb_parse(bytes(b)))
                ax = np.concatenate([D["px"], D["svx"], D["swx"]])
                ay = np.concatenate([D["py"], D["svy"], D["swy"]])
                if len(ax) == 0:
                    continue
                keys.append(int(k))
                wkbs.append(bytes(b))
                x0.append(float(ax.min()))
                y0.append(float(ay.min()))
                x1.append(float(ax.max()))
                y1.append(float(ay.max()))
            yield pd.DataFrame({
                "key": np.array(keys, dtype=np.int64), "wkb": wkbs,
                "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
            })

    return gdf.select(F.col(key_col), F.col(wkb_col)).mapInPandas(
        norm, schema="key long, wkb binary, xmin double, ymin double, xmax double, ymax double"
    )


def _radius_res(parts: DataFrame, radius: float) -> int:
    """Covering resolution for distance-bounded joins: the usual median-part
    heuristic, capped so one cell is never (much) smaller than the radius —
    otherwise the radius-expanded covers grow as (r/cell)^2 per feature."""
    res = _choose_res_dist(parts)
    if radius > 0:
        cap = int(math.floor(math.log2(360.0 / radius)))
        res = min(res, max(1, cap))
    return res


def geometry_distance_join(
    a_df: DataFrame,
    b_df: DataFrame,
    radius: float,
    res: int | None = None,
) -> DataFrame:
    """Distance-bounded spatial join for ANY geometry-type pair — the
    DistanceFilter.java:48 join shape (ST_Distance(a, b) <= d as a join
    predicate), with BOTH sides distributed (no crossJoin, no driver-resident
    dimension, no broadcast-nested-loop).

    Plan: generic envelope parts for each side; the A covers are computed
    over radius-EXPANDED envelopes so any pair within ``radius`` shares a
    covering cell (two intersecting rectangles on one grid always share a
    cell); the cell equi-join is the only shuffle; a codegen envelope prune
    with radius slack runs before the Arrow refine evaluates the exact
    geom_distance kernel (same FP expressions as the ST_Distance gate) on
    candidate pairs only.

    Output: (akey, bkey, qdist) with qdist = floor(1e7 * distance), for
    pairs with qdist <= floor(1e7 * radius)."""
    from ..functions import geometry as geo
    from ..functions.sqlmm import geom_distance_batch

    r = float(radius)
    # qdist <= floor(r*1e7) admits distances up to r + 1e-7; pad the
    # geometric prunes so the quantization granularity can't drop a pair
    rp = r + 1e-6
    # eager localCheckpoint, not persist: each side feeds both its cover
    # branch and the WKB re-attach join, and checkpoint blocks are
    # GC-reclaimed instead of pinned in the CacheManager until session end
    aparts = geometry_parts_df(a_df).localCheckpoint()
    bparts = geometry_parts_df(b_df).localCheckpoint()
    if res is None:
        res = _radius_res(bparts, r)
    aexp = aparts.select(
        "key", "wkb",
        (F.col("xmin") - rp).alias("xmin"), (F.col("ymin") - rp).alias("ymin"),
        (F.col("xmax") + rp).alias("xmax"), (F.col("ymax") + rp).alias("ymax"),
    )
    acov = polygon_cells_df(aexp, res, classify=False).select(
        "cell", F.col("pkey").alias("akey"))
    bcov = polygon_cells_df(bparts, res, classify=False).select(
        "cell", F.col("pkey").alias("bkey"))
    pairs = acov.join(bcov, "cell").select("akey", "bkey").distinct()
    aa = aparts.select(
        F.col("key").alias("akey"), F.col("wkb").alias("wkb_a"),
        F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
        F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"),
    )
    bb = bparts.select(
        F.col("key").alias("bkey"), F.col("wkb").alias("wkb_b"),
        F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
        F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"),
    )
    cand = (
        pairs.join(aa, "akey").join(bb, "bkey")
        .filter(
            (F.col("axmin") - rp <= F.col("bxmax")) & (F.col("bxmin") <= F.col("axmax") + rp)
            & (F.col("aymin") - rp <= F.col("bymax")) & (F.col("bymin") <= F.col("aymax") + rp)
        )
        .select("akey", "bkey", "wkb_a", "wkb_b")
    )
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
    rq = int(np.floor(r * 1e7))

    @F.pandas_udf("long")
    def qdist(a_s: pd.Series, b_s: pd.Series) -> pd.Series:
        # grouped-flat batch kernel, not a per-pair loop (bit-identical to
        # the scalar geom_distance — min/any reductions are value-exact)
        d = geom_distance_batch(a_s, b_s)
        return pd.Series(np.floor(d * 1e7).astype(np.int64))

    out = cand.withColumn(
        "qdist", qdist.asNondeterministic()(F.col("wkb_a"), F.col("wkb_b")))
    return out.filter(F.col("qdist") <= F.lit(rq)).select("akey", "bkey", "qdist")


def nearest_line_join_dist(
    points_df: DataFrame,
    lines_df: DataFrame,
    lon_col: str,
    lat_col: str,
    radius: float,
    id_col: str = "event_id",
    key_col: str = "key",
    wkb_col: str = "wkb",
    res: int | None = None,
) -> DataFrame:
    """nearest_line_join with a fully-DISTRIBUTED line dimension (the
    polygon_parts_df treatment): line envelopes expanded by ``radius`` are
    cell-covered, points bucket to their single cell, the cell equi-join is
    the only shuffle, and an Arrow refine computes per-candidate point-line
    distances (one wkb parse per line per batch, vectorized over its
    points).  Top-1 per point = min(struct(qdist, key)) — identical
    tie-break (lowest key) and quantization to the broadcast path, so both
    satisfy the same oracle.

    Use this when the line table is continental-scale; the broadcast
    variant stays the low-latency path for road-network-sized dims."""
    from ..functions import geometry as geo

    r = float(radius)
    rp = r + 1e-6  # quantization-granularity pad (see geometry_distance_join)
    # eager localCheckpoint, not persist (GC-reclaimed; see geometry_distance_join)
    lparts = line_parts_df(lines_df, key_col, wkb_col).localCheckpoint()
    if res is None:
        res = _radius_res(lparts, r)
    lexp = lparts.select(
        "key", "wkb",
        (F.col("xmin") - rp).alias("xmin"), (F.col("ymin") - rp).alias("ymin"),
        (F.col("xmax") + rp).alias("xmax"), (F.col("ymax") + rp).alias("ymax"),
    )
    lcov = polygon_cells_df(lexp, res, classify=False).select(
        "cell", F.col("pkey").alias("lkey"))

    from ..functions.spark_exprs import cell_col

    pts = points_df.select(
        F.col(id_col).alias("id"), F.col(lon_col).alias("px"), F.col(lat_col).alias("py"),
    ).withColumn("cell", cell_col(F.col("px"), F.col("py"), res))
    cand = (
        pts.join(lcov, "cell")
        .join(
            lparts.select(
                F.col("key").alias("lkey"), F.col("wkb").alias("lwkb"),
                "xmin", "ymin", "xmax", "ymax"),
            "lkey",
        )
        .filter(
            (F.col("px") >= F.col("xmin") - rp) & (F.col("px") <= F.col("xmax") + rp)
            & (F.col("py") >= F.col("ymin") - rp) & (F.col("py") <= F.col("ymax") + rp)
        )
        .select("id", "px", "py", "lkey", "lwkb")
    )
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
    rq = int(np.floor(r * 1e7))

    def fn(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, keys, qds = [], [], []
            for lkey, grp in pdf.groupby("lkey", sort=False):
                wkb = bytes(grp["lwkb"].iloc[0])
                _typ, (lx, ly) = geo.wkb_parse(wkb)
                if len(lx) < 2:
                    continue
                d2 = geo.point_segments_dist2(
                    grp["px"].to_numpy(), grp["py"].to_numpy(),
                    lx[:-1], ly[:-1], lx[1:], ly[1:])
                qd = np.floor(np.sqrt(d2.min(axis=1)) * 1e7).astype(np.int64)
                m = qd <= rq
                ids.append(grp["id"].to_numpy()[m])
                keys.append(np.full(int(m.sum()), int(lkey), np.int64))
                qds.append(qd[m])
            if not ids:
                continue
            yield pd.DataFrame({
                "id": np.concatenate(ids),
                "key": np.concatenate(keys),
                "qdist": np.concatenate(qds),
            })

    hits = cand.mapInPandas(fn, schema="id long, key long, qdist long")
    best = hits.groupBy("id").agg(F.min(F.struct("qdist", "key")).alias("b"))
    return best.select("id", F.col("b.key").alias("key"), F.col("b.qdist").alias("qdist"))


def spacetime_join(
    a: DataFrame,
    b: DataFrame,
    grid_n: int,
    r_q: int,
    tau_us: int,
) -> DataFrame:
    """Spatio-temporal pair join -> (a_id, b_id): b-events within BOTH
    ``r_q`` quantized-coordinate units (planar int64 distance on the
    quantized grid) AND ``tau_us`` microseconds of an a-event.

    Inputs: (id, lon, lat, qx, qy, ts_us) each; ``grid_n`` is the
    per-axis cell count and the cell side must be >= r_q in quantized
    units (the 3x3 neighbor ring then covers every possible match).

    Scale shape: the a-side explodes its 3x3 cell ring (codegen), the
    b-side keys on its exact cell — ONE equi-join on the cell, exact
    integer distance + time predicates after; each pair emitted once
    (b's cell is unique).  Compose with time bucketing (range_join's
    bins) when a cell's population is time-dominated."""
    from pyspark.sql import functions as F

    from .density import grid_expr

    def with_cell(df, prefix):
        return df.select(
            F.col("id").alias(f"{prefix}_id"),
            F.col("qx").alias(f"{prefix}_qx"),
            F.col("qy").alias(f"{prefix}_qy"),
            F.col("ts_us").alias(f"{prefix}_ts"),
            F.expr(grid_expr("x", grid_n)).alias(f"{prefix}_ix"),
            F.expr(grid_expr("y", grid_n)).alias(f"{prefix}_iy"),
        )

    aa = with_cell(a, "a")
    bb = with_cell(b, "b")
    offs = a.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    ae = aa.join(F.broadcast(offs)).select(
        "a_id", "a_qx", "a_qy", "a_ts",
        (F.col("a_ix") + F.col("dx")).alias("cx"),
        (F.col("a_iy") + F.col("dy")).alias("cy"),
    )
    j = ae.join(
        bb,
        (F.col("cx") == F.col("b_ix")) & (F.col("cy") == F.col("b_iy")),
    )
    dx = F.col("a_qx") - F.col("b_qx")
    dy = F.col("a_qy") - F.col("b_qy")
    dt = F.col("a_ts") - F.col("b_ts")
    r2 = F.lit(int(r_q)).cast("long") * F.lit(int(r_q)).cast("long")
    return j.filter(
        (dx * dx + dy * dy <= r2)
        & (F.abs(dt) <= F.lit(int(tau_us)).cast("long"))
    ).select("a_id", "b_id")
