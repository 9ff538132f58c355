"""kNN join: for each query point, the k nearest candidate points.

The reference's PointTree has bbox search but **no kNN**
(F/index/tree/PointTree.java:82) — this operator is our addition, per the
north star ("H3 k-ring kNN search").  Distance metric: spherical haversine
(the reference's geodesics are ellipsoidal, R/GeodeticCalculator.java:405;
spherical documented + tested).

Strategies
----------
``brute``  exact: broadcast the (small) query set, crossJoin, then a
           **partial top-k per partition** (Arrow-vectorized) followed by a
           final top-k — the classic partial/final aggregate shape, so the
           cross join never shuffles more than ~k rows per (query,
           partition).  Scales to any candidate count as long as the query
           set broadcasts.
``cells``  cell-prefiltered: candidates restricted to the k-ring of each
           query's cell, ring radius grown (driver-side plan loop, the
           GridDerivation style) until the kth distance is provably below
           the distance to the nearest uncovered cell — exact, and touches
           only candidates near the queries.  On a cell-partitioned table
           the per-iteration filter partition-prunes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spark_exprs import haversine_col


def knn_join(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    cand_id: str = "cand_id",
    cand_lon: str = "lon",
    cand_lat: str = "lat",
    query_id: str = "query_id",
    query_lon: str = "qlon",
    query_lat: str = "qlat",
) -> DataFrame:
    """Exact kNN: output (query cols, cand_id, dist_m, rank 1..k).

    Ties broken by candidate id (deterministic, matches the oracle).
    """
    spark = candidates.sparkSession
    par = spark.sparkContext.defaultParallelism
    cand = candidates.select(cand_id, cand_lon, cand_lat)
    if cand.rdd.getNumPartitions() < max(2, par // 2):
        cand = cand.repartition(par)  # small-scan artifact; see spatial_join
    q = queries.select(query_id, query_lon, query_lat)
    joined = cand.crossJoin(F.broadcast(q))
    joined = joined.withColumn(
        "dist_m",
        haversine_col(F.col(cand_lon), F.col(cand_lat), F.col(query_lon), F.col(query_lat)),
    )

    # partial top-k inside each partition (Arrow batch, no shuffle) ...
    schema = joined.schema

    def partial_topk(batches):
        best: dict = {}
        cols = None
        for pdf in batches:
            cols = pdf.columns
            for qid, grp in pdf.groupby(query_id, sort=False):
                sub = grp.nsmallest(k, ["dist_m", cand_id])
                prev = best.get(qid)
                best[qid] = (
                    sub if prev is None
                    else pd.concat([prev, sub]).nsmallest(k, ["dist_m", cand_id])
                )
        if best:
            yield pd.concat(best.values())[cols]

    pruned = joined.mapInPandas(partial_topk, schema=schema)

    # ... then the final exact top-k (tiny input: <= k * n_partitions per query)
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(cand_id).asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _ring_bound_m(qlon: float, qlat: float, res: int, ring: int) -> float:
    """Lower bound on the haversine distance from (qlon, qlat) to any point
    OUTSIDE its Chebyshev-`ring` cell neighborhood at resolution ``res``.

    y-separation: the nearest uncovered row starts `ring` rows away — the
    latitude gap to that boundary bounds d >= R * dphi.  x-separation: a
    point differing only in column lies in the covered latitude band, so
    h >= cos^2(phi_max) sin^2(dlam/2) bounds d (phi_max = band's extreme
    latitude).  Wrap/clamp: a side that reaches the globe edge contributes
    no uncovered region (bound = +inf on that side)."""
    import math

    from ..functions.cells import lonlat_to_ixiy
    from ..functions.geometry import EARTH_RADIUS_M

    n = 1 << res
    cellw = 360.0 / n
    cellh = 180.0 / n
    ix, iy = lonlat_to_ixiy(np.array([qlon]), np.array([qlat]), res)
    ix, iy = int(ix[0]), int(iy[0])
    bounds = []
    # vertical: covered rows [iy-ring, iy+ring]
    lo_row, hi_row = iy - ring, iy + ring
    if lo_row > 0:  # uncovered region below
        lat_edge = lo_row * cellh - 90.0
        bounds.append(EARTH_RADIUS_M * math.radians(qlat - lat_edge))
    if hi_row < n - 1:  # uncovered above
        lat_edge = (hi_row + 1) * cellh - 90.0
        bounds.append(EARTH_RADIUS_M * math.radians(lat_edge - qlat))
    # horizontal: covered cols [ix-ring, ix+ring] (mod n)
    if 2 * ring + 1 < n:
        lon_lo = (ix - ring) * cellw - 180.0
        lon_hi = (ix + ring + 1) * cellw - 180.0
        dlam = math.radians(min((qlon - lon_lo) % 360.0, (lon_hi - qlon) % 360.0))
        band_lo = max(lo_row, 0) * cellh - 90.0
        band_hi = (min(hi_row, n - 1) + 1) * cellh - 90.0
        phi_max = max(abs(band_lo), abs(band_hi))
        cosb = math.cos(math.radians(min(phi_max, 90.0)))
        s = max(0.0, min(1.0, cosb * math.sin(dlam / 2.0)))
        bounds.append(2.0 * EARTH_RADIUS_M * math.asin(s))
    return min(bounds) if bounds else float("inf")


def knn_join_cells(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 7,
    cand_id: str = "cand_id",
    cand_lon: str = "lon",
    cand_lat: str = "lat",
    query_id: str = "query_id",
    query_lon: str = "qlon",
    query_lat: str = "qlat",
    max_iterations: int = 8,
) -> DataFrame:
    """Exact kNN via k-ring expansion; same output contract as knn_join.

    Driver loop (plan-time, reference GridDerivation style): per unsatisfied
    query, collect its ring cells, run a cell-filtered top-k, accept the
    result once kth-distance <= _ring_bound_m; else double the ring.
    Falls back to brute for queries still unsatisfied at max_iterations
    (near-empty neighborhoods).

    The START ring comes from a candidate cell histogram (one
    groupBy(cell).count(), <= 4^res rows collected): the smallest Chebyshev
    ring whose cumulative candidate count reaches k, plus one margin ring so
    the distance bound usually certifies on the first Spark round.  Without
    this, dense queries begin at ring 1 and the loop pays several whole-scan
    rounds growing the ring (the local density estimate of NOTES round-2
    item 3)."""
    import pandas as pd

    from ..functions.cells import cell_to_ixiy, k_ring, encode_cell, lonlat_to_ixiy
    from ..functions.spark_exprs import cell_col

    spark = candidates.sparkSession
    qrows = queries.select(query_id, query_lon, query_lat).collect()
    pending = {int(r[query_id]): (float(r[query_lon]), float(r[query_lat])) for r in qrows}
    results = []
    par = spark.sparkContext.defaultParallelism
    cand = candidates.select(cand_id, cand_lon, cand_lat)
    if cand.rdd.getNumPartitions() < max(2, par // 2):
        cand = cand.repartition(par)
    cand = cand.withColumn("__cell", cell_col(F.col(cand_lon), F.col(cand_lat), res)).cache()

    # ---- density-seeded start rings (one histogram scan, driver-side plan)
    n = 1 << res
    hist = cand.groupBy("__cell").agg(F.count(F.lit(1)).alias("cnt")).collect()
    ring_of: dict[int, int] = {}
    if hist:
        hcell = np.array([r["__cell"] for r in hist], dtype=np.int64)
        hcnt = np.array([r["cnt"] for r in hist], dtype=np.int64)
        hix, hiy = cell_to_ixiy(hcell, res)
        hix = hix.astype(np.int64)
        hiy = hiy.astype(np.int64)
        total = int(hcnt.sum())
        for qid, (qlon, qlat) in pending.items():
            if total < k:
                ring_of[qid] = n  # degenerate: fewer than k candidates exist
                continue
            qx, qy = lonlat_to_ixiy(np.array([qlon]), np.array([qlat]), res)
            dx = np.abs(hix - int(qx[0]))
            dx = np.minimum(dx, n - dx)  # longitude wraps
            cheb = np.maximum(dx, np.abs(hiy - int(qy[0])))
            order = np.argsort(cheb, kind="stable")
            cum = np.cumsum(hcnt[order])
            j = int(np.searchsorted(cum, k))
            ring_of[qid] = int(cheb[order[min(j, len(order) - 1)]]) + 1
    else:
        for qid in pending:
            ring_of[qid] = 1

    for _ in range(max_iterations):
        if not pending:
            break
        # (cell, qid) membership table for the current rings — broadcast side
        rows = []
        for qid, (qlon, qlat) in pending.items():
            c = int(encode_cell(np.array([qlon]), np.array([qlat]), res)[0])
            for cc in k_ring(c, res, min(ring_of[qid], n)):
                rows.append((int(cc), qid))
        member = spark.createDataFrame(
            pd.DataFrame(rows, columns=["__cell", query_id]).astype("int64")
        )
        qdf = spark.createDataFrame(
            pd.DataFrame(
                [(qid, lo, la) for qid, (lo, la) in pending.items()],
                columns=[query_id, query_lon, query_lat],
            )
        )
        sub = (
            cand.join(F.broadcast(member), "__cell")
            .join(F.broadcast(qdf), query_id)
            .withColumn(
                "dist_m",
                haversine_col(F.col(cand_lon), F.col(cand_lat), F.col(query_lon), F.col(query_lat)),
            )
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(cand_id).asc())
        topk = (
            sub.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, "rank", cand_id, "dist_m", cand_lon, cand_lat, query_lon, query_lat)
            .collect()
        )
        by_q: dict = {}
        for r in topk:
            by_q.setdefault(int(r[query_id]), []).append(r)
        done = []
        for qid, (qlon, qlat) in pending.items():
            got = by_q.get(qid, [])
            bound = _ring_bound_m(qlon, qlat, res, min(ring_of[qid], n))
            if len(got) >= k and float(got[k - 1]["dist_m"]) <= bound:
                results.extend(got)
                done.append(qid)
            elif ring_of[qid] >= n:
                # whole globe covered: whatever came back IS the exact answer
                results.extend(got)
                done.append(qid)
            else:
                ring_of[qid] = min(ring_of[qid] * 2, n)
        for qid in done:
            del pending[qid]

    if pending:  # sparse neighborhoods: exact brute fallback for the rest
        rest_q = spark.createDataFrame(
            pd.DataFrame(
                [(qid, lo, la) for qid, (lo, la) in pending.items()],
                columns=[query_id, query_lon, query_lat],
            )
        )
        rest = knn_join(
            cand.drop("__cell"), rest_q, k, cand_id, cand_lon, cand_lat,
            query_id, query_lon, query_lat,
        ).collect()
        results.extend(rest)

    cand.unpersist()
    out = pd.DataFrame(
        [(int(r[query_id]), int(r["rank"]), int(r[cand_id])) for r in results],
        columns=[query_id, "rank", cand_id],
    )
    return spark.createDataFrame(out.astype("int64"))
