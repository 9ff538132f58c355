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
``cells``  cell-prefiltered: candidates restricted to the k-ring of the
           query's cell, ring radius grown until the kth distance is provably
           below the uncovered-ring bound — exact, far less compute when
           candidates are dense.  (Planned; lands with the salting round.)
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
