"""k-means clustering (embeddings.kmeans_assign / cluster_balanced).

The oracle gates pin assignments + training bit-for-bit vs DuckDB; these
tests add the numpy ground-truth differential (same exact-integer Lloyd
rules), partitioning invariance, and the balanced-selection cap law.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.ann import QUANT
from sis_spark.operators.embeddings import cluster_balanced, kmeans_assign


def _numpy_kmeans(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Reference replica of the exact-integer Lloyd rules (ids = row index)."""
    q = np.floor(vecs.astype(np.float64) * QUANT).astype(np.int64)
    cent = q[:k].copy()

    def assign(c):
        cn = (c * c).sum(axis=1)
        nv = (q * q).sum(axis=1)
        dist = nv[:, None] + cn[None, :] - 2 * (q @ c.T)
        return dist.argmin(axis=1)

    for _ in range(iters):
        a = assign(cent)
        new = cent.copy()
        for j in range(k):
            sel = q[a == j]
            if len(sel):
                new[j] = np.floor_divide(sel.sum(axis=0), len(sel))
        cent = new
    return assign(cent)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    # 3 well-separated blobs in 8-d
    centers = rng.normal(0, 1, (3, 8)) * 5
    pts = np.concatenate(
        [centers[i] + rng.normal(0, 0.3, (40, 8)) for i in range(3)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, pts


def test_kmeans_matches_numpy_replica(spark, vecs):
    df, pts = vecs
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, k=3, iters=3).collect()
    }
    want = _numpy_kmeans(pts, 3, 3)
    assert got == {i: int(want[i]) for i in range(len(pts))}


def test_kmeans_recovers_blobs(spark, vecs):
    df, pts = vecs
    rows = kmeans_assign(df, k=3, iters=3).collect()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r["vec_id"] // 40, set()).add(r["cluster"])
    # each separated blob lands in exactly one cluster
    assert all(len(s) == 1 for s in by_blob.values())
    assert {r["csize"] for r in rows} == {40}


def test_kmeans_partitioning_invariant(spark, vecs):
    df, pts = vecs
    a = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(df.repartition(7), k=3, iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(df.coalesce(1), k=3, iters=2).collect()
    )
    assert a == b


def test_cluster_balanced_cap(spark, vecs):
    df, pts = vecs
    kept = cluster_balanced(df, k=3, cap=15, iters=2)
    sizes = kept.groupBy("cluster").count().collect()
    assert all(r["count"] <= 15 for r in sizes)
    assert kept.count() == 45  # 3 blobs of 40, capped at 15 each
    # deterministic: rerun yields the identical keep set
    again = cluster_balanced(df, k=3, cap=15, iters=2)
    assert sorted(r["vec_id"] for r in kept.collect()) == sorted(
        r["vec_id"] for r in again.collect()
    )
