

def test_knn_classify_majority(spark):
    from sis_spark.operators.knn import knn_classify

    # 5 candidates around the query; 3 share label 'b'
    cand = spark.createDataFrame(
        [(1, 0.001, 0.0, "a"), (2, 0.002, 0.0, "b"), (3, 0.0, 0.001, "b"),
         (4, 0.0, 0.002, "b"), (5, 0.003, 0.0, "a"), (6, 50.0, 50.0, "z")],
        "cand_id long, lon double, lat double, label string",
    )
    q = spark.createDataFrame([(9, 0.0, 0.0)], "query_id long, qlon double, qlat double")
    (r,) = knn_classify(cand, q, 5).collect()
    assert (r["query_id"], r["label"], r["votes"]) == (9, "b", 3)


def test_seed_histogram_bounded_at_fine_res(spark):
    """VERDICT r3 item 3: at res 14 over globally-broad data the seeding
    histogram collect happens at SEED_RES_CAP (driver rows bounded at
    4^8 = 65k) and per-query seeding is O(log nh) rectangle sums, not a
    full-histogram argsort — results must still equal the exact brute
    plan because certification is untouched."""
    import numpy as np
    import pandas as pd
    from sis_spark.operators.knn import (SEED_RES_CAP, _cheb_count,
                                         _seed_sat, knn_join, knn_join_cells)

    assert SEED_RES_CAP == 8
    rng = np.random.default_rng(5)
    cand = pd.DataFrame({
        "cand_id": np.arange(4000, dtype=np.int64),
        "lon": rng.uniform(-179.9, 179.9, 4000),
        "lat": rng.uniform(-85.0, 85.0, 4000),
    })
    q = pd.DataFrame({
        "query_id": np.arange(40, dtype=np.int64),
        "qlon": rng.uniform(-179.9, 179.9, 40),
        "qlat": rng.uniform(-85.0, 85.0, 40),
    })
    cdf, qdf = spark.createDataFrame(cand), spark.createDataFrame(q)
    got = {(r["query_id"], r["rank"]): r["cand_id"]
           for r in knn_join_cells(cdf, qdf, 3, res=14).collect()}
    want = {(r["query_id"], r["rank"]): r["cand_id"]
            for r in knn_join(cdf, qdf, 3).select("query_id", "rank", "cand_id").collect()}
    assert got == want


def test_cheb_count_matches_naive():
    """The SAT rectangle-sum window (lat clamp, lon wrap) equals the naive
    per-cell Chebyshev count on a random grid."""
    import numpy as np
    from sis_spark.operators.knn import _cheb_count, _seed_sat

    rng = np.random.default_rng(9)
    nh = 16
    ix = rng.integers(0, nh, 60)
    iy = rng.integers(0, nh, 60)
    # accumulate duplicates like the histogram would
    grid = np.zeros((nh, nh), np.int64)
    np.add.at(grid, (iy, ix), 1)
    yy, xx = np.nonzero(grid)
    sat = _seed_sat(xx, yy, grid[yy, xx], nh)
    qx = rng.integers(0, nh, 25)
    qy = rng.integers(0, nh, 25)
    for r in (0, 1, 2, 5, 9, 20):
        rr = np.full(len(qx), r, np.int64)
        got = _cheb_count(sat, qx, qy, rr, nh)
        for i in range(len(qx)):
            dx = np.abs(np.arange(nh)[None, :] - qx[i])
            dx = np.minimum(dx, nh - dx)
            dy = np.abs(np.arange(nh)[:, None] - qy[i])
            cheb = np.maximum(dx, dy)
            naive = int(grid[(cheb <= r) & (np.abs(np.arange(nh)[:, None] - qy[i]) <= r)].sum())
            assert got[i] == naive, (i, r, got[i], naive)
