"""STR spatial partitioning balance/coherence + integer ACF vs numpy."""

import numpy as np

from sis_spark.operators.partitioning import str_partition
from sis_spark.operators.timeseries import acf_int


def test_str_partition_balanced_and_coherent(spark):
    rng = np.random.default_rng(3)
    n = 1000
    # heavy skew: 80% of points in one tiny hotspot
    hot = rng.random((int(n * 0.8), 2)) * 0.01
    cold = rng.random((n - len(hot), 2)) * 100
    pts = np.vstack([hot, cold])
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = str_partition(df, "x", "y", nx=5, ny=4, id_col="id").collect()

    sizes = {}
    for r in out:
        sizes[r.part_id] = sizes.get(r.part_id, 0) + 1
        assert r.part_id == r.slice_x * 4 + r.slice_y
    assert len(sizes) == 20
    assert max(sizes.values()) - min(sizes.values()) <= 1  # balanced under skew

    # spatial coherence: x-slices are contiguous intervals of the x-order
    by_slice = {}
    for r in out:
        by_slice.setdefault(r.slice_x, []).append(r.x)
    edges = sorted((max(v), s) for s, v in by_slice.items())
    assert [s for _, s in edges] == sorted(by_slice)  # slice order == x order


def test_acf_int_matches_numpy_rational(spark):
    rng = np.random.default_rng(9)
    rows = []
    series = {}
    for key in range(5):
        xs = rng.integers(-50, 200, size=rng.integers(10, 40)).tolist()
        series[key] = xs
        rows += [(key, t, int(v)) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r.k, r.lag): (r.m, r.num_scaled, r.den_scaled)
        for r in acf_int(df, "k", "t", "x", lags=(1, 2, 3)).collect()
    }
    for key, xs in series.items():
        x = np.asarray(xs, dtype=np.int64)
        n, s, q = len(x), int(x.sum()), int((x * x).sum())
        den = n * n * q - n * s * s
        for k in (1, 2, 3):
            a, b = x[: n - k], x[k:]
            num = (
                n * n * int((a * b).sum())
                - n * s * (int(a.sum()) + int(b.sum()))
                + (n - k) * s * s
            )
            assert got[(key, k)] == (n - k, num, den)
            # cross-check vs float centered autocovariance
            mu = x.mean()
            ref = float(((a - mu) * (b - mu)).sum())
            assert abs(num / n**2 - ref) < 1e-6 * max(1.0, abs(ref))


def test_adaptive_cells_invariants(spark):
    import numpy as np

    from sis_spark.operators.partitioning import adaptive_cells

    rng = np.random.RandomState(17)
    # skewed: hot cluster near (10, 10) + uniform background
    lons = np.concatenate([rng.normal(10, 0.5, 600), rng.uniform(-170, 170, 200)])
    lats = np.concatenate([rng.normal(10, 0.5, 600), rng.uniform(-80, 80, 200)])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lons, lats)], "lon double, lat double"
    ).repartition(7)
    d_min, d_max, cap = 2, 6, 100
    cells = adaptive_cells(df, d_min, d_max, cap).collect()
    # disjoint cover: project every point through every emitted cell depth
    def cell_of(lon, lat, d):
        n = 1 << d
        ix = min(max(int(np.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        iy = min(max(int(np.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
        return ix, iy
    emitted = {(r["d"], r["ix"], r["iy"]): r["cnt"] for r in cells}
    covered = 0
    for lon, lat in zip(lons, lats):
        hits = [d for (d, ix, iy) in emitted
                if cell_of(lon, lat, d) == (ix, iy)]
        assert len(hits) == 1  # exactly one emitted cell per point
        covered += 1
    assert covered == len(lons)
    assert sum(emitted.values()) == len(lons)
    # depth adaptivity: the hot cluster forces deep cells, background stays coarse
    assert any(d == d_max for (d, _, _) in emitted)
    assert any(d == d_min for (d, _, _) in emitted)
    for (d, ix, iy), c in emitted.items():
        if d < d_max:
            assert c <= cap
