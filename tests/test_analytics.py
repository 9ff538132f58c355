"""Product analytics: skyline vs brute dominance, funnel ordering edges,
retention bucket law."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.analytics import funnel, retention, skyline2d


def test_skyline_matches_brute(spark):
    rng = np.random.RandomState(13)
    pts = [(i, int(x), int(y)) for i, (x, y) in
           enumerate(rng.randint(0, 50, size=(300, 2)))]
    df = spark.createDataFrame(pts, "id long, x long, y long").repartition(7)
    got = sorted(r["id"] for r in skyline2d(df, "x", "y").collect())
    want = sorted(
        i for i, x, y in pts
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y) for _, qx, qy in pts
        )
    )
    assert got == want


def test_skyline_keeps_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 10, 10), (2, 10, 10), (3, 5, 5)], "id long, x long, y long"
    )
    got = sorted(r["id"] for r in skyline2d(df, "x", "y").collect())
    assert got == [1, 2]


def test_funnel_strictly_after(spark):
    rows = [
        # user 1 completes in order; user 2 has B BEFORE A (no conversion);
        # user 3 ties A and B at the same ts (strict > excludes the tie)
        (1, 0, 100), (1, 1, 200), (1, 2, 300),
        (2, 1, 50), (2, 0, 100), (2, 2, 200),
        (3, 0, 100), (3, 1, 100),
    ]
    df = spark.createDataFrame(rows, "user_id long, stage long, ts_us long")
    got = {r["user_id"]: (r["t0"], r["t1"], r["t2"])
           for r in funnel(df, "stage", (0, 1, 2)).collect()}
    assert got[1] == (100, 200, 300)
    assert got[2] == (100, None, 200) or got[2][1] is None  # B never after A
    assert got[3] == (100, None, None)


def test_retention_counts(spark):
    rows = [
        (1, 0), (1, 7), (1, 14),     # cohort wk0, active wk 0,1,2
        (2, 3), (2, 10),             # cohort wk0, active wk 0,1
        (3, 8), (3, 22),             # cohort wk1, active wk 1,3
    ]
    df = spark.createDataFrame(rows, "user_id long, day long")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention(df).collect()}
    assert got == {(0, 0): 2, (0, 1): 2, (0, 2): 1, (1, 0): 1, (1, 2): 1}


def test_robust_outliers_matches_python(spark):
    import numpy as np

    from sis_spark.operators.analytics import robust_outliers

    rng = np.random.RandomState(61)
    rows = []
    for g in ("a", "b"):
        base = rng.randint(100, 200, size=40).tolist()
        rows += [(g, int(v)) for v in base]
        rows += [(g, 10_000), (g, -5_000)]  # planted outliers
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in robust_outliers(df, "g", "x").collect()}
    for g in ("a", "b"):
        xs = sorted(x for gg, x in rows if gg == g)
        med = xs[(len(xs) - 1) // 2]
        dvs = sorted(abs(x - med) for x in xs)
        mad = dvs[(len(dvs) - 1) // 2]
        outs = [x for x in xs if 2 * abs(x - med) > 7 * mad]
        assert got[g]["med"] == med and got[g]["mad"] == mad
        assert got[g]["n_outliers"] == len(outs)
        assert got[g]["outlier_sum"] == sum(outs)
        assert got[g]["n_outliers"] >= 2  # the planted ones are caught


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    import numpy as np

    from sis_spark.operators.analytics import theil_sen

    rng = np.random.default_rng(8)
    rows, series = [], {}
    for k in range(4):
        ys = (7 * np.arange(15) + rng.integers(-30, 30, 15)).tolist()
        series[k] = ys
        rows += [(k, t, int(y)) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    got = {r.k: r for r in theil_sen(df, "k", "t", "y", cap=25).collect()}
    for k, ys in series.items():
        slopes = sorted(
            ((ys[j] - ys[i]) / (j - i), ys[j] - ys[i], j - i, i + 1)
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        q, dy, dx, _ = slopes[(len(slopes) - 1) // 2]
        r = got[k]
        assert (r.dy, r.dx) == (dy, dx)
        assert r.n_pairs == len(slopes)
        # a noisy slope-7 line: the robust estimate is near 7
        assert 5.0 < r.slope_q / 1e6 < 9.0
