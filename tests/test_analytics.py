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
