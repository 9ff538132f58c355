"""Allen predicate truth table + CSV store round-trip."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sis_spark.operators.temporal import ALLEN


@pytest.fixture(scope="module")
def intervals(spark):
    # reference interval [10, 20); one row per named relation to it
    rows = [
        ("after", 25, 30), ("before", 1, 5), ("tequals", 10, 20),
        ("begins", 10, 15), ("begunBy", 10, 25), ("ends", 15, 20),
        ("endedBy", 5, 20), ("during", 12, 18), ("tcontains", 5, 25),
        ("meets", 5, 10), ("metBy", 20, 25), ("toverlaps", 5, 15),
        ("overlappedBy", 15, 25),
    ]
    return spark.createDataFrame(rows, "name string, b long, e long")


def test_allen_truth_table(intervals):
    b2, e2 = F.lit(10), F.lit(20)
    df = intervals
    for name, fn in ALLEN.items():
        if name == "anyInteracts":
            continue
        got = sorted(
            r["name"] for r in df.filter(fn(F.col("b"), F.col("e"), b2, e2)).collect()
        )
        assert got == [name], f"{name}: {got}"


def test_any_interacts(intervals):
    got = sorted(
        r["name"]
        for r in intervals.filter(
            ALLEN["anyInteracts"](F.col("b"), F.col("e"), F.lit(10), F.lit(20))
        ).collect()
    )
    # everything except the disjoint before/after interacts (meets/metBy
    # touch at a single instant and count)
    assert got == sorted(
        ["tequals", "begins", "begunBy", "ends", "endedBy", "during",
         "tcontains", "meets", "metBy", "toverlaps", "overlappedBy"]
    )


def test_csv_store_roundtrip(spark, sf_dir, tmp_path):
    from sis_spark.sources.csv_store import read_feature_csv, write_feature_csv

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    out = str(tmp_path / "events_csv")
    write_feature_csv(ev, out)
    back = read_feature_csv(spark, out)  # schema inferred from data
    assert dict(back.dtypes)["event_id"] == "int" or dict(back.dtypes)["event_id"] == "bigint"
    a = ev.orderBy("event_id").toPandas()
    b = back.orderBy("event_id").toPandas().astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def test_match_action_truth_table(spark):
    """MatchAction ANY/ALL/ONE incl. empty array (vacuous ALL), NULL array,
    and NaN elements (ComparisonFilter.java:421-431)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sis_spark.operators.query import multi_comparison

    df = spark.createDataFrame(
        pd.DataFrame({
            "id": [1, 2, 3, 4],
            "xs": [[1.0, 5.0], [5.0, 6.0], [], None],
        }),
        schema="id long, xs array<double>",
    ).unionByName(
        # a REAL NaN element (pandas conversion would turn it into NULL)
        spark.sql("SELECT CAST(5 AS LONG) AS id, array(CAST('NaN' AS DOUBLE), 5.0D) AS xs")
    )
    got = {
        r["id"]: (r["a"], r["l"], r["o"])
        for r in df.select(
            "id",
            multi_comparison(F.col("xs"), ">", F.lit(2.0), "ANY", nan_safe=True).alias("a"),
            multi_comparison(F.col("xs"), ">", F.lit(2.0), "ALL", nan_safe=True).alias("l"),
            multi_comparison(F.col("xs"), ">", F.lit(2.0), "ONE", nan_safe=True).alias("o"),
        ).collect()
    }
    assert got[1] == (True, False, True)    # one of two matches
    assert got[2] == (True, True, False)    # both match
    assert got[3] == (False, True, False)   # empty: vacuous ALL
    assert got[4] == (None, None, None)     # NULL array -> NULL (false in WHERE)
    # NaN element: comparison FALSE for that element (SIS NaN rule), so
    # ANY/ONE see only the 5.0 and ALL fails on the NaN
    assert got[5] == (True, False, True)
