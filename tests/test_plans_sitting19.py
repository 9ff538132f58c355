"""Plan-shape guards for the 19th-sitting join-bearing ops: the candidate
joins must stay equi-joins (no BroadcastNestedLoopJoin / CartesianProduct
in the hot path)."""

from pyspark.sql import functions as F


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ) if False else df._jdf.queryExecution().executedPlan().toString()


def _assert_no_nested_loop(df, allow_cartesian=False):
    p = _plan(df)
    assert "BroadcastNestedLoopJoin" not in p, p[:2000]
    if not allow_cartesian:
        assert "CartesianProduct" not in p, p[:2000]


def test_cidr_match_is_equi_join(spark):
    from sis_spark.operators.analytics import cidr_longest_match

    keys = spark.range(100).selectExpr("id AS event_id",
                                       "id * 7 AS ip")
    out = cidr_longest_match(
        keys.select("event_id", "ip"),
        [("a", 0, 4), ("b", 1 << 28, 8)],
    )
    _assert_no_nested_loop(out)


def test_rendezvous_and_ring_have_no_join(spark):
    from sis_spark.operators.analytics import hash_ring_assign, rendezvous_assign

    keys = spark.range(100).selectExpr("id AS key_id")
    _assert_no_nested_loop(rendezvous_assign(keys, [0, 1, 2]))
    # the ring explode is keys x tiny VALUES — a broadcast join is fine,
    # a nested loop over a non-tiny side is not; assert broadcast shape
    p = _plan(hash_ring_assign(keys, [0, 1, 2]))
    assert "CartesianProduct" not in p


def test_sliding_distinct_no_cartesian(spark):
    from sis_spark.operators.timeseries import sliding_distinct

    df = spark.range(50).selectExpr(
        "id % 5 AS user_id", "id AS event_id", "id % 3 AS val")
    _assert_no_nested_loop(sliding_distinct(df))


def test_textrank_pair_join_is_equi(spark):
    from sis_spark.operators.textops import textrank_chunks

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h a b c d"), (2, "x y z x y z x y z w v u")],
        "doc_id long, text string",
    )
    _assert_no_nested_loop(textrank_chunks(docs, iters=1))


def test_union_area_join_is_bounded(spark):
    from sis_spark.operators.boxes import union_area

    df = spark.createDataFrame(
        [(1, 0, 0, 4, 4), (1, 2, 2, 6, 6)],
        "image_id long, x1 long, y1 long, x2 long, y2 long",
    )
    _assert_no_nested_loop(union_area(df))
