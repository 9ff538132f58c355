

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
