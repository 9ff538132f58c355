

def test_gps_jumps_planted_teleport(spark):
    from sis_spark.operators.trajectory import gps_jumps

    # steady 1 u/s track with one teleport (1e6 units in 1 s)
    rows = [(1, i + 1, i * 1_000_000, i, 0) for i in range(5)]
    rows.append((1, 6, 5 * 1_000_000, 1_000_004, 0))
    df = spark.createDataFrame(rows, "k long, o long, ts_us long, x long, y long")
    got = {r["o"]: r["jump"] for r in gps_jumps(df, v_per_s=10).collect()}
    assert got == {2: 0, 3: 0, 4: 0, 5: 0, 6: 1}


def test_gps_jumps_zero_dt(spark):
    from sis_spark.operators.trajectory import gps_jumps

    rows = [(1, 1, 0, 0, 0), (1, 2, 500_000, 300, 400)]  # dt < 1 s, moved
    df = spark.createDataFrame(rows, "k long, o long, ts_us long, x long, y long")
    (r,) = gps_jumps(df, v_per_s=1000).collect()
    assert (r["dt_s"], r["jump"]) == (0, 1)
