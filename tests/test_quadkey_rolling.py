"""Quadkey codec, rolling exact median, token entropy."""

import math

import numpy as np
from pyspark.sql import functions as F

from sis_spark.functions.transforms import quadkey_col, quadkey_to_tile


def test_quadkey_roundtrip_and_prefix_property(spark):
    rng = np.random.default_rng(4)
    z = 8
    rows = [
        (int(t), int(rng.integers(0, 1 << z)), int(rng.integers(0, 1 << z)))
        for t in range(50)
    ]
    df = spark.createDataFrame(rows, ["i", "tx", "ty"])
    got = {
        r.i: r.qk
        for r in df.select(
            "i", quadkey_col(F.col("tx"), F.col("ty"), z).alias("qk")
        ).collect()
    }
    for i, tx, ty in rows:
        qk = got[i]
        assert len(qk) == z and set(qk) <= set("0123")
        assert quadkey_to_tile(qk) == (tx, ty, z)
        # parent tile = prefix: the hierarchical-aggregation property
        ptx, pty, pz = quadkey_to_tile(qk[:-1])
        assert (ptx, pty, pz) == (tx >> 1, ty >> 1, z - 1)


def test_rolling_median_matches_numpy(spark):
    from sis_spark.operators.timeseries import rolling_median

    rng = np.random.default_rng(6)
    rows, series = [], {}
    for k in range(4):
        xs = rng.integers(-100, 100, size=20).tolist()
        series[k] = xs
        rows += [(k, t, int(v)) for t, v in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r.k, r.o): (r.n_win, r.med)
        for r in rolling_median(df, "k", "t", "x", width=5).collect()
    }
    for k, xs in series.items():
        for t in range(len(xs)):
            win = sorted(xs[max(0, t - 4): t + 1])
            assert got[(k, t)] == (len(win), win[(len(win) - 1) // 2])


def test_token_entropy_reference(spark):
    from sis_spark.operators.textops import token_entropy

    docs = [
        (0, "a a a a"),            # zero entropy
        (1, "a b c d"),            # uniform: ln(4)
        (2, "a a b"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    assert got[0].entropy_q == 0  # single term: floor(0 + offset) = 0
    assert abs(got[1].entropy_q / 1e6 - math.log(4)) < 1e-4
    h2 = (2 / 3) * math.log(3 / 2) + (1 / 3) * math.log(3)
    assert abs(got[2].entropy_q / 1e6 - h2) < 1e-4
    assert (got[1].dl, got[1].n_terms) == (4, 4)
