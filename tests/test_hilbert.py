"""Hilbert curve ordering (functions/hilbert.py): bijection, the unit-step
locality property (which Morton lacks), and the distributed wrapper."""

import numpy as np
from pyspark.sql import functions as F

from sis_spark.functions.hilbert import hilbert_d_np, hilbert_index


def full_grid(order):
    n = 1 << order
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return xs.ravel(), ys.ravel()


def test_bijection_and_range():
    order = 4
    xs, ys = full_grid(order)
    d = hilbert_d_np(xs, ys, order)
    assert sorted(d.tolist()) == list(range((1 << order) ** 2))


def test_unit_step_property():
    # walking the curve in key order always moves to a 4-adjacent cell —
    # the locality property that makes it the layout sort key
    order = 5
    xs, ys = full_grid(order)
    d = hilbert_d_np(xs, ys, order)
    o = np.argsort(d)
    dx = np.abs(np.diff(xs[o]))
    dy = np.abs(np.diff(ys[o]))
    assert ((dx + dy) == 1).all()


def test_morton_lacks_unit_step():
    # sanity contrast: Z-order has diagonal jumps, Hilbert is the fix
    order = 4
    xs, ys = full_grid(order)

    def spread(v):
        v = v.astype(np.int64)
        out = np.zeros_like(v)
        for b in range(order):
            out |= ((v >> b) & 1) << (2 * b)
        return out

    z = spread(xs) | (spread(ys) << 1)
    o = np.argsort(z)
    step = np.abs(np.diff(xs[o])) + np.abs(np.diff(ys[o]))
    assert step.max() > 1


def test_distributed_matches_kernel(spark):
    order = 8
    rng = np.random.default_rng(3)
    n = 1 << order
    xs = rng.integers(0, n, 500)
    ys = rng.integers(0, n, 500)
    df = spark.createDataFrame(
        [(i, int(xs[i]), int(ys[i])) for i in range(500)],
        "id long, ix long, iy long",
    ).repartition(7)
    got = {
        r["id"]: r["hkey"]
        for r in hilbert_index(df, "ix", "iy", order, id_cols=["id"]).collect()
    }
    want = hilbert_d_np(xs, ys, order)
    assert got == {i: int(want[i]) for i in range(500)}
