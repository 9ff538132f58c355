"""HMM map-matching (trajectory.viterbi_forward / viterbi_path):
differential vs brute-force enumeration of every candidate sequence, and
the forward-DP/decode consistency law min(dp_last) == best total cost."""

import itertools

import numpy as np
import pytest

from sis_spark.operators.trajectory import viterbi_forward, viterbi_path

LAM = 100


def _rand_cands(rng, n_users=3, n_pts=6, max_c=3):
    """Random candidate rows (user, rn, rank, seg_key, emit); variable
    candidate counts per point."""
    rows = []
    for u in range(n_users):
        for rn in range(1, n_pts + 1):
            nc = int(rng.randint(1, max_c + 1))
            keys = rng.choice(20, size=nc, replace=False)
            for rank in range(nc):
                rows.append(
                    (u, rn, rank, int(keys[rank]), int(rng.randint(0, 500)))
                )
    return rows


def _brute_best(rows, user):
    """Minimum total cost over ALL candidate sequences for one user."""
    by_rn = {}
    for u, rn, rank, key, emit in rows:
        if u == user:
            by_rn.setdefault(rn, []).append((key, emit))
    rns = sorted(by_rn)
    best = None
    for combo in itertools.product(*[by_rn[rn] for rn in rns]):
        cost = sum(e for _, e in combo)
        for (k0, _), (k1, _) in zip(combo, combo[1:]):
            if k0 != k1:
                cost += LAM
        if best is None or cost < best:
            best = cost
    return best


@pytest.fixture(scope="module")
def cand_rows():
    rng = np.random.RandomState(17)
    return _rand_cands(rng)


def test_viterbi_path_matches_brute(spark, cand_rows):
    df = spark.createDataFrame(
        cand_rows, "user_id long, rn long, rank long, seg_key long, emit long"
    )
    out = viterbi_path(df, lam=LAM).collect()
    for u in {r[0] for r in cand_rows}:
        total = {r["total_cost"] for r in out if r["user_id"] == u}
        assert total == {_brute_best(cand_rows, u)}
        # the decoded path's own cost must equal total_cost
        path = sorted(
            (r["rn"], r["seg_key"], r["emit"])
            for r in out
            if r["user_id"] == u
        )
        cost = sum(e for _, _, e in path) + LAM * sum(
            1 for (_, k0, _), (_, k1, _) in zip(path, path[1:]) if k0 != k1
        )
        assert cost == _brute_best(cand_rows, u)


def test_viterbi_forward_last_min_is_best(spark, cand_rows):
    df = spark.createDataFrame(
        cand_rows, "user_id long, rn long, rank long, seg_key long, emit long"
    )
    dp = viterbi_forward(df, lam=LAM).collect()
    for u in {r[0] for r in cand_rows}:
        last_rn = max(r["rn"] for r in dp if r["user_id"] == u)
        last_min = min(
            r["dp"] for r in dp if r["user_id"] == u and r["rn"] == last_rn
        )
        assert last_min == _brute_best(cand_rows, u)


def test_viterbi_one_point_track(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, 5, 42), (1, 1, 1, 7, 13)],
        "user_id long, rn long, rank long, seg_key long, emit long",
    )
    out = viterbi_path(df, lam=LAM).collect()
    assert len(out) == 1
    assert out[0]["seg_key"] == 7 and out[0]["total_cost"] == 13
