"""Stay-point detection (trajectory.stay_points): python-replica differential
on random tracks, duration filtering, anchor-reset semantics."""

import datetime

import numpy as np
from pyspark.sql import functions as F

from sis_spark.operators.trajectory import stay_points


def _replica(rows, d, min_s):
    """Sequential reference: rows = [(uid, eid, ts_us, lon, lat)]."""
    out = []
    by_u = {}
    for r in rows:
        by_u.setdefault(r[0], []).append(r)
    for uid, rs in by_u.items():
        rs = sorted(rs, key=lambda r: (r[2], r[1]))
        a = 0
        groups = {}
        for k, r in enumerate(rs):
            dlon = r[3] - rs[a][3]
            dlat = r[4] - rs[a][4]
            if dlon * dlon + dlat * dlat > d * d:
                a = k
            groups.setdefault(a, []).append(r)
        for g, pts in groups.items():
            t0 = min(p[2] for p in pts)
            t1 = max(p[2] for p in pts)
            if t1 - t0 < min_s * 1_000_000:
                continue
            n = len(pts)
            qlon = sum(int(np.floor(p[3] * 1e7)) for p in pts)
            qlat = sum(int(np.floor(p[4] * 1e7)) for p in pts)
            out.append((uid, g + 1, n, t0, t1, qlon // n, qlat // n))
    return sorted(out)


def test_matches_python_replica(spark):
    rng = np.random.default_rng(11)
    rows = []
    base = 1_700_000_000_000_000
    for uid in range(20):
        t = base
        lon, lat = rng.uniform(-170, 170), rng.uniform(-80, 80)
        for eid in range(60):
            t += int(rng.integers(60, 3600)) * 1_000_000
            if rng.random() < 0.3:  # jump to a new place
                lon, lat = rng.uniform(-170, 170), rng.uniform(-80, 80)
            rows.append(
                (uid, uid * 1000 + eid, t,
                 lon + float(rng.normal(0, 0.1)),
                 lat + float(rng.normal(0, 0.1)))
            )
    df = spark.createDataFrame(
        [(u, e, datetime.datetime.utcfromtimestamp(t / 1e6), lo, la)
         for u, e, t, lo, la in rows],
        "user_id long, event_id long, ts timestamp, lon double, lat double",
    ).repartition(5)
    got = sorted(
        (r["user_id"], r["anchor_rn"], r["n_pts"], r["t0_us"], r["t1_us"],
         r["qlon"], r["qlat"])
        for r in stay_points(df, 1.0, 1800).collect()
    )
    assert got == _replica(rows, 1.0, 1800)
    assert len(got) > 10  # non-degenerate scenario


def test_duration_filter_and_single_points(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 0: 3 points within radius spanning 2h -> one stay
        (0, 1, base, 0.0, 0.0),
        (0, 2, base + datetime.timedelta(hours=1), 0.1, 0.1),
        (0, 3, base + datetime.timedelta(hours=2), 0.05, -0.05),
        # user 1: two far-apart points -> two singleton groups, 0 duration
        (1, 4, base, 0.0, 0.0),
        (1, 5, base + datetime.timedelta(hours=5), 50.0, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
    )
    got = stay_points(df, 1.0, 3600).collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 0 and r["n_pts"] == 3 and r["anchor_rn"] == 1


def test_frechet_join_matches_dense(spark):
    import numpy as np

    from sis_spark.operators.trajectory import (
        _frechet2_diag,
        frechet2_dense,
        frechet_join,
    )

    rng = np.random.default_rng(13)
    rows, tracks = [], {}
    for k in range(8):
        n = int(rng.integers(1, 12))
        tracks[k] = [
            (int(rng.integers(-100, 100)), int(rng.integers(-100, 100)))
            for _ in range(n)
        ]
        rows += [(k, o, x, y) for o, (x, y) in enumerate(tracks[k])]
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7), (1, 6)]
    pts = spark.createDataFrame(rows, ["path", "seq", "x", "y"])
    pr = spark.createDataFrame(pairs, ["a", "b"])
    got = {(r.a, r.b): (r.na, r.nb, r.frech2)
           for r in frechet_join(pts, pr).collect()}
    for a, b in pairs:
        ax, ay = zip(*tracks[a])
        bx, by = zip(*tracks[b])
        exp = frechet2_dense(list(ax), list(ay), list(bx), list(by))
        assert _frechet2_diag(ax, ay, bx, by) == exp
        assert got[(a, b)] == (len(ax), len(bx), exp)


def test_frechet_identity_and_symmetry_properties(spark):
    from sis_spark.operators.trajectory import frechet2_dense

    ax, ay = [0, 10, 20], [0, 5, 0]
    # identical tracks -> max over the matched walk of 0 = 0
    assert frechet2_dense(ax, ay, ax, ay) == 0
    # symmetric
    bx, by = [1, 9, 25], [2, 4, 1]
    assert frechet2_dense(ax, ay, bx, by) == frechet2_dense(bx, by, ax, ay)
    # dominated by the farthest forced match: single-point track
    assert frechet2_dense([0], [0], bx, by) == max(x * x + y * y for x, y in zip(bx, by))


def test_dtw_and_hausdorff_match_brute(spark):
    import numpy as np

    from sis_spark.operators.trajectory import (
        _dtw2_diag,
        dtw2_dense,
        dtw_join,
        hausdorff_join,
    )

    rng = np.random.default_rng(21)
    rows, tracks = [], {}
    for k in range(6):
        n = int(rng.integers(1, 10))
        tracks[k] = [
            (int(rng.integers(-80, 80)), int(rng.integers(-80, 80)))
            for _ in range(n)
        ]
        rows += [(k, o, x, y) for o, (x, y) in enumerate(tracks[k])]
    pairs = [(0, 1), (2, 3), (4, 5)]
    pts = spark.createDataFrame(rows, ["path", "seq", "x", "y"])
    pr = spark.createDataFrame(pairs, ["a", "b"])

    got_dtw = {(r.a, r.b): r.dtw2 for r in dtw_join(pts, pr).collect()}
    got_h = {
        (r.a, r.b): (r.h_ab, r.h_ba, r.haus2)
        for r in hausdorff_join(pts, pr).collect()
    }
    for a, b in pairs:
        ax, ay = zip(*tracks[a])
        bx, by = zip(*tracks[b])
        exp = dtw2_dense(list(ax), list(ay), list(bx), list(by))
        assert _dtw2_diag(ax, ay, bx, by) == exp
        assert got_dtw[(a, b)] == exp
        d2 = lambda p, q: (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2
        h_ab = max(min(d2(p, q) for q in tracks[b]) for p in tracks[a])
        h_ba = max(min(d2(p, q) for q in tracks[a]) for p in tracks[b])
        assert got_h[(a, b)] == (h_ab, h_ba, max(h_ab, h_ba))
