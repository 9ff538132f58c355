

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


def test_convex_hull_vertices_shapes(spark):
    from sis_spark.operators.trajectory import convex_hull_vertices

    rows = []
    # key 1: unit square + center + edge midpoint + duplicate corner
    sq = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5), (5, 0), (0, 0)]
    rows += [(1, x, y) for x, y in sq]
    # key 2: all collinear -> only the two extremes
    rows += [(2, i, 2 * i) for i in range(6)]
    # key 3: single point
    rows += [(3, 7, 9)]
    # key 4: two points
    rows += [(4, 1, 1), (4, 2, 5)]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    out = {}
    for r in convex_hull_vertices(df).collect():
        out.setdefault(r["k"], set()).add((r["x"], r["y"]))
    assert out[1] == {(0, 0), (10, 0), (10, 10), (0, 10)}
    assert out[2] == {(0, 0), (5, 10)}
    assert out[3] == {(7, 9)}
    assert out[4] == {(1, 1), (2, 5)}


def test_convex_hull_vertices_random_vs_brute(spark):
    import itertools

    import numpy as np

    from sis_spark.operators.trajectory import convex_hull_vertices

    rng = np.random.default_rng(13)
    pts = [(int(a), int(b)) for a, b in rng.integers(-8, 9, (40, 2))]
    df = spark.createDataFrame([(1, x, y) for x, y in pts],
                               "k long, x long, y long")
    got = {(r["x"], r["y"]) for r in convex_hull_vertices(df).collect()}

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    uniq = sorted(set(pts))
    want = set()
    for q in uniq:
        others = [p for p in uniq if p != q]
        covered = False
        for a, b in itertools.combinations(others, 2):
            if (cross(a, b, q) == 0
                    and min(a[0], b[0]) <= q[0] <= max(a[0], b[0])
                    and min(a[1], b[1]) <= q[1] <= max(a[1], b[1])):
                covered = True
                break
        if not covered:
            for a, b, c in itertools.combinations(others, 3):
                if cross(a, b, c) == 0:
                    continue
                d1, d2, d3 = cross(a, b, q), cross(b, c, q), cross(c, a, q)
                neg = d1 < 0 or d2 < 0 or d3 < 0
                pos = d1 > 0 or d2 > 0 or d3 > 0
                if not (neg and pos):
                    covered = True
                    break
        if not covered:
            want.add(q)
    assert got == want


def test_sinuosity_hand_cases(spark):
    from sis_spark.operators.trajectory import sinuosity

    q = 1_000_000_000
    pts = [
        # key 1: straight line -> path == chord (sinuosity 1)
        (1, 1, 0, 0), (1, 2, 3, 4), (1, 3, 6, 8),
        # key 2: L-shape 3 right + 4 up -> path 7, chord 5
        (2, 1, 0, 0), (2, 2, 3, 0), (2, 3, 3, 4),
        # key 3: single point -> zero everything
        (3, 1, 5, 5),
    ]
    df = spark.createDataFrame(pts, "k long, o long, x long, y long")
    out = {r["k"]: r for r in sinuosity(df).collect()}
    assert out[1]["n_seg"] == 2 and out[1]["path_q"] == out[1]["chord_q"] == 10 * q
    assert out[2]["path_q"] == 7 * q and out[2]["chord_q"] == 5 * q
    assert out[3]["n_seg"] == 0 and out[3]["path_q"] == 0 and out[3]["chord_q"] == 0


def test_self_intersections_hand(spark):
    from sis_spark.operators.trajectory import self_intersections

    pts = [
        # key 1: classic bowtie / figure-X: (0,0)->(10,10)->(10,0)->(0,10)
        # segments 1 and 3 cross properly once
        (1, 1, 0, 0), (1, 2, 10, 10), (1, 3, 10, 0), (1, 4, 0, 10),
        # key 2: simple staircase, no crossing
        (2, 1, 0, 0), (2, 2, 5, 0), (2, 3, 5, 5), (2, 4, 10, 5),
        # key 3: touching at an endpoint (T-shape) is NOT a proper crossing
        (3, 1, 0, 0), (3, 2, 10, 0), (3, 3, 5, 5), (3, 4, 5, 0),
    ]
    df = spark.createDataFrame(pts, "k long, o long, x long, y long")
    out = {r["k"]: r for r in self_intersections(df).collect()}
    assert out[1]["n_crossings"] == 1 and out[1]["n_seg"] == 3
    assert out[2]["n_crossings"] == 0
    assert out[3]["n_crossings"] == 0  # segment 3 ENDS on segment 1


def _dp_recursive_brute(xs, ys, eps2):
    """Textbook recursive DP (line deviation, smallest-index argmax)."""
    n = len(xs)
    kept = set()

    def rec(a, b):
        kept.add(a)
        kept.add(b)
        if b - a < 2:
            return
        dx, dy = xs[b] - xs[a], ys[b] - ys[a]
        len2 = dx * dx + dy * dy
        best_i, best_m = -1, -1
        for i in range(a + 1, b):
            if len2 > 0:
                cr = (xs[i] - xs[a]) * dy - (ys[i] - ys[a]) * dx
                mm = cr * cr
            else:
                mm = (xs[i] - xs[a]) ** 2 + (ys[i] - ys[a]) ** 2
            if mm > best_m:
                best_m, best_i = mm, i
        if (best_m > eps2 * len2) if len2 > 0 else (best_m > eps2):
            rec(a, best_i)
            rec(best_i, b)

    rec(0, n - 1)
    return sorted(kept)


def test_douglas_peucker_matches_recursive_brute(spark):
    import numpy as np

    from sis_spark.operators.trajectory import douglas_peucker

    rng = np.random.RandomState(11)
    rows = []
    tracks = {}
    for k in range(6):
        n = int(rng.randint(2, 40))
        xs = list(np.cumsum(rng.randint(-50, 51, n)).astype(int))
        ys = list(np.cumsum(rng.randint(-50, 51, n)).astype(int))
        tracks[k] = (xs, ys)
        rows += [(k, o, int(xs[o]), int(ys[o])) for o in range(n)]
    # degenerate track: coincident endpoints (closed loop)
    tracks[6] = ([0, 10, 20, 0], [0, 40, -5, 0])
    rows += [(6, o, x, y) for o, (x, y) in
             enumerate(zip(*tracks[6]))]
    df = spark.createDataFrame(rows, "k long, o long, x long, y long")
    for eps in (5, 30, 120):
        got = {}
        for r in douglas_peucker(df, eps=eps).collect():
            got.setdefault(r["k"], []).append(r["o"])
        for k, (xs, ys) in tracks.items():
            want = _dp_recursive_brute(xs, ys, eps * eps)
            assert sorted(got[k]) == want, (k, eps)
        # endpoints always kept
        for k in got:
            assert 0 in got[k] and len(tracks[k][0]) - 1 in got[k]


def test_geofence_transitions_brute(spark):
    from sis_spark.operators.trajectory import geofence_transitions

    flags = {
        1: [0, 1, 1, 0, 1, 0],   # enter@1 exit@3 enter@4 exit@5
        2: [1, 1, 1],            # no transitions (starts inside)
        3: [0, 0],               # never enters
        4: [1, 0, 1],            # exit@1 enter@2
    }
    rows = [(k, o, v) for k, vs in flags.items() for o, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k long, o long, ins long").repartition(3)
    got = [(r["k"], r["o"], r["event"], r["visit"])
           for r in geofence_transitions(df, "ins").orderBy("k", "o").collect()]
    assert got == [
        (1, 1, 1, 1), (1, 3, 0, 1), (1, 4, 1, 2), (1, 5, 0, 2),
        (4, 1, 0, 0), (4, 2, 1, 1),
    ]


def test_psi_matches_float_formula(spark):
    import math

    import numpy as np

    from sis_spark.operators.analytics import population_stability

    rng = np.random.RandomState(12)
    rows = [(int(b), int(e)) for b, e in
            zip(rng.randint(0, 6, 800), rng.randint(0, 2, 800))]
    # bucket 7 exists only in epoch 0 -> psi_q must be NULL
    rows += [(7, 0)] * 5
    df = spark.createDataFrame(rows, "bucket long, ep long").repartition(4)
    out = {r["bucket"]: r for r in
           population_stability(df, "bucket", "ep").collect()}
    na = sum(1 for _, e in rows if e == 0)
    nb = sum(1 for _, e in rows if e == 1)
    for bkt, r in out.items():
        nai = sum(1 for b, e in rows if b == bkt and e == 0)
        nbi = sum(1 for b, e in rows if b == bkt and e == 1)
        assert (r["na_i"], r["nb_i"]) == (nai, nbi)
        if nai and nbi:
            want = math.floor(
                (nai / na - nbi / nb) * math.log(nai * nb / (nbi * na))
                * 1e9 + 0.12345678987
            )
            assert r["psi_q"] == want
        else:
            assert r["psi_q"] is None
    assert out[7]["psi_q"] is None


def test_co_travelers_hand(spark):
    from sis_spark.operators.trajectory import co_travelers

    n = 8
    cw, ch = 360.0 / n, 180.0 / n

    def pt(u, t, cx, cy):
        return (u, t, -180.0 + (cx + 0.5) * cw, -90.0 + (cy + 0.5) * ch)

    rows = [
        # users 1 & 2 meet in cell (0,0) bins 0 and 1 -> 2 meetings
        pt(1, 5, 0, 0), pt(2, 9, 0, 0),
        pt(1, 15, 0, 0), pt(2, 12, 0, 0),
        # duplicate pings inside one bucket count once
        pt(1, 6, 0, 0), pt(2, 7, 0, 0),
        # users 1 & 3 meet once only -> below min_meetings
        pt(3, 5, 0, 0),
        # user 4 same bins, different cell -> never pairs
        pt(4, 5, 3, 3), pt(4, 15, 3, 3),
    ]
    df = spark.createDataFrame(rows, "u long, t long, lon double, lat double")
    out = {(r["u1"], r["u2"]): r["meetings"]
           for r in co_travelers(df, n, time_bin=10, min_meetings=2,
                                 user_col="u").collect()}
    assert out == {(1, 2): 2}


def test_link_tracks_differential(spark):
    """Cell-ring mutual-NN linking == brute-force mutual-NN on random
    detections, and the plan contains no cartesian/BNL join."""
    import numpy as np

    from sis_spark.operators.trajectory import link_tracks

    rng = np.random.default_rng(7)
    n, frames, r = 400, 5, 120
    f = rng.integers(0, frames, n)
    x = rng.integers(0, 1000, n)
    y = rng.integers(0, 1000, n)
    rows = [(int(f[i]), i, int(x[i]), int(y[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "frame long, id long, qx long, qy long")
    out = link_tracks(df, r_q=r)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r_["frame"], r_["a_id"], r_["b_id"]): r_["d2"] for r_ in out.collect()}

    # brute mutual-NN
    exp = {}
    for fr in range(frames - 1):
        ai = [i for i in range(n) if f[i] == fr]
        bi = [i for i in range(n) if f[i] == fr + 1]
        cand = [
            (int((x[a] - x[b]) ** 2 + (y[a] - y[b]) ** 2), a, b)
            for a in ai for b in bi
            if (x[a] - x[b]) ** 2 + (y[a] - y[b]) ** 2 <= r * r
        ]
        best_a = {}
        best_b = {}
        for d2, a, b in cand:
            if a not in best_a or (d2, b) < best_a[a]:
                best_a[a] = (d2, b)
            if b not in best_b or (d2, a) < best_b[b]:
                best_b[b] = (d2, a)
        for a, (d2, b) in best_a.items():
            if best_b.get(b) == (d2, a):
                exp[(fr, a, b)] = d2
    assert got == exp
    assert exp  # non-degenerate
