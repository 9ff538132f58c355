

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
