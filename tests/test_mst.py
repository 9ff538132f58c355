"""Boruvka minimum spanning forest: differential vs Kruskal under the
same (w, u, v) total order, tie-breaks, forests, and single-linkage use."""

import numpy as np
from pyspark.sql import functions as F


def _kruskal(edges):
    """Unique MSF under the (w, u, v) total order on canonical edges."""
    best = {}
    for a, b, w in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (u, v), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def test_boruvka_matches_kruskal_random(spark):
    from sis_spark.operators.graph import boruvka_mst

    rng = np.random.default_rng(7)
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        n, m = 40, 160
        edges = [
            (int(a), int(b), int(w))
            for a, b, w in zip(
                rng.integers(0, n, m),
                rng.integers(0, n, m),
                rng.integers(1, 6, m),  # heavy ties on purpose
            )
        ]
        df = spark.createDataFrame(edges, ["a", "b", "w"])
        got = {(r.u, r.v, r.w) for r in boruvka_mst(df).collect()}
        assert got == _kruskal(edges)


def test_boruvka_forest_and_ties(spark):
    from sis_spark.operators.graph import boruvka_mst

    # two disconnected triangles, all weights equal: tie-break picks the
    # lexicographically smallest two edges of each triangle
    edges = [(0, 1, 5), (1, 2, 5), (0, 2, 5), (10, 11, 5), (11, 12, 5), (10, 12, 5)]
    df = spark.createDataFrame(edges, ["a", "b", "w"])
    got = {(r.u, r.v, r.w) for r in boruvka_mst(df).collect()}
    assert got == {(0, 1, 5), (0, 2, 5), (10, 11, 5), (10, 12, 5)}
    assert got == _kruskal(edges)


def test_boruvka_single_linkage_composition(spark):
    from sis_spark.operators.graph import boruvka_mst, connected_components

    # chain 0-1-2-3 with one heavy link: cutting the forest at w <= 10
    # yields the two single-linkage clusters {0,1}, {2,3}
    edges = [(0, 1, 1), (1, 2, 99), (2, 3, 2)]
    df = spark.createDataFrame(edges, ["a", "b", "w"])
    mst = boruvka_mst(df)
    cut = mst.filter(F.col("w") <= 10)
    comp = {
        r.node: r.comp
        for r in connected_components(cut, src="u", dst="v").collect()
    }
    assert comp == {0: 0, 1: 0, 2: 2, 3: 2}


def test_boruvka_sql_oracle_matches_engine(spark):
    import duckdb

    from sis_spark.operators.graph import boruvka_mst, boruvka_sql

    rng = np.random.default_rng(55)
    edges = [
        (int(a), int(b), int(w))
        for a, b, w in zip(
            rng.integers(0, 30, 90),
            rng.integers(0, 30, 90),
            rng.integers(1, 8, 90),
        )
    ]
    df = spark.createDataFrame(edges, ["a", "b", "w"])
    got = {(r.u, r.v, r.w) for r in boruvka_mst(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE raw(a BIGINT, b BIGINT, w BIGINT)")
    con.executemany("INSERT INTO raw VALUES (?, ?, ?)", edges)
    sql = boruvka_sql("SELECT a, b, w FROM raw", outer_rounds=6, cc_rounds=6)
    oracle = {tuple(r) for r in con.execute(sql).fetchall()}
    assert got == oracle == _kruskal(edges)
