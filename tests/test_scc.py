"""SCC peeling: differential vs an iterative Tarjan and the SQL oracle."""

import numpy as np


def _scc_brute(edges):
    """Iterative Tarjan -> {node: min node of its SCC}."""
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        nodes.add(s)
        nodes.add(d)
    index = {}
    low = {}
    on = set()
    stack = []
    out = {}
    counter = [0]

    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def test_scc_matches_tarjan_random(spark):
    from sis_spark.operators.graph import scc

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n, m = 30, 70
        edges = sorted(
            {(int(a), int(b))
             for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
             if a != b}
        )
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: r.comp for r in scc(df).collect()}
        assert got == _scc_brute(edges)


def test_scc_cycle_chain_and_oracle(spark):
    import duckdb

    from sis_spark.operators.graph import scc, scc_sql

    # three 4-cycles chained by DAG edges, ids increasing downstream
    edges = []
    for c in range(3):
        base = c * 4
        for i in range(4):
            edges.append((base + i, base + (i + 1) % 4))
        if c < 2:
            edges.append((base + 1, base + 4))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.comp for r in scc(df).collect()}
    exp = {c * 4 + i: c * 4 for c in range(3) for i in range(4)}
    assert got == exp

    con = duckdb.connect()
    con.execute("CREATE TABLE raw(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", edges)
    oracle = dict(con.execute(scc_sql("SELECT src, dst FROM raw")).fetchall())
    assert oracle == exp
