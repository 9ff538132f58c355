"""connected_components / dedup_clusters vs a local union-find ground truth."""

import numpy as np
import pytest

from sis_spark.operators.graph import connected_components, dedup_clusters


def _union_find(n_edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    return {x: find(x) for x in list(parent)}


def _canonical(labels):
    # union-find roots are already component minima because union() parents
    # the larger root under the smaller one
    return dict(labels)


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 50, 200)])
def test_components_match_union_find(spark, seed, n, m):
    rng = np.random.RandomState(seed)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, n, size=(m, 2))]
    exp = _canonical(_union_find(pairs))
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == exp


def test_components_string_ids_and_long_chain(spark):
    # a 64-node chain: diameter 63, converges only via pointer jumping
    edges = [(f"d{i:03d}", f"d{i + 1:03d}") for i in range(63)]
    df = spark.createDataFrame(edges, "a string, b string")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert len(got) == 64
    assert set(got.values()) == {"d000"}


def test_dedup_clusters_keep_one(spark):
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (2, 3)], "a long, b long"
    )
    ids = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs, ids).collect()}
    assert len(rows) == 10
    assert [rows[i]["cluster"] for i in (1, 5, 9)] == [1, 1, 1]
    assert [rows[i]["cluster"] for i in (2, 3)] == [2, 2]
    for i in (0, 4, 6, 7, 8):
        assert rows[i]["cluster"] == i and rows[i]["keep"]
    assert sum(r["keep"] for r in rows.values()) == 7  # one survivor per cluster
    assert rows[1]["keep"] and not rows[5]["keep"] and not rows[9]["keep"]


def test_pagerank_exact_matches_python_model(spark):
    """pagerank_exact vs an independent integer model on a random graph,
    plus: dangling mass leaks (total <= scale), ranks non-negative."""
    import numpy as np
    from pyspark.sql import functions as F

    from sis_spark.operators.graph import pagerank_exact

    rng = np.random.RandomState(5)
    n, scale, iters = 40, 10**9, 4
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, n, size=(120, 2))}
    # node n-1 dangling: drop its out-edges
    pairs = {(a, b) for a, b in pairs if a != n - 1}
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    nodes = spark.range(n).select(F.col("id").alias("node"))
    got = {
        r["node"]: r["rank"]
        for r in pagerank_exact(edges, nodes, iters=iters, scale=scale).collect()
    }

    outdeg = {}
    for a, _ in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: scale // n for v in range(n)}
    base = (scale * 15) // (100 * n)
    for _ in range(iters):
        contrib = {v: 0 for v in range(n)}
        for a, b in pairs:
            contrib[b] += rank[a] // outdeg[a]
        rank = {v: base + (85 * contrib[v]) // 100 for v in range(n)}

    assert got == rank
    assert all(v >= 0 for v in got.values())
    assert sum(got.values()) <= scale


def test_triangle_count_matches_brute(spark):
    import itertools

    import numpy as np

    from sis_spark.operators.graph import triangle_count

    rng = np.random.RandomState(9)
    n = 25
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, n, size=(90, 2)) if a != b}
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}

    und = {frozenset(p) for p in pairs}
    want = {}
    for tri in itertools.combinations(range(n), 3):
        a, b, c = tri
        if {a, b} in und and {b, c} in und and {a, c} in und:
            for v in tri:
                want[v] = want.get(v, 0) + 1
    assert got == want


def test_k_core_matches_brute_peel(spark):
    import numpy as np

    from sis_spark.operators.graph import k_core

    rng = np.random.default_rng(5)
    n = 60
    raw = {(int(a), int(b)) for a, b in rng.integers(0, n, (150, 2)) if a != b}
    # plant a 3-core: a 6-clique on nodes 0..5
    for i in range(6):
        for j in range(i + 1, 6):
            raw.add((i, j))
    df = spark.createDataFrame(sorted(raw), ["a", "b"])
    got = {(r.node, r.deg) for r in k_core(df, k=3).collect()}

    adj = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < 3}
        if not drop:
            break
        alive -= drop
    exp = {(v, len(adj[v] & alive)) for v in alive}
    assert got == exp
    assert {v for v, _ in exp} >= set(range(6))  # the clique survived


def test_hits_exact_structure(spark):
    from sis_spark.operators.graph import hits_exact

    # star: node 0 links to 1..4 -> 0 is the hub, 1..4 are authorities
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(1, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    st = {r["node"]: r for r in hits_exact(edges, nodes, iters=2).collect()}
    assert st[0]["hub"] == 10**6          # max hub
    assert st[0]["auth"] == 0             # nobody links to 0
    assert st[2]["auth"] == 10**6         # two in-links: max authority
    assert st[3]["auth"] == st[4]["auth"] < st[2]["auth"]
    assert all(0 <= st[i]["hub"] <= 10**6 for i in st)


def test_hits_mass_normalized_each_round(spark):
    from sis_spark.operators.graph import hits_exact

    # ring: perfectly symmetric -> everyone maxes both scores
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    st = hits_exact(edges, nodes, iters=3).collect()
    assert all(r["hub"] == 10**6 and r["auth"] == 10**6 for r in st)


def test_assortativity_star_is_negative(spark):
    from sis_spark.operators.graph import degree_assortativity_moments

    # star graph: hub degree n, leaves degree 1 -> perfectly disassortative
    edges = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    (r,) = degree_assortativity_moments(edges).collect()
    m, sxy, sx, sx2 = r["m"], r["s_xy"], r["s_x"], r["s_x2"]
    num = m * sxy - sx * sx
    den = m * sx2 - sx * sx
    assert num / den == -1.0  # textbook star assortativity


def test_reciprocity_counts(spark):
    from sis_spark.operators.graph import reciprocity_counts

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 4), (4, 3), (5, 5), (1, 2)],
        "src long, dst long",
    )
    (r,) = reciprocity_counts(edges).collect()
    # distinct non-loop edges: (1,2),(2,1),(1,3),(3,4),(4,3) -> 4 reciprocated
    assert (r["m"], r["m_recip"]) == (5, 4)


def test_label_prop_two_cliques(spark):
    from sis_spark.operators.graph import label_prop

    # two triangles bridged by one weak edge: labels converge to the
    # min node id of each triangle; the bridge can't outvote a clique
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 12)], "node long"
    )
    out = {r["node"]: r["label"] for r in label_prop(e, nodes, 3).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12]
    assert out[10] != 1


def test_link_predict_square(spark):
    from sis_spark.operators.graph import link_predict

    # 4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) each share
    # TWO common neighbors and are unlinked; no other candidates
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = {(r["a"], r["b"]): r for r in link_predict(e).collect()}
    assert set(rows) == {(1, 3), (2, 4)}
    for r in rows.values():
        assert r["cn"] == 2 and r["deg_a"] == 2 and r["deg_b"] == 2


def test_random_projection_preserves_identity_and_varies(spark):
    import numpy as np

    from sis_spark.operators.embeddings import random_projection

    rng = np.random.default_rng(5)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 32)]) for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = random_projection(df, out_dims=8).collect()
    y = {}
    for r in out:
        y.setdefault(r["id"], {})[r["j"]] = r["y"]
    assert all(len(v) == 8 for v in y.values())
    # deterministic: second run identical
    out2 = random_projection(df, out_dims=8).collect()
    y2 = {}
    for r in out2:
        y2.setdefault(r["id"], {})[r["j"]] = r["y"]
    assert y == y2
    # distinct inputs map to distinct sketches (full rank w.h.p.)
    sketches = {tuple(v[j] for j in range(8)) for v in y.values()}
    assert len(sketches) == 20


def _rand_und_edges(seed, n_nodes=40, n_edges=120):
    import numpy as np

    rng = np.random.RandomState(seed)
    seen = set()
    while len(seen) < n_edges:
        a, b = rng.randint(0, n_nodes, 2)
        if a != b:
            seen.add((min(int(a), int(b)), max(int(a), int(b))))
    return sorted(seen)


def test_k_truss_matches_brute_peel(spark):
    from sis_spark.operators.graph import k_truss

    edges = _rand_und_edges(3)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(4)
    for k in (3, 4, 5):
        got = {(r["a"], r["b"]): r["support"]
               for r in k_truss(df, k=k).collect()}

        # brute peel
        cur = set(edges)

        def supports(es):
            adj = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            return {(a, b): len(adj[a] & adj[b]) for a, b in es}

        while True:
            sup = supports(cur)
            nxt = {e for e in cur if sup[e] >= k - 2}
            if nxt == cur:
                break
            cur = nxt
        want = supports(cur)
        assert got == want


def test_clustering_coeff_matches_brute(spark):
    from sis_spark.operators.graph import clustering_coeff

    edges = _rand_und_edges(4)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    got = {r["node"]: (r["triangles"], r["deg"])
           for r in clustering_coeff(df).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        tri = sum(len(adj[u] & nb) for u in nb) // 2
        assert got[v] == (tri, len(nb))
    assert set(got) == set(adj)


def test_adamic_adar_matches_brute(spark):
    import math

    from sis_spark.operators.graph import adamic_adar

    edges = _rand_und_edges(5, n_nodes=25, n_edges=60)
    df = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    got = {(r["a"], r["b"]): (r["cn"], r["aa_q"])
           for r in adamic_adar(df).collect()}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for ai in range(len(nodes)):
        for bi in range(ai + 1, len(nodes)):
            a, b = nodes[ai], nodes[bi]
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            aa = sum(
                int(math.floor(1e9 / math.log(len(adj[u])) + 0.12345678987))
                for u in common
            )
            want[(a, b)] = (len(common), aa)
    assert got == want


def test_longest_path_h_hand(spark):
    from sis_spark.operators.graph import longest_path_h

    # chain 0 -w=5-> 1 -w=3-> 2, plus shortcut 0 -w=7-> 2
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (0, 2, 7)], "a long, b long, w long"
    )
    out = {r["node"]: r["dist"] for r in longest_path_h(edges, hops=4).collect()}
    assert out == {0: 0, 1: 5, 2: 8}
    # hop bound binds: with hops=1 the 2-edge path is invisible
    out1 = {r["node"]: r["dist"] for r in longest_path_h(edges, hops=1).collect()}
    assert out1 == {0: 0, 1: 5, 2: 7}


def test_modularity_counts_matches_brute(spark):
    from sis_spark.operators.graph import modularity_counts

    rng = np.random.default_rng(7)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 30, (80, 2)) if p[0] != p[1]}
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in sorted(pairs)], "src long, dst long"
    )
    lab = {n: n % 4 for n in range(30)}
    labels = spark.createDataFrame(
        [(n, c) for n, c in lab.items()], "node long, c long"
    )
    got = {r["c"]: (r["n_nodes"], r["intra"], r["dsum"], r["m"])
           for r in modularity_counts(edges, labels).collect()}
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(pairs)
    want = {}
    for c in range(4):
        members = [n for n in lab if lab[n] == c]
        intra = sum(1 for a, b in pairs if lab[a] == c and lab[b] == c)
        want[c] = (len(members), intra, sum(deg.get(n, 0) for n in members), m)
    assert got == want
    # Newman Q from the moments is a sane modularity in [-0.5, 1]
    q = sum((4 * m * i - d * d) for _, i, d, _ in
            ((v[1], v[1], v[2], v[3]) for v in want.values()))
    assert -2 * m * m <= q <= 4 * m * m


def test_random_walks_matches_brute(spark):
    import hashlib

    from sis_spark.operators.graph import random_walks

    rng = np.random.default_rng(3)
    es = sorted({(int(a), int(b)) for a, b in rng.integers(0, 12, (40, 2))
                 if a != b})
    edges = spark.createDataFrame(es, "src long, dst long")
    starts = spark.createDataFrame(
        [(w, w % 12) for w in range(5)], "walk long, node long"
    )
    got = {(r["walk"], r["step"]): r["node"]
           for r in random_walks(edges, starts, steps=4).collect()}

    adj = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
    for a in adj:
        adj[a].sort()

    def u60(key):
        return int(hashlib.md5(f"{key}:rw".encode()).hexdigest()[:15], 16)

    want = {}
    for w in range(5):
        node = w % 12
        want[(w, 0)] = node
        for t in range(4):
            nbrs = adj.get(node)
            if not nbrs:
                break
            node = nbrs[u60(f"{w}:{t}:{node}") % len(nbrs)]
            want[(w, t + 1)] = node
    assert got == want
    # at least one walk actually advanced
    assert any(s > 0 for _, s in got)


def test_random_walks_dead_end_truncates(spark):
    from sis_spark.operators.graph import random_walks

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    starts = spark.createDataFrame([(9, 0)], "walk long, node long")
    got = sorted((r["step"], r["node"])
                 for r in random_walks(edges, starts, steps=5).collect())
    assert got == [(0, 0), (1, 1), (2, 2)]


def test_louvain_move_matches_brute(spark):
    from sis_spark.operators.graph import louvain_move

    rng = np.random.default_rng(13)
    pairs = sorted({(int(min(p)), int(max(p)))
                    for p in rng.integers(0, 25, (70, 2)) if p[0] != p[1]})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    lab = {n: n % 5 for n in range(25)}
    labels = spark.createDataFrame(list(lab.items()), "node long, c long")
    got = {r["node"]: r["c"] for r in louvain_move(edges, labels).collect()}

    m = len(pairs)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {n: len(v) for n, v in adj.items()}
    tot = {}
    for n, c in lab.items():
        tot[c] = tot.get(c, 0) + deg.get(n, 0)
    want = {}
    for u in lab:
        k = {}
        for v in adj.get(u, []):
            k[lab[v]] = k.get(lab[v], 0) + 1
        k.setdefault(lab[u], 0)
        best = None
        for c, kc in sorted(k.items()):
            d = deg.get(u, 0)
            score = 2 * m * kc - d * (tot[c] - (d if c == lab[u] else 0))
            if best is None or score > best[0]:
                best = (score, c)
        want[u] = best[1]
    assert got == want
    # a hash-random 5-way seed on a random graph must actually move nodes
    assert any(got[u] != lab[u] for u in lab)


def test_louvain_move_converged_is_stable(spark):
    from sis_spark.operators.graph import louvain_move

    # two disjoint triangles already in their own communities: no node moves
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(n, 0 if n < 3 else 1) for n in range(6)], "node long, c long"
    )
    got = {r["node"]: r["c"] for r in louvain_move(edges, labels).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_ppr_exact_matches_brute(spark):
    from sis_spark.operators.graph import ppr_exact

    rng = np.random.default_rng(19)
    es = sorted({(int(a), int(b)) for a, b in rng.integers(0, 15, (50, 2))
                 if a != b})
    edges = spark.createDataFrame(es, "src long, dst long")
    nodes = spark.createDataFrame([(n,) for n in range(15)], "node long")
    seeds = spark.createDataFrame([(0,), (7,)], "node long")
    S = 10**9
    got = {r["node"]: r["rank"]
           for r in ppr_exact(edges, nodes, seeds, iters=3,
                              scale=S).collect()}

    outdeg = {}
    for a, _ in es:
        outdeg[a] = outdeg.get(a, 0) + 1
    seed_set = {0, 7}
    rank = {n: (S // 2 if n in seed_set else 0) for n in range(15)}
    base = (S * 15) // (100 * 2)
    for _ in range(3):
        s = {n: 0 for n in range(15)}
        for a, b in es:
            s[b] += rank[a] // outdeg[a]
        rank = {n: (base if n in seed_set else 0) + (85 * s[n]) // 100
                for n in range(15)}
    assert got == rank
    # locality: total seed-side mass dominates a far-off node with no
    # in-path advantage only if reachable — just check seeds are hot
    assert rank[0] > 0 and got[0] == rank[0]
