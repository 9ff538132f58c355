"""Distributed covariance + PCA (operators/embeddings.py): numpy
differentials, partitioning invariance, projection fidelity."""

import numpy as np
import pandas as pd
import pytest

from sis_spark.operators.ann import quantize_np
from sis_spark.operators.embeddings import (
    embedding_covariance,
    fit_pca,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud so PCA has a meaningful axis ordering
    base = rng.randn(300, 8) * np.array([5, 3, 2, 1, 0.5, 0.3, 0.2, 0.1])
    mix = rng.randn(8, 8)
    vecs = (base @ mix * 0.01).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": list(vecs)})
    return spark.createDataFrame(pdf), vecs


def test_covariance_matches_numpy(emb):
    df, vecs = emb
    got = {(r["i"], r["j"]): r for r in embedding_covariance(df).collect()}
    q = quantize_np(vecs)
    n = len(q)
    s = q.sum(axis=0)
    p = q.T.astype(object) @ q.astype(object)  # exact big-int reference
    for (i, j), r in got.items():
        assert r["n"] == n
        assert r["si"] == s[i] and r["sj"] == s[j]
        assert r["sp"] == int(p[i, j])
        want = (float(p[i, j]) - float(s[i]) * float(s[j]) / n) / n
        assert r["cov"] == pytest.approx(want, rel=1e-12)
    assert len(got) == 8 * 9 // 2


def test_covariance_partition_invariant(emb):
    df, _ = emb
    a = sorted(map(tuple, embedding_covariance(df).collect()))
    b = sorted(map(tuple, embedding_covariance(df.repartition(13)).collect()))
    assert a == b  # integer sums are order-independent; doubles shared-expr


def test_pca_matches_numpy_reference(emb):
    df, vecs = emb
    comps, evals, mean = fit_pca(df, k=3)
    x = vecs.astype(np.float64)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    # eigenvalues match the float-exact reference to quantization error
    assert np.allclose(evals, w[order], rtol=1e-4, atol=1e-12)
    # components span the same subspace (compare |cosine| to 1 per axis)
    for k in range(3):
        cos = abs(float(comps[k] @ v[:, order[k]]))
        assert cos > 0.9999
    # projection: distributed result == numpy projection of the same rows
    proj = {r["vec_id"]: np.array(r["proj"]) for r in pca_project(df, comps, mean).collect()}
    ref = (x - mean) @ comps.T
    for i in range(0, 300, 37):
        assert np.allclose(proj[i], ref[i], atol=1e-9)
    # variance along component 0 >= component 1 >= component 2
    pm = np.stack([proj[i] for i in range(300)])
    var = pm.var(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_prefix_norms_energy_monotone(spark):
    import numpy as np

    from sis_spark.operators.embeddings import prefix_norms

    rng = np.random.RandomState(6)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["id"]: r for r in prefix_norms(df, [4, 8, 16]).collect()}
    for i, vec in rows:
        q = np.floor(np.array(vec) * 1e4 + 0.12345678987).astype(np.int64)
        r = got[i]
        assert r["ss_4"] == int((q[:4] ** 2).sum())
        assert r["ss_8"] == int((q[:8] ** 2).sum())
        assert r["ss_16"] == int((q ** 2).sum())
        assert r["ss_4"] <= r["ss_8"] <= r["ss_16"]


def test_class_separation_planted(spark):
    import numpy as np

    from sis_spark.operators.embeddings import class_separation

    rng = np.random.RandomState(4)
    rows = []
    for i in range(60):
        lb = i % 3
        base = np.zeros(8)
        base[lb] = 5.0  # well-separated one-hot-ish classes
        rows.append((i, [float(x) for x in base + rng.randn(8) * 0.01], lb))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")
    got = {(r["a"], r["b"]): r for r in class_separation(df).collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    for r in got.values():
        assert r["na"] == 20 and r["nb"] == 20
        # centroids ~5e4 q-units apart on two dims -> d2 ~ 2*(5e4)^2 = 5e9
        assert 4.5e9 < r["d2_q"] < 5.5e9


def test_vec_topk_dims_planted(spark):
    from sis_spark.operators.embeddings import vec_topk_dims

    vec = [0.1, -9.0, 0.2, 7.0, 0.0, -0.3]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    got = [(r["rank"], r["pos"]) for r in
           vec_topk_dims(df, k=3).orderBy("rank").collect()]
    assert got == [(1, 1), (2, 3), (3, 5)]


def test_pca_power_aligns_with_numpy_eigvec(spark):
    import numpy as np

    from sis_spark.operators.embeddings import pca_power

    rng = np.random.default_rng(2)
    # strongly anisotropic cloud: dominant direction along dim 0 + 0.5*dim1
    base = rng.normal(0, 1, (300, 1))
    noise = rng.normal(0, 0.05, (300, 8))
    X = noise.copy()
    X[:, 0] += base[:, 0]
    X[:, 1] += 0.5 * base[:, 0]
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    out = sorted(pca_power(df, iters=6).collect(), key=lambda r: r["i"])
    v = np.array([r["v"] for r in out], dtype=np.float64)
    v /= np.linalg.norm(v)
    C = np.cov(X.T)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    assert abs(abs(float(v @ top)) - 1.0) < 0.02  # aligned up to sign
    # determinism: rerun bit-identical
    out2 = sorted(pca_power(df, iters=6).collect(), key=lambda r: r["i"])
    assert [r["v"] for r in out] == [r["v"] for r in out2]


def test_pq_recon_error_properties(spark):
    import numpy as np

    from sis_spark.operators.ann import QUANT, pq_recon_error, train_pq

    rng = np.random.default_rng(4)
    vecs = [(i, [float(x) for x in rng.normal(0, 0.3, 16)])
            for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r["id"]: r["err"] for r in
           pq_recon_error(df, m=4, ksub=8).collect()}
    assert len(out) == 40 and all(e >= 0 for e in out.values())
    # independent numpy replay: same training, same argmin-error
    books = train_pq(df, m=4, ksub=8)
    for i, v in vecs[:10]:
        v32 = np.asarray(v, dtype=np.float32).astype(np.float64)
        q = np.floor(v32 * QUANT).astype(np.int64)
        S = q.reshape(4, 4)
        err = 0
        for s in range(4):
            d = ((S[s][None, :] - books[s]) ** 2).sum(axis=1)
            err += int(d.min())
        assert out[i] == err
    # ksub >= n: every vector is its own codeword after the mean step
    # only when each cluster is a singleton; at least errors shrink
    out_big = {r["id"]: r["err"] for r in
               pq_recon_error(df, m=4, ksub=40).collect()}
    assert sum(out_big.values()) <= sum(out.values())


def test_hard_negative_topk_excludes_same_label(spark):
    import numpy as np

    from sis_spark.operators.ann import hard_negative_topk

    rng = np.random.default_rng(7)
    n, d = 60, 8
    vecs = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(int)
    rows = [(i, [float(x) for x in vecs[i]], int(labels[i]))
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long")
    k = 4
    out = hard_negative_topk(df, [0, 1, 2], k).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    q = np.floor(vecs * 1e7).astype(np.int64)
    for qid, rws in by_q.items():
        assert len(rws) == k
        assert [r["rank"] for r in sorted(rws, key=lambda r: r["rank"])] \
            == list(range(1, k + 1))
        # brute replay with the label filter
        qn = float((q[qid].astype(np.float64) ** 2).sum())
        scores = []
        for c in range(n):
            if c == qid or labels[c] == labels[qid]:
                continue
            cn = float((q[c].astype(np.float64) ** 2).sum())
            dot = int((q[c] * q[qid]).sum())
            scores.append((-(dot / np.sqrt(cn * qn)), c))
        scores.sort()
        want = [c for _s, c in scores[:k]]
        got = [r["cand_id"] for r in sorted(rws, key=lambda r: r["rank"])]
        assert got == want
        assert all(labels[c] != labels[qid] for c in got)


def test_mmr_select_diversifies(spark):
    import numpy as np

    from sis_spark.operators.ann import mmr_select

    # pool engineered: two tight clusters near the query + one outlier;
    # plain top-k would take all of cluster A, MMR must interleave
    rng = np.random.default_rng(3)
    d = 8
    qv = np.zeros(d); qv[0] = 1.0
    rows = [(0, [float(x) for x in qv])]
    vid = 1
    a_dir = np.zeros(d); a_dir[0] = 1.0; a_dir[1] = 0.05
    b_dir = np.zeros(d); b_dir[0] = 0.9; b_dir[2] = 0.6
    for i in range(5):   # cluster A: nearly identical, highest rel
        v = a_dir + rng.normal(scale=1e-3, size=d)
        rows.append((vid, [float(x) for x in v])); vid += 1
    for i in range(5):   # cluster B: a bit less relevant, different dir
        v = b_dir + rng.normal(scale=1e-3, size=d)
        rows.append((vid, [float(x) for x in v])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_select(df, [0], k=4, pool=10, lam_num=3).collect()
    sel = [r["cand_id"] for r in sorted(out, key=lambda r: r["pos"])]
    assert len(sel) == 4 and sel[0] in range(1, 6)  # first = max rel (A)
    # diversification: B members appear before A is exhausted
    first_b = min(i for i, c in enumerate(sel) if c >= 6)
    assert first_b <= 1, sel
    # greedy replay for exactness
    q = {r[0]: np.floor(np.array(r[1]) * 1e7).astype(np.int64)
         for r in rows}
    rel = {c: int((q[c] * q[0]).sum()) for c in q if c != 0}
    pool = sorted(rel, key=lambda c: (-rel[c], c))[:10]
    chosen = [min(pool, key=lambda c: (-rel[c], c))]
    remaining = [c for c in pool if c != chosen[0]]
    while remaining and len(chosen) < 4:
        def score(c):
            ms = max(int((q[c] * q[s]).sum()) for s in chosen)
            return 3 * rel[c] - 7 * ms
        best = min(remaining, key=lambda c: (-score(c), c))
        chosen.append(best)
        remaining.remove(best)
    assert sel == chosen


def test_semdedup_matches_brute(spark):
    import numpy as np

    from sis_spark.operators.embeddings import kmeans_assign, semdedup

    rng = np.random.default_rng(21)
    # 4 well-separated blobs with planted near-dups inside each
    rows = []
    vid = 0
    for c in range(4):
        center = rng.normal(0, 1, 8) + c * 10
        for i in range(10):
            v = center + rng.normal(0, 0.05, 8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semdedup(df, k=4, threshold=0.999, iters=2).collect()}

    # brute: same cluster assignment, then all within-cluster pairs
    assign = {r["vec_id"]: r["cluster"]
              for r in kmeans_assign(df, 4, 2).collect()}
    qv = {i: np.floor(np.array(v, np.float64).astype(np.float32)
                      .astype(np.float64) * 1e7).astype(np.int64)
          for i, v in rows}
    dropped = set()
    ids = sorted(qv)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if assign[a] != assign[b]:
                continue
            va, vb = qv[a], qv[b]
            qcos = float(va @ vb) / np.sqrt(float(va @ va) * float(vb @ vb))
            if qcos >= 0.999:
                dropped.add(b)
    want = {i: (assign[i], i not in dropped) for i in ids}
    assert got == want
    # tight blobs at cosine ~1: most of each blob must be deduped away
    assert sum(1 for _, k in got.values() if k) <= 12
