"""Seam-carving DP (imageops.seam_cost): distributed vs brute."""

def test_seam_cost_brute(spark):
    import numpy as np

    from sis_spark.operators.imageops import seam_cost
    from sis_spark.raster import codec

    rng = np.random.default_rng(21)
    rows = []
    want = {}
    for i in range(6):
        h, w = int(rng.integers(4, 12)), int(rng.integers(4, 12))
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        e = arr.astype(np.int64).sum(axis=2)
        # brute DP
        m = e[0].astype(np.int64).copy()
        for y in range(1, h):
            nm = np.empty(w, np.int64)
            for x in range(w):
                best = m[x]
                if x > 0:
                    best = min(best, m[x - 1])
                if x < w - 1:
                    best = min(best, m[x + 1])
                nm[x] = e[y, x] + best
            m = nm
        iid = f"t-{i}"
        want[iid] = (int(m.min()), int(np.argmin(m)))
        rows.append((iid, codec.encode(arr, "raw"), "raw"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r["image_id"]: (r["cost"], r["x_end"])
           for r in seam_cost(df).collect()}
    assert got == want
