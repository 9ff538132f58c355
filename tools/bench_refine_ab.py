"""A/B refine-throughput bench for the r4 vectorized pair kernels.

Collects the REAL candidate pair sets (post cell-join + envelope prune) of
the four general-geometry join gates at a given SF, then times the old
per-pair scalar loop against the new batched kernel on identical arrays,
single-threaded — i.e. per-core refine throughput, the quantity the r3
verdict asked to improve >= 3x.

    python tools/bench_refine_ab.py [sf_dir] [max_pairs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from sis_spark.session import get_spark  # noqa: E402
from sis_spark import queries as Q  # noqa: E402


def collect_pairs(df, a_col, b_col, cap):
    rows = df.limit(cap).collect()
    return ([bytes(r[a_col]) for r in rows], [bytes(r[b_col]) for r in rows])


def timeit(fn, reps=3):
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = get_spark(cores=8)

    from sis_spark.operators import spatial_join as SJ
    from sis_spark.functions import relate, overlay, sqlmm
    from sis_spark.functions import geometry as geo
    from sis_spark.sources import polygons_from_wkb

    out = {}

    # ---- polygon pairs: candidates as built inside polygon_pair_join
    polys = Q._supplier_polygons_df(spark, sf_dir)
    parts = SJ.polygon_parts_df(polys, "key", "wkb").localCheckpoint()
    res = SJ._choose_res_dist(parts)
    cov = SJ.polygon_cells_df(parts, res, classify=False).select("cell", "pkey")
    pairs = (
        cov.groupBy("cell").agg(F.collect_set("pkey").alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids) - i - 1), "
            "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))")).alias("p"))
        .select("p.a", "p.b").distinct()
    )
    pa = parts.select(F.col("key").alias("a"), F.col("wkb").alias("wkb_a"),
                      F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
                      F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"))
    pb = parts.select(F.col("key").alias("b"), F.col("wkb").alias("wkb_b"),
                      F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
                      F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"))
    cand = (pairs.join(pa, "a").join(pb, "b")
            .filter((F.col("axmin") <= F.col("bxmax")) & (F.col("bxmin") <= F.col("axmax"))
                    & (F.col("aymin") <= F.col("bymax")) & (F.col("bymin") <= F.col("aymax"))))
    A, B = collect_pairs(cand, "wkb_a", "wkb_b", cap)

    def pp_scalar():
        for a, b in zip(A, B):
            relate.relate_polygons_wkb(a, b)

    def pp_batch():
        relate.relate_polygons_pred_batch(A, B)

    ts, tb = timeit(pp_scalar), timeit(pp_batch)
    out["polygon_pairs"] = dict(pairs=len(A), scalar_s=round(ts, 3),
                                batch_s=round(tb, 3), speedup=round(ts / tb, 1))

    # ---- line-polygon predicates + clip: the shared candidate set
    lines = Q._gate_lines_df(spark, sf_dir)
    lp_cand = SJ._line_poly_candidates(lines, polys, 3)
    L, P = collect_pairs(lp_cand, "wkb_l", "wkb_p", cap)

    def lp_scalar():
        for l, p in zip(L, P):
            relate.relate_line_polygon_wkb(l, p)

    def lp_batch():
        relate.line_polygon_relate_batch(L, P)

    ts, tb = timeit(lp_scalar), timeit(lp_batch)
    out["line_predicates"] = dict(pairs=len(L), scalar_s=round(ts, 3),
                                  batch_s=round(tb, 3), speedup=round(ts / tb, 1))

    def lc_scalar():
        for l, p in zip(L, P):
            _typ, (lvx, lvy) = geo.wkb_parse(l)
            (poly,) = polygons_from_wkb([(0, p)])
            rings = [(poly["vx"], poly["vy"])] + list(poly.get("holes", []))
            overlay.clip_line_polygon(lvx, lvy, rings)

    def lc_batch():
        overlay.clip_qlen_batch(L, P)

    ts, tb = timeit(lc_scalar), timeit(lc_batch)
    out["line_clip"] = dict(pairs=len(L), scalar_s=round(ts, 3),
                            batch_s=round(tb, 3), speedup=round(ts / tb, 1))

    # ---- geometry distance join candidates (lines x polygons, radius 8)
    gl = lines.filter(F.col("key") % 3 == 0)
    gp = polys.filter(F.col("key") % 5 == 0)
    r = Q.GEOM_DIST_JOIN_RADIUS
    rp = r + 1e-6
    aparts = SJ.geometry_parts_df(gl).localCheckpoint()
    bparts = SJ.geometry_parts_df(gp).localCheckpoint()
    gres = SJ._radius_res(bparts, r)
    aexp = aparts.select("key", "wkb",
                         (F.col("xmin") - rp).alias("xmin"), (F.col("ymin") - rp).alias("ymin"),
                         (F.col("xmax") + rp).alias("xmax"), (F.col("ymax") + rp).alias("ymax"))
    acov = SJ.polygon_cells_df(aexp, gres, classify=False).select("cell", F.col("pkey").alias("akey"))
    bcov = SJ.polygon_cells_df(bparts, gres, classify=False).select("cell", F.col("pkey").alias("bkey"))
    gpairs = acov.join(bcov, "cell").select("akey", "bkey").distinct()
    aa = aparts.select(F.col("key").alias("akey"), F.col("wkb").alias("wkb_a"),
                       F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
                       F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"))
    bb = bparts.select(F.col("key").alias("bkey"), F.col("wkb").alias("wkb_b"),
                       F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
                       F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"))
    gcand = (gpairs.join(aa, "akey").join(bb, "bkey")
             .filter((F.col("axmin") - rp <= F.col("bxmax")) & (F.col("bxmin") <= F.col("axmax") + rp)
                     & (F.col("aymin") - rp <= F.col("bymax")) & (F.col("bymin") <= F.col("aymax") + rp)))
    GA, GB = collect_pairs(gcand, "wkb_a", "wkb_b", cap)

    def gd_scalar():
        for a, b in zip(GA, GB):
            sqlmm.geom_distance(geo.wkb_parse(a), geo.wkb_parse(b))

    def gd_batch():
        sqlmm.geom_distance_batch(GA, GB)

    ts, tb = timeit(gd_scalar), timeit(gd_batch)
    out["geom_distance"] = dict(pairs=len(GA), scalar_s=round(ts, 3),
                                batch_s=round(tb, 3), speedup=round(ts / tb, 1))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
