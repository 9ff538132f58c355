"""Bounding-box label operators for detection-annotated image corpora.

A vision training pipeline at 10^12-image scale carries detection labels
(per-image box lists) next to the pixels; the two workhorse operations over
them are (a) IoU joins between predicted and ground-truth boxes (evaluation,
pseudo-label matching) and (b) per-image greedy non-maximum suppression
(label dedup before training).  The reference has no detection machinery —
the envelope-intersection semantics mirror its Envelope2D intersect logic
(`endorsed/src/org.apache.sis.referencing/main/org/apache/sis/geometry/
Envelope2D.java` intersect/area contract) lifted to integer pixel space.

Exactness model: boxes are integer half-open pixel rectangles
[x1,x2) x [y1,y2); intersection and union areas are exact int64 products and
IoU thresholds are rationals compared by cross-multiplication, so the Spark
plan and the DuckDB oracle agree bit-for-bit (synth.py playbook rule 4).

Scale shape:

- ``iou_join`` is ONE equi-join on image_id followed by codegen integer
  arithmetic — per-image box counts are bounded (O(100)), so the per-key
  fan-out is bounded and the shuffle is the unavoidable one.
- ``nms`` is applyInPandas per image: embarrassingly parallel, state bounded
  by the per-image box count, no driver participation.  The greedy order is
  (score DESC, box_id ASC) — fully deterministic, no RNG.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BOX_COLS = ("box_id", "x1", "y1", "x2", "y2", "score")
NMS_SCHEMA = (
    "image_id long, box_id long, x1 long, y1 long, x2 long, y2 long, "
    "score long"
)


def _inter_cols(p: str, g: str):
    """Integer intersection area of half-open boxes with column prefixes."""
    ix = F.greatest(
        F.lit(0),
        F.least(F.col(f"{p}x2"), F.col(f"{g}x2"))
        - F.greatest(F.col(f"{p}x1"), F.col(f"{g}x1")),
    )
    iy = F.greatest(
        F.lit(0),
        F.least(F.col(f"{p}y2"), F.col(f"{g}y2"))
        - F.greatest(F.col(f"{p}y1"), F.col(f"{g}y1")),
    )
    return ix * iy


def _area_cols(p: str):
    return (F.col(f"{p}x2") - F.col(f"{p}x1")) * (
        F.col(f"{p}y2") - F.col(f"{p}y1")
    )


def iou_join(
    pred: DataFrame,
    gt: DataFrame,
    iou_num: int = 1,
    iou_den: int = 4,
    image_col: str = "image_id",
) -> DataFrame:
    """Pairs (pred, gt) on the same image with IoU >= iou_num/iou_den.

    Inputs carry (image_col, box_id, x1, y1, x2, y2); output rows are
    (image_id, pred_id, gt_id, inter, uni) with exact int64 areas.  The
    comparison ``iou_den * inter >= iou_num * uni`` never divides.
    """
    p = pred.select(
        F.col(image_col).alias("image_id"),
        F.col("box_id").alias("pred_id"),
        *[F.col(c).alias(f"p{c}") for c in ("x1", "y1", "x2", "y2")],
    )
    g = gt.select(
        F.col(image_col).alias("image_id"),
        F.col("box_id").alias("gt_id"),
        *[F.col(c).alias(f"g{c}") for c in ("x1", "y1", "x2", "y2")],
    )
    inter = _inter_cols("p", "g")
    uni = _area_cols("p") + _area_cols("g") - inter
    return (
        p.join(g, "image_id")
        .withColumn("inter", inter)
        .withColumn("uni", uni)
        .filter(
            F.lit(int(iou_den)) * F.col("inter")
            >= F.lit(int(iou_num)) * F.col("uni")
        )
        .select("image_id", "pred_id", "gt_id", "inter", "uni")
    )


def nms(
    boxes: DataFrame,
    iou_num: int = 1,
    iou_den: int = 2,
    image_col: str = "image_id",
) -> DataFrame:
    """Greedy per-image non-maximum suppression.

    Boxes are visited in (score DESC, box_id ASC) order; a box is kept iff
    its IoU with every already-kept box is <= iou_num/iou_den (suppression
    is the STRICT inequality ``iou_den * inter > iou_num * uni``).  Exact
    integer arithmetic end to end; the DuckDB oracle (``nms_sql``) replays
    the same sequential rule as a lockstep recursive CTE.
    """
    num, den = int(iou_num), int(iou_den)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score", "box_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        arr = pdf[["x1", "y1", "x2", "y2"]].to_numpy(np.int64)
        area = (arr[:, 2] - arr[:, 0]) * (arr[:, 3] - arr[:, 1])
        kept: list[int] = []
        for i in range(len(pdf)):
            if kept:
                k = arr[kept]
                ix = np.maximum(
                    0,
                    np.minimum(k[:, 2], arr[i, 2])
                    - np.maximum(k[:, 0], arr[i, 0]),
                )
                iy = np.maximum(
                    0,
                    np.minimum(k[:, 3], arr[i, 3])
                    - np.maximum(k[:, 1], arr[i, 1]),
                )
                inter = ix * iy
                uni = area[kept] + area[i] - inter
                if np.any(den * inter > num * uni):
                    continue
            kept.append(i)
        out = pdf.iloc[kept]
        return out[[image_col, *BOX_COLS]]

    return (
        boxes.select(image_col, *BOX_COLS)
        .groupBy(image_col)
        .applyInPandas(fn, schema=NMS_SCHEMA)
    )


def nms_dense(rows: list[tuple], iou_num: int = 1, iou_den: int = 2):
    """Single-node reference NMS for differential tests.

    ``rows`` are (box_id, x1, y1, x2, y2, score) tuples of one image;
    returns the kept box_ids in greedy order.
    """
    order = sorted(rows, key=lambda r: (-r[5], r[0]))
    kept: list[tuple] = []
    for b in order:
        ok = True
        for k in kept:
            ix = max(0, min(k[3], b[3]) - max(k[1], b[1]))
            iy = max(0, min(k[4], b[4]) - max(k[2], b[2]))
            inter = ix * iy
            uni = (
                (k[3] - k[1]) * (k[4] - k[2])
                + (b[3] - b[1]) * (b[4] - b[2])
                - inter
            )
            if iou_den * inter > iou_num * uni:
                ok = False
                break
        if ok:
            kept.append(b)
    return [b[0] for b in kept]


def _iou_terms_sql(k: str, b: str) -> tuple[str, str]:
    """(inter, uni) SQL expressions between struct ref ``k`` and row ``b``."""
    ix = f"greatest(0, least({k}.x2, {b}.x2) - greatest({k}.x1, {b}.x1))"
    iy = f"greatest(0, least({k}.y2, {b}.y2) - greatest({k}.y1, {b}.y1))"
    inter = f"({ix} * {iy})"
    uni = (
        f"(({k}.x2 - {k}.x1) * ({k}.y2 - {k}.y1)"
        f" + ({b}.x2 - {b}.x1) * ({b}.y2 - {b}.y1) - {inter})"
    )
    return inter, uni


def nms_sql(
    base_select: str,
    iou_num: int = 1,
    iou_den: int = 2,
) -> str:
    """DuckDB oracle for ``nms``: lockstep recursive CTE, one rank per
    round per image, kept boxes carried as a LIST of structs; suppression
    is evaluated with a list lambda over the kept prefix — the exact greedy
    recurrence, not an approximation.

    ``base_select`` must yield (image_id, box_id, x1, y1, x2, y2, score).
    """
    inter, uni = _iou_terms_sql("k", "b")
    struct_t = (
        "STRUCT(box_id BIGINT, x1 BIGINT, y1 BIGINT, x2 BIGINT, y2 BIGINT,"
        " score BIGINT)[]"
    )
    pack = (
        "{'box_id': b.box_id, 'x1': b.x1, 'y1': b.y1, 'x2': b.x2,"
        " 'y2': b.y2, 'score': b.score}"
    )
    return f"""
WITH RECURSIVE base AS ({base_select}),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY image_id
                            ORDER BY score DESC, box_id) AS rnk,
         count(*) OVER (PARTITION BY image_id) AS cnt
  FROM base),
st(image_id, r, cnt, kept) AS (
  SELECT image_id, 0, cnt, CAST([] AS {struct_t})
  FROM (SELECT DISTINCT image_id, cnt FROM rk)
  UNION ALL
  SELECT st.image_id, st.r + 1, st.cnt,
         CASE WHEN len(list_filter(st.kept,
                  k -> {iou_den} * {inter} > {iou_num} * {uni})) > 0
              THEN st.kept
              ELSE list_append(st.kept, {pack}) END
  FROM st JOIN rk b
    ON b.image_id = st.image_id AND b.rnk = st.r + 1),
fin AS (SELECT image_id, kept FROM st WHERE r = cnt),
u AS (SELECT image_id, unnest(kept) AS k FROM fin)
SELECT image_id, k.box_id AS box_id, k.x1 AS x1, k.y1 AS y1,
       k.x2 AS x2, k.y2 AS y2, k.score AS score
FROM u"""


def letterbox_boxes(
    boxes: DataFrame,
    dims: DataFrame,
    target_w: int,
    target_h: int,
    image_col: str = "image_id",
) -> DataFrame:
    """Remap box coordinates under aspect-preserving letterbox resize to
    (target_w, target_h) -> (image_id, box_id, sw, sh, pad_x, pad_y,
    nx1, ny1, nx2, ny2).

    ``dims`` carries (image_col, w, h).  The scale is the RATIONAL
    min(W/w, H/h) — chosen by the integer cross-comparison W*h <= H*w —
    and every mapped coordinate is one integer multiply + floor-div + pad,
    clamped to the canvas, so the remap replicates bit-for-bit in SQL.
    This is the label-side twin of imageops.resize_to_bucket: when pixels
    get letterboxed for training, the boxes must follow the same arithmetic
    or the labels silently drift."""
    W, H = int(target_w), int(target_h)
    d = dims.select(image_col, "w", "h")
    j = boxes.join(d, image_col)
    wide = F.col("w") * H >= F.col("h") * W  # width-limited iff W/w <= H/h
    num = F.when(wide, F.lit(W)).otherwise(F.lit(H))
    den = F.when(wide, F.col("w")).otherwise(F.col("h"))
    # integer floor-div: use expr DIV to stay in long arithmetic
    j = (
        j.withColumn("_num", num)
        .withColumn("_den", den)
        .withColumn("sw", F.expr("w * _num div _den"))
        .withColumn("sh", F.expr("h * _num div _den"))
        .withColumn("pad_x", F.expr(f"({W} - sw) div 2"))
        .withColumn("pad_y", F.expr(f"({H} - sh) div 2"))
    )

    def m(c: str, pad: str, lim: int):
        return F.greatest(
            F.lit(0),
            F.least(
                F.lit(lim), F.expr(f"{c} * _num div _den + {pad}")
            ),
        )

    return j.select(
        image_col,
        "box_id",
        "sw",
        "sh",
        "pad_x",
        "pad_y",
        m("x1", "pad_x", W).alias("nx1"),
        m("y1", "pad_y", H).alias("ny1"),
        m("x2", "pad_x", W).alias("nx2"),
        m("y2", "pad_y", H).alias("ny2"),
    )


def letterbox_boxes_sql(
    boxes_select: str,
    dims_select: str,
    target_w: int,
    target_h: int,
) -> str:
    """DuckDB replay of ``letterbox_boxes`` (// is floor division; all
    quantities non-negative, so it matches Spark's div)."""
    W, H = int(target_w), int(target_h)
    return f"""
WITH bx AS ({boxes_select}),
dm AS ({dims_select}),
j AS (
  SELECT bx.*, dm.w, dm.h,
         CASE WHEN dm.w * {H} >= dm.h * {W} THEN {W} ELSE {H} END AS num,
         CASE WHEN dm.w * {H} >= dm.h * {W} THEN dm.w ELSE dm.h END AS den
  FROM bx JOIN dm ON dm.image_id = bx.image_id),
s AS (
  SELECT *, w * num // den AS sw, h * num // den AS sh,
         ({W} - w * num // den) // 2 AS pad_x,
         ({H} - h * num // den) // 2 AS pad_y
  FROM j)
SELECT image_id, box_id, sw, sh, pad_x, pad_y,
       greatest(0, least({W}, x1 * num // den + pad_x)) AS nx1,
       greatest(0, least({H}, y1 * num // den + pad_y)) AS ny1,
       greatest(0, least({W}, x2 * num // den + pad_x)) AS nx2,
       greatest(0, least({H}, y2 * num // den + pad_y)) AS ny2
FROM s"""


def union_area(boxes: DataFrame, key_col: str = "image_id") -> DataFrame:
    """Area of the union of axis-aligned integer boxes per key — the
    classic slab-decomposition sweep as pure window codegen.

    Slabs are the intervals between consecutive distinct x-coordinates of
    the key's boxes; a slab's covered y-length is the 1-D interval-union
    sweep ``sum(max(0, y2 - max(y1, running max of prior y2)))`` over
    boxes spanning the slab, ordered by (y1, y2); area = sum of
    covered * slab width.  Exact int64 throughout.

    Scale shape: one distinct + lead() for slabs, one range-style join
    (slab inside box x-extent) keyed on the group, one window + two
    aggregations.  Per-key box counts bound the join fan-out; at
    planetary scale the key IS the partition (images, tiles, ...)."""
    b = boxes.select(
        F.col(key_col).alias("k"),
        F.col("x1").cast("long"), F.col("y1").cast("long"),
        F.col("x2").cast("long"), F.col("y2").cast("long"),
    ).filter((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
    xs = (
        b.select("k", F.col("x1").alias("x"))
        .unionByName(b.select("k", F.col("x2").alias("x")))
        .distinct()
    )
    wl = Window.partitionBy("k").orderBy("x")
    slabs = xs.withColumn("hi", F.lead("x").over(wl)).filter(
        F.col("hi").isNotNull()
    ).select("k", F.col("x").alias("lo"), "hi")
    j = slabs.join(b, "k").filter(
        (F.col("x1") <= F.col("lo")) & (F.col("x2") >= F.col("hi"))
    )
    ws = (
        Window.partitionBy("k", "lo")
        .orderBy("y1", "y2")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = j.withColumn(
        "cov",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("y2") - F.greatest(
                F.col("y1"), F.coalesce(F.max("y2").over(ws), F.col("y1"))
            ),
        ),
    )
    per_slab = seg.groupBy("k", "lo", "hi").agg(F.sum("cov").alias("cov"))
    return (
        per_slab.groupBy(F.col("k").alias(key_col))
        .agg(F.sum((F.col("hi") - F.col("lo")) * F.col("cov")).alias("area"))
    )


def union_area_sql(base_select: str, key_col: str = "image_id") -> str:
    """DuckDB twin of ``union_area`` (same slabs + sweep windows)."""
    return f"""
WITH b AS (
  SELECT {key_col} AS k, CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1,
         CAST(x2 AS BIGINT) AS x2, CAST(y2 AS BIGINT) AS y2
  FROM ({base_select}) s WHERE x1 < x2 AND y1 < y2),
xs AS (
  SELECT DISTINCT k, x FROM (
    SELECT k, x1 AS x FROM b UNION ALL SELECT k, x2 FROM b) u),
slabs AS (
  SELECT k, x AS lo, lead(x) OVER (PARTITION BY k ORDER BY x) AS hi FROM xs),
j AS (
  SELECT s.k, s.lo, s.hi, b.y1, b.y2
  FROM slabs s JOIN b ON b.k = s.k
  WHERE s.hi IS NOT NULL AND b.x1 <= s.lo AND b.x2 >= s.hi),
seg AS (
  SELECT k, lo, hi,
         greatest(0, y2 - greatest(y1, coalesce(
           max(y2) OVER (PARTITION BY k, lo ORDER BY y1, y2
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           y1))) AS cov
  FROM j),
per_slab AS (
  SELECT k, lo, hi, sum(cov) AS cov FROM seg GROUP BY 1, 2, 3)
SELECT k AS {key_col}, sum((hi - lo) * cov) AS area
FROM per_slab GROUP BY 1"""
