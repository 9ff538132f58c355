"""Detection-box operators: greedy NMS + IoU join (operators/boxes.py)."""

import numpy as np
import pytest

from sis_spark.operators.boxes import iou_join, nms, nms_dense


def _random_boxes(rng, n_images=6, per_image=40):
    rows = []
    bid = 0
    for img in range(n_images):
        for _ in range(per_image):
            x1 = int(rng.integers(0, 200))
            y1 = int(rng.integers(0, 200))
            w = int(rng.integers(5, 80))
            h = int(rng.integers(5, 80))
            score = int(rng.integers(0, 50))  # small range forces ties
            rows.append((img, bid, x1, y1, x1 + w, y1 + h, score))
            bid += 1
    return rows


COLS = ["image_id", "box_id", "x1", "y1", "x2", "y2", "score"]


def test_nms_matches_dense(spark):
    rng = np.random.default_rng(7)
    rows = _random_boxes(rng)
    df = spark.createDataFrame(rows, COLS)
    got = {
        (r.image_id, r.box_id)
        for r in nms(df, iou_num=1, iou_den=2).collect()
    }
    exp = set()
    for img in {r[0] for r in rows}:
        per = [(r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows if r[0] == img]
        exp |= {(img, b) for b in nms_dense(per, iou_num=1, iou_den=2)}
    assert got == exp


def test_nms_zero_threshold_keeps_disjoint_only(spark):
    # iou 0/1: any positive overlap suppresses; identical boxes dedup to one
    rows = [
        (1, 1, 0, 0, 10, 10, 9),
        (1, 2, 0, 0, 10, 10, 5),   # duplicate, lower score -> suppressed
        (1, 3, 10, 10, 20, 20, 4),  # half-open: touches at corner only
        (1, 4, 5, 5, 15, 15, 8),   # overlaps box 1 -> suppressed
    ]
    df = spark.createDataFrame(rows, COLS)
    kept = sorted(r.box_id for r in nms(df, iou_num=0, iou_den=1).collect())
    assert kept == [1, 3]


def test_nms_tie_breaks_by_box_id(spark):
    rows = [
        (0, 10, 0, 0, 10, 10, 7),
        (0, 2, 0, 0, 10, 10, 7),  # same score, smaller id wins
    ]
    df = spark.createDataFrame(rows, COLS)
    kept = [r.box_id for r in nms(df, iou_num=1, iou_den=2).collect()]
    assert kept == [2]


def test_iou_join_exact_counts(spark):
    rows = _random_boxes(np.random.default_rng(11), n_images=4, per_image=30)
    df = spark.createDataFrame(rows, COLS)
    pred = df.filter("box_id % 2 = 0")
    gt = df.filter("box_id % 2 = 1")
    got = {
        (r.pred_id, r.gt_id, r.inter, r.uni)
        for r in iou_join(pred, gt, iou_num=1, iou_den=3).collect()
    }
    exp = set()
    by_img = {}
    for r in rows:
        by_img.setdefault(r[0], []).append(r)
    for per in by_img.values():
        for p in per:
            for g in per:
                if p[1] % 2 or g[1] % 2 == 0:
                    continue
                ix = max(0, min(p[4], g[4]) - max(p[2], g[2]))
                iy = max(0, min(p[5], g[5]) - max(p[3], g[3]))
                inter = ix * iy
                uni = (
                    (p[4] - p[2]) * (p[5] - p[3])
                    + (g[4] - g[2]) * (g[5] - g[3])
                    - inter
                )
                if 3 * inter >= uni:
                    exp.add((p[1], g[1], inter, uni))
    assert got == exp


def test_iou_join_never_divides_and_matches_self(spark):
    rows = [(0, 1, 0, 0, 4, 4, 1), (0, 2, 0, 0, 4, 4, 1)]
    df = spark.createDataFrame(rows, COLS)
    out = iou_join(
        df.filter("box_id = 1"), df.filter("box_id = 2"), 1, 1
    ).collect()
    assert len(out) == 1 and out[0].inter == out[0].uni == 16


def test_letterbox_semantics(spark):
    from sis_spark.operators.boxes import letterbox_boxes

    boxes = spark.createDataFrame(
        [(1, 1, 0, 0, 100, 200, 0), (2, 2, 50, 50, 150, 100, 0)],
        COLS,
    )
    dims = spark.createDataFrame([(1, 100, 200), (2, 400, 100)], ["image_id", "w", "h"])
    got = {r.image_id: r for r in letterbox_boxes(boxes, dims, 640, 640).collect()}

    # image 1: 100x200 portrait -> scale 640/200, sw=320, sh=640, pad_x=160
    r = got[1]
    assert (r.sw, r.sh, r.pad_x, r.pad_y) == (320, 640, 160, 0)
    assert (r.nx1, r.ny1, r.nx2, r.ny2) == (160, 0, 160 + 320, 640)
    # image 2: 400x100 landscape -> scale 640/400, sw=640, sh=160, pad_y=240
    r = got[2]
    assert (r.sw, r.sh, r.pad_x, r.pad_y) == (640, 160, 0, 240)
    assert (r.nx1, r.ny1, r.nx2, r.ny2) == (80, 320, 240, 400)


def test_letterbox_clamps_out_of_frame_boxes(spark):
    from sis_spark.operators.boxes import letterbox_boxes

    boxes = spark.createDataFrame([(1, 1, -50, 0, 900, 80, 0)], COLS)
    dims = spark.createDataFrame([(1, 640, 640)], ["image_id", "w", "h"])
    (r,) = letterbox_boxes(boxes, dims, 640, 640).collect()
    assert r.nx1 == 0 and r.nx2 == 640  # clamped to the canvas
