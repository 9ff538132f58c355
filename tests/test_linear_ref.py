"""Linear referencing semantics (functions/linear_ref.py)."""

from sis_spark.functions.linear_ref import line_interpolate_points


def test_midpoint_of_straight_line(spark):
    # one segment (0,0)-(1000000,0): 1/2 of the way = (500000, 0)
    pts = spark.createDataFrame(
        [(1, 0, 0, 0), (1, 1, 1000000, 0)], ["k", "o", "x", "y"]
    )
    rows = line_interpolate_points(pts, [(1, 2)]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.seg == 0
    assert abs(r.qx / 1e6 - 500000) < 1e-3 and abs(r.qy / 1e6) < 1e-3


def test_fraction_lands_in_correct_segment(spark):
    # L-shape: 100 right then 300 up; total 400.  3/4 of the way = 200 up
    # the vertical segment -> (100, 200); 1/8 -> (50, 0) on segment 0.
    pts = spark.createDataFrame(
        [(7, 0, 0, 0), (7, 1, 100, 0), (7, 2, 100, 300)],
        ["k", "o", "x", "y"],
    )
    got = {
        (r.p, r.q): (r.seg, round(r.qx / 1e6, 3), round(r.qy / 1e6, 3))
        for r in line_interpolate_points(pts, [(3, 4), (1, 8)]).collect()
    }
    assert got[(3, 4)] == (1, 100.0, 200.0)
    assert got[(1, 8)] == (0, 50.0, 0.0)


def test_zero_length_segments_skipped_and_degenerate_line_dropped(spark):
    pts = spark.createDataFrame(
        [
            # duplicate vertex mid-line (zero-length segment 1)
            (1, 0, 0, 0), (1, 1, 100, 0), (1, 2, 100, 0), (1, 3, 200, 0),
            # fully degenerate line: all the same vertex
            (2, 0, 5, 5), (2, 1, 5, 5),
        ],
        ["k", "o", "x", "y"],
    )
    rows = line_interpolate_points(pts, [(1, 2)]).collect()
    assert {r.k for r in rows} == {1}
    (r,) = rows
    assert r.seg in (0, 2) and abs(r.qx / 1e6 - 100.0) < 1e-3
