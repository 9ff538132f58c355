"""Polygon-vs-polygon DE-9IM predicates: unit truth table + differential
brute-force check of the distributed pair join (VERDICT r1 item 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sis_spark import synth
from sis_spark.functions import geometry as geo
from sis_spark.functions.relate import (
    predicates_from_flags,
    relate_flags,
    relate_polygons_wkb,
)


def _poly(vx, vy, holes=()):
    return {"vx": np.asarray(vx, float), "vy": np.asarray(vy, float),
            "holes": [(np.asarray(hx, float), np.asarray(hy, float)) for hx, hy in holes]}


SQ = _poly([0, 10, 10, 0], [0, 0, 10, 10])                      # big square
INNER = _poly([2, 4, 4, 2], [2, 2, 4, 4])                        # inside SQ
OFF = _poly([20, 24, 24, 20], [0, 0, 4, 4])                      # disjoint
CROSSER = _poly([5, 15, 15, 5], [5, 5, 15, 15])                  # overlaps SQ
HOLED = _poly([0, 10, 10, 0], [0, 0, 10, 10], holes=[([3, 7, 7, 3], [3, 3, 7, 7])])
IN_HOLE = _poly([4, 6, 6, 4], [4, 4, 6, 6])                      # inside the hole


def P(a, b):
    return predicates_from_flags(relate_flags(a, b))


def test_contains_within():
    p = P(SQ, INNER)
    assert p["contains"] and p["intersects"] and not p["within"] and not p["overlaps"]
    q = P(INNER, SQ)
    assert q["within"] and not q["contains"]


def test_disjoint():
    p = P(SQ, OFF)
    assert p["disjoint"] and not p["intersects"]


def test_overlap_cross():
    p = P(SQ, CROSSER)
    assert p["intersects"] and p["overlaps"] and not p["contains"] and not p["within"]


def test_equals():
    p = P(SQ, _poly([10, 0, 0, 10], [10, 10, 0, 0]))  # rotated/reflected ring
    assert p["equals"] and p["intersects"] and p["contains"] and p["within"]


def test_hole_excludes_containment():
    # polygon entirely inside the container's hole: no intersection at all
    p = P(HOLED, IN_HOLE)
    assert p["disjoint"]
    # polygon overlapping the hole boundary is not contained
    part_in_hole = _poly([4, 8, 8, 4], [4, 4, 8, 8])
    q = P(HOLED, part_in_hole)
    assert q["intersects"] and not q["contains"]


def test_area_area_never_touches_or_crosses():
    for a, b in [(SQ, INNER), (SQ, CROSSER), (SQ, OFF)]:
        p = P(a, b)
        assert not p["touches"] and not p["crosses"]


def test_wkb_pattern_roundtrip():
    wa = geo.wkb_polygon([(SQ["vx"], SQ["vy"])])
    wb = geo.wkb_polygon([(INNER["vx"], INNER["vy"])])
    r = relate_polygons_wkb(wa, wb)
    assert r["pattern"] == "212FF1FF2" and r["contains"]
    r2 = relate_polygons_wkb(wb, wa)
    assert r2["pattern"] == "2FF1FF212" and r2["within"]


def test_pair_join_matches_brute(spark, sf_dir):
    """Distributed polygon_pair_join == brute all-pairs relate over the same
    synthetic dimension (completeness of the covering-cell candidates AND
    correctness of the refine)."""
    from sis_spark.operators.spatial_join import polygon_pair_join
    from sis_spark.queries import _supplier_polygons_df

    polys_df = _supplier_polygons_df(spark, sf_dir)
    got = sorted(
        (r["a"], r["b"], r["contains_ab"], r["contains_ba"])
        for r in polygon_pair_join(polys_df).collect()
    )

    rows = [(r["key"], bytes(r["wkb"])) for r in polys_df.collect()]
    exp = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ka, wa = rows[i]
            kb, wb = rows[j]
            a, b = (ka, kb) if ka < kb else (kb, ka)
            buf_a, buf_b = (wa, wb) if ka < kb else (wb, wa)
            r = relate_polygons_wkb(buf_a, buf_b)
            if r["intersects"]:
                exp.append((a, b, r["contains"], r["within"]))
    assert got == sorted(exp) and len(got) > 0


def test_polygon_pair_join_multi(spark):
    """Union-level predicates over MultiPolygon keys: containment requires
    EVERY member contained; intersects is any-part."""
    from sis_spark.functions import geometry as geo
    from sis_spark.operators.spatial_join import polygon_pair_join_multi

    def mp(parts):
        bufs = [geo.wkb_polygon([(np.asarray(vx, float), np.asarray(vy, float))])
                for vx, vy in parts]
        return (b"\x01" + (6).to_bytes(4, "little")
                + len(bufs).to_bytes(4, "little") + b"".join(bufs))

    sq = lambda x0, y0, w: ([x0, x0 + w, x0 + w, x0], [y0, y0, y0 + w, y0 + w])
    rows = [
        # key 1: two big squares
        (1, mp([sq(0, 0, 10), sq(20, 0, 10)])),
        # key 2: one small square inside EACH of key 1's members -> contained
        (2, mp([sq(2, 2, 2), sq(22, 2, 2)])),
        # key 3: one member inside key 1's first square, one far away -> NOT contained
        (3, mp([sq(5, 5, 2), sq(50, 50, 2)])),
        # key 4: disjoint from everything near
        (4, mp([sq(100, 100, 3)])),
    ]
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "wkb"]),
                               schema="key long, wkb binary")
    got = {(r["a"], r["b"]): (r["contains_ab"], r["contains_ba"])
           for r in polygon_pair_join_multi(df).collect()}
    assert got[(1, 2)] == (True, False)   # both members of 2 inside 1
    assert got[(1, 3)] == (False, False)  # one member of 3 escapes
    assert (2, 3) not in got              # members pairwise disjoint
    assert all(4 not in pair for pair in got)  # key 4 intersects nothing


# --------------------------------------------- any-type dispatch (SQL surface)

class TestRelateAny:
    """relate_any_wkb: full simple-geometry predicate matrix."""

    def _geoms(self):
        from sis_spark.functions.geometry import wkb_point, wkb_polygon, wkb_linestring

        sq = wkb_polygon([([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0])])
        line_in = wkb_linestring([1.0, 3.0], [1.0, 3.0])
        line_cross = wkb_linestring([-1.0, 5.0], [2.0, 2.0])
        return sq, line_in, line_cross

    def test_point_point(self):
        from sis_spark.functions.geometry import wkb_point
        from sis_spark.functions.relate import relate_any_wkb

        p = relate_any_wkb(wkb_point(1.0, 2.0), wkb_point(1.0, 2.0))
        assert p["equals"] and p["intersects"] and p["within"] and p["contains"]
        q = relate_any_wkb(wkb_point(1.0, 2.0), wkb_point(1.0, 2.5))
        assert q["disjoint"] and not q["intersects"]

    def test_point_polygon_both_orders(self):
        from sis_spark.functions.geometry import wkb_point
        from sis_spark.functions.relate import relate_any_wkb

        sq, _, _ = self._geoms()
        pin, pout = wkb_point(1.0, 1.0), wkb_point(9.0, 9.0)
        assert relate_any_wkb(pin, sq)["within"]
        assert not relate_any_wkb(pin, sq)["contains"]
        assert relate_any_wkb(sq, pin)["contains"]
        assert relate_any_wkb(pout, sq)["disjoint"]

    def test_point_line(self):
        from sis_spark.functions.geometry import wkb_point, wkb_linestring
        from sis_spark.functions.relate import relate_any_wkb

        line = wkb_linestring([0.0, 2.0, 4.0], [0.0, 2.0, 0.0])
        mid = relate_any_wkb(wkb_point(1.0, 1.0), line)     # on first segment
        assert mid["intersects"] and mid["within"] and not mid["touches"]
        end = relate_any_wkb(wkb_point(0.0, 0.0), line)     # endpoint = boundary
        assert end["intersects"] and end["touches"] and not end["within"]
        off = relate_any_wkb(wkb_point(1.0, 1.5), line)
        assert off["disjoint"]
        # transposed order swaps contains/within
        assert relate_any_wkb(line, wkb_point(1.0, 1.0))["contains"]

    def test_line_polygon_both_orders(self):
        from sis_spark.functions.relate import relate_any_wkb

        sq, line_in, line_cross = self._geoms()
        assert relate_any_wkb(line_in, sq)["within"]
        assert relate_any_wkb(sq, line_in)["contains"]
        assert relate_any_wkb(line_cross, sq)["crosses"]
        assert relate_any_wkb(sq, line_cross)["crosses"]

    def test_unsupported_multi_raises(self):
        import pytest
        from sis_spark.functions.geometry import wkb_multipoint, wkb_point
        from sis_spark.functions.relate import relate_any_wkb

        mp = wkb_multipoint([1.0, 2.0], [1.0, 2.0])
        with pytest.raises(ValueError):
            relate_any_wkb(mp, wkb_point(1.0, 1.0))
