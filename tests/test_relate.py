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


class TestDe9imAny:
    """de9im_any_wkb patterns must be coherent with the predicate dispatch:
    deriving the eight predicates from the matrix string reproduces
    relate_any_wkb exactly, for every supported type pair."""

    @staticmethod
    def _preds_from_pattern(p: str, dim_a: int, dim_b: int) -> dict:
        II, IB, IE, BI, BB, BE, EI, EB, EE = p

        def t(c):
            return c != "F"

        intersects = t(II) or t(IB) or t(BI) or t(BB)
        within = t(II) and not t(IE) and not t(BE)
        contains = t(II) and not t(EI) and not t(EB)
        if dim_a == dim_b:
            crosses = II == "0" if dim_a == 1 else False
            overlaps = (
                t(II) and t(IE) and t(EI) and (dim_a != 1 or II == "1")
            )
        else:
            crosses = (t(II) and t(IE)) if dim_a < dim_b else (t(II) and t(EI))
            overlaps = False
        return {
            "intersects": intersects,
            "disjoint": not intersects,
            "within": within,
            "contains": contains,
            "equals": within and contains,
            "crosses": crosses,
            "overlaps": overlaps,
            "touches": (not t(II)) and (t(IB) or t(BI) or t(BB)),
        }

    def _zoo(self):
        from sis_spark.functions.geometry import (
            wkb_linestring,
            wkb_point,
            wkb_polygon,
        )

        dims = {}
        g = {}
        g["pt_in"] = wkb_point(1.0, 1.0)
        g["pt_far"] = wkb_point(9.5, 9.5)
        g["pt_mid"] = wkb_point(2.0, 2.0)        # on line_diag's interior
        g["pt_end"] = wkb_point(1.0, 1.0)        # == line_diag start
        g["line_diag"] = wkb_linestring([1.0, 3.0], [1.0, 3.0])
        g["line_cross"] = wkb_linestring([1.0, 3.0], [3.0, 1.0])
        g["line_far"] = wkb_linestring([8.0, 9.0], [0.25, 0.25])
        # zoo stays inside the general-position model: no vertex of any
        # geometry on an edge of another, no collinear edge overlap
        g["line_exit"] = wkb_linestring([2.0, 7.0], [1.25, 1.25])
        g["sq"] = wkb_polygon([([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0])])
        g["tri"] = wkb_polygon([([2.0, 8.0, 2.0, 2.0], [1.5, 1.5, 7.5, 1.5])])
        g["poly_far"] = wkb_polygon(
            [([10.0, 12.0, 12.0, 10.0, 10.0], [10.0, 10.0, 12.0, 12.0, 10.0])]
        )
        for k in g:
            dims[k] = 0 if k.startswith("pt") else (1 if k.startswith("line") else 2)
        return g, dims

    def test_pattern_predicate_coherence(self):
        from sis_spark.functions.relate import de9im_any_wkb, relate_any_wkb

        g, dims = self._zoo()
        checked = 0
        for ka, a in g.items():
            for kb, b in g.items():
                pat = de9im_any_wkb(a, b)
                assert len(pat) == 9 and pat[8] == "2", (ka, kb, pat)
                derived = self._preds_from_pattern(pat, dims[ka], dims[kb])
                got = relate_any_wkb(a, b)
                for key, want in derived.items():
                    assert got[key] == want, (ka, kb, key, pat, got)
                # transposition coherence: relate(b, a) is the transpose
                pat_t = de9im_any_wkb(b, a)
                assert pat_t == "".join(
                    pat[3 * (i % 3) + i // 3] for i in range(9)
                ), (ka, kb, pat, pat_t)
                checked += 1
        assert checked == len(g) ** 2

    def test_known_patterns(self):
        from sis_spark.functions.relate import de9im_any_wkb

        g, _ = self._zoo()
        assert de9im_any_wkb(g["pt_in"], g["pt_in"]) == "0FFFFFFF2"
        assert de9im_any_wkb(g["pt_in"], g["pt_far"]) == "FF0FFF0F2"
        assert de9im_any_wkb(g["pt_mid"], g["line_diag"]) == "0FFFFF102"
        assert de9im_any_wkb(g["pt_end"], g["line_diag"]) == "F0FFFF102"
        assert de9im_any_wkb(g["pt_in"], g["sq"]) == "0FFFFF212"
        assert de9im_any_wkb(g["line_diag"], g["line_cross"]) == "0F1FF0102"
        assert de9im_any_wkb(g["line_diag"], g["sq"]).startswith("1FF0F")
        assert de9im_any_wkb(g["sq"], g["tri"]) == "212101212"
