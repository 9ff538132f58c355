"""Property-based round-trip tests for the geometry codecs (hypothesis).

The WKB/WKT codecs are the interchange boundary of the whole geometry
model — every operator reads or writes them — so they get generative
coverage beyond the example-based tests: arbitrary finite coordinates,
all 7 ISO 19125 types, nesting, and the cast matrix's totality."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sis_spark.functions import geometry as geo
from sis_spark.functions.sqlmm import wkt_format, wkt_parse

coord = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False,
    width=64,
)


def pts(min_n, max_n):
    return st.lists(st.tuples(coord, coord), min_size=min_n, max_size=max_n)


def ring_pts(min_n, max_n):
    # rings need first != last, else "is it closed" is ambiguous between the
    # auto-closing WKB writer and the WKT formatter (degenerate by contract)
    return pts(min_n, max_n).filter(lambda p: p[0] != p[-1])


def to_xy(p):
    a = np.array(p, np.float64)
    return a[:, 0], a[:, 1]


@st.composite
def geometry(draw, depth=0):
    kinds = ["point", "linestring", "polygon", "multipoint",
             "multilinestring", "multipolygon"]
    if depth == 0:
        kinds.append("geomcollection")
    t = draw(st.sampled_from(kinds))
    if t == "point":
        return t, (draw(coord), draw(coord))
    if t == "linestring":
        return t, to_xy(draw(pts(2, 8)))
    if t == "polygon":
        rings = [to_xy(draw(ring_pts(3, 8)))
                 for _ in range(draw(st.integers(1, 3)))]
        return t, rings
    if t == "multipoint":
        return t, draw(pts(0, 6))
    if t == "multilinestring":
        return t, [to_xy(draw(pts(2, 6))) for _ in range(draw(st.integers(1, 3)))]
    if t == "multipolygon":
        return t, [[to_xy(draw(ring_pts(3, 6)))] for _ in range(draw(st.integers(1, 3)))]
    members = [draw(geometry(depth=1)) for _ in range(draw(st.integers(0, 3)))]
    return t, members


def geom_equal(a, b) -> bool:
    ta, va = a
    tb, vb = b
    if ta != tb:
        return False
    if ta == "point":
        return va == vb
    if ta == "linestring":
        return np.array_equal(va[0], vb[0]) and np.array_equal(va[1], vb[1])
    if ta == "polygon":
        return len(va) == len(vb) and all(
            np.array_equal(r1[0], r2[0]) and np.array_equal(r1[1], r2[1])
            for r1, r2 in zip(va, vb))
    if ta == "multipoint":
        return [tuple(p) for p in va] == [tuple(p) for p in vb]
    if ta == "multilinestring":
        return len(va) == len(vb) and all(
            geom_equal(("linestring", x), ("linestring", y)) for x, y in zip(va, vb))
    if ta == "multipolygon":
        return len(va) == len(vb) and all(
            geom_equal(("polygon", x), ("polygon", y)) for x, y in zip(va, vb))
    return len(va) == len(vb) and all(geom_equal(x, y) for x, y in zip(va, vb))


def close_rings(t, v):
    """wkb_polygon auto-closes rings; normalize the expectation the same way."""
    if t == "polygon":
        out = []
        for vx, vy in v:
            if vx[0] != vx[-1] or vy[0] != vy[-1]:
                vx = np.append(vx, vx[0])
                vy = np.append(vy, vy[0])
            out.append((vx, vy))
        return t, out
    if t == "multipolygon":
        return t, [close_rings("polygon", p)[1] for p in v]
    if t == "geomcollection":
        return t, [close_rings(*m) for m in v]
    return t, v


@settings(max_examples=200, deadline=None)
@given(geometry())
def test_wkb_roundtrip(g):
    t, v = g
    buf = geo.wkb_write(t, v)
    got = geo.wkb_parse(bytes(buf))
    assert geom_equal(got, close_rings(t, v))


@settings(max_examples=200, deadline=None)
@given(geometry())
def test_wkt_roundtrip_via_wkb(g):
    # wkb -> wkt -> parse -> wkb must be a fixed point (repr(float) text
    # round-trips doubles exactly)
    t, v = g
    buf = bytes(geo.wkb_write(t, v))
    txt = wkt_format(*geo.wkb_parse(buf))
    buf2 = bytes(geo.wkb_write(*wkt_parse(txt)))
    assert buf2 == buf


@settings(max_examples=100, deadline=None)
@given(geometry())
def test_cast_matrix_totality(g):
    # every cast either yields a parseable WKB of the requested type or NULL
    from sis_spark.functions.sqlmm import _cast_geom

    t, v = g
    raw = bytes(geo.wkb_write(t, v))
    t2, v2 = geo.wkb_parse(raw)
    for want in ("point", "linestring", "polygon", "multipoint",
                 "multilinestring", "multipolygon", "geomcollection"):
        out = _cast_geom(want, t2, v2, raw)
        if out is not None:
            tt, _ = geo.wkb_parse(bytes(out))
            assert tt == want
