"""Property-based invariants for the cell index and projections (hypothesis).

The cell codec underlies every spatial join/prefilter; these generative
suites pin the algebraic contracts the example tests sample: encode/decode
inverse pairs, envelope membership, parent consistency, covering
completeness, Mercator/UTM round-trips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sis_spark.functions import cells as C
from sis_spark.functions import transforms as TR

lon = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lat = st.floats(min_value=-89.999999, max_value=89.999999, allow_nan=False)
res = st.integers(min_value=1, max_value=C.MAX_RES)


@settings(max_examples=300, deadline=None)
@given(lon, lat, res)
def test_cell_envelope_contains_point(lo, la, r):
    cell = C.encode_cell(np.array([lo]), np.array([la]), r)
    x0, y0, x1, y1 = C.cell_to_envelope(cell, r)
    assert x0[0] - 1e-9 <= lo <= x1[0] + 1e-9
    assert y0[0] - 1e-9 <= la <= y1[0] + 1e-9
    assert C.cell_res(cell)[0] == r


@settings(max_examples=300, deadline=None)
@given(lon, lat, res, res)
def test_parent_cell_consistency(lo, la, r1, r2):
    rf, rc = max(r1, r2), min(r1, r2)  # fine, coarse
    fine = C.encode_cell(np.array([lo]), np.array([la]), rf)
    coarse = C.encode_cell(np.array([lo]), np.array([la]), rc)
    assert C.parent_cell(fine, rf, rc)[0] == coarse[0]


@settings(max_examples=200, deadline=None)
@given(lon, lat, res)
def test_ixiy_cell_roundtrip(lo, la, r):
    cell = C.encode_cell(np.array([lo]), np.array([la]), r)
    ix, iy = C.cell_to_ixiy(cell, r)
    assert C.ixiy_to_cell(ix, iy, r)[0] == cell[0]


@settings(max_examples=100, deadline=None)
@given(lon, lat, lon, lat, st.integers(min_value=1, max_value=8))
def test_covering_cells_complete(lo1, la1, lo2, la2, r):
    # every point strictly inside the (non-wrapping) envelope encodes to a
    # covering cell
    x0, x1 = sorted((lo1, lo2))
    y0, y1 = sorted((la1, la2))
    cover = set(C.covering_cells(x0, y0, x1, y1, r).tolist())
    gx = np.linspace(x0, x1, 5)[1:-1]
    gy = np.linspace(y0, y1, 5)[1:-1]
    if len(gx) == 0 or len(gy) == 0:
        return
    px, py = np.meshgrid(gx, gy)
    got = set(C.encode_cell(px.ravel(), py.ravel(), r).tolist())
    assert got <= cover


@settings(max_examples=300, deadline=None)
@given(lon, st.floats(min_value=-85.0, max_value=85.0, allow_nan=False))
def test_mercator_roundtrip(lo, la):
    x, y = TR.mercator_forward(np.array([lo]), np.array([la]))
    lo2, la2 = TR.mercator_inverse(x, y)
    assert abs(lo2[0] - lo) < 1e-9
    assert abs(la2[0] - la) < 1e-9


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
       st.floats(min_value=-79.9, max_value=83.9, allow_nan=False))
def test_utm_roundtrip(lo, la):
    from sis_spark.functions import utm

    zone = int((lo + 180.0) // 6.0) + 1
    lon0 = (zone - 1) * 6.0 - 180.0 + 3.0  # zone central meridian
    e, n = utm.tm_forward(np.array([lo]), np.array([la]), lon0)
    lo2, la2 = utm.tm_inverse(e, n, lon0)
    assert abs(lo2[0] - lo) < 1e-8
    assert abs(la2[0] - la) < 1e-8
