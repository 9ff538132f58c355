"""Cell-set compaction (operators/tiling.py compact_cells/uncompact_cells).

The H3 compact analog over the Morton cell ids of functions/cells.py
(parent = cell >> 2).  Input must be a non-overlapping cell set (no cell
an ancestor of another) — the standard compact contract."""

import numpy as np

from sis_spark.functions.cells import encode_cell
from sis_spark.operators.tiling import compact_cells, uncompact_cells


def _cells_df(spark, cells):
    return spark.createDataFrame([(int(c),) for c in cells], "cell long")


def test_full_block_collapses_to_single_parent(spark):
    # all 16 res-4 descendants of one res-2 cell -> exactly that cell
    base = (1 << 4) | 0b0110  # some res-2 cell
    kids = [(base << 4) + i for i in range(16)]
    out = compact_cells(_cells_df(spark, kids), min_res=1).collect()
    assert [(r["cell"], r["res"]) for r in out] == [(base, 2)]


def test_hole_prevents_collapse_locally_only(spark):
    # two res-2 blocks: one complete, one missing a single res-4 cell
    b1 = (1 << 4) | 0b0001
    b2 = (1 << 4) | 0b0010
    kids = [(b1 << 4) + i for i in range(16)]
    kids += [(b2 << 4) + i for i in range(16) if i != 5]
    out = {(r["cell"], r["res"])
           for r in compact_cells(_cells_df(spark, kids), min_res=1).collect()}
    assert (b1, 2) in out
    # the holed block keeps three res-3 siblings + three res-4 leaves
    res3 = {c for c, r in out if r == 3}
    res4 = {c for c, r in out if r == 4}
    assert len(res3) == 3 and len(res4) == 3
    assert all(c >> 2 == (b2 << 2) | 1 for c in res4)  # the holed quadrant


def test_roundtrip_on_events_cells(spark, sf_dir):
    from sis_spark.queries import _events_points

    rows = _events_points(spark, sf_dir).select("lon", "lat").collect()
    lon = np.array([r["lon"] for r in rows])
    lat = np.array([r["lat"] for r in rows])
    orig = set(int(c) for c in encode_cell(lon, lat, 6))
    comp = compact_cells(
        _cells_df(spark, sorted(orig)), min_res=2)
    back = uncompact_cells(comp, to_res=6).collect()
    cells = [r["cell"] for r in back]
    assert len(cells) == len(set(cells))  # disjoint cover -> no duplicates
    assert set(cells) == orig
    # and the compacted set is strictly smaller unless nothing merged
    n_comp = comp.count()
    assert n_comp <= len(orig)


def test_no_output_cell_is_ancestor_of_another(spark):
    rng = np.random.RandomState(0)
    lon = rng.uniform(-30, 30, 4000)
    lat = rng.uniform(-20, 20, 4000)
    cells = set(int(c) for c in encode_cell(lon, lat, 5))
    out = compact_cells(_cells_df(spark, sorted(cells)), min_res=1).collect()
    got = {(r["cell"], r["res"]) for r in out}
    ids = {c for c, _ in got}
    for c, r in got:
        anc = c
        for _ in range(r - 1):
            anc >>= 2
            assert anc not in ids, (c, r)


def test_mixed_resolution_input(spark):
    # input already mixed: one res-2 cell + the 16 res-4 kids of a sibling
    a = (1 << 4) | 0b0001
    b = (1 << 4) | 0b0010
    cells = [a] + [(b << 4) + i for i in range(16)]
    out = {(r["cell"], r["res"])
           for r in compact_cells(_cells_df(spark, cells), min_res=1).collect()}
    assert out == {(a, 2), (b, 2)}


def test_uncompact_fanout_is_exact(spark):
    df = compact_cells(_cells_df(spark, [(1 << 4) | 3]), min_res=1)
    out = sorted(r["cell"] for r in uncompact_cells(df, to_res=4).collect())
    base = ((1 << 4) | 3) << 4
    assert out == [base + i for i in range(16)]


# ---------------------------------------------------------------- property suite
# hypothesis drives random valid cell sets through compact/uncompact; the
# numpy reference model re-derives the minimal cover independently.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model_compact(cells, min_res):
    """Reference model: plain-python bottom-up compaction."""
    def res_of(c):
        r = 0
        while c >= 2 << (2 * r):
            r += 1
        return r

    by_res = {}
    for c in set(cells):
        by_res.setdefault(res_of(c), set()).add(c)
    hi = max(by_res)
    out = set()
    level = by_res.get(hi, set())
    for r in range(hi, min_res, -1):
        from collections import Counter
        cnt = Counter(c >> 2 for c in level)
        full = {p for p, n in cnt.items() if n == 4}
        out |= {(c, r) for c in level if (c >> 2) not in full}
        level = full | by_res.get(r - 1, set())
    out |= {(c, min_res) for c in level}
    return out


@st.composite
def cell_sets(draw):
    """Non-overlapping cell sets: start from distinct res-5 cells, then
    randomly promote whole sibling quads so full blocks exist."""
    base = draw(st.sets(st.integers(0, 4 ** 5 - 1), min_size=1, max_size=200))
    cells = {(1 << 10) | c for c in base}
    # force some complete quads into the set
    for p in draw(st.sets(st.integers(0, 4 ** 4 - 1), max_size=8)):
        parent = (1 << 8) | p
        cells |= {(parent << 2) | i for i in range(4)}
    return sorted(cells)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(cells=cell_sets(), min_res=st.integers(1, 4))
def test_compact_matches_model(spark, cells, min_res):
    got = {(r["cell"], r["res"]) for r in
           compact_cells(_cells_df(spark, cells), min_res=min_res).collect()}
    assert got == _model_compact(cells, min_res)
