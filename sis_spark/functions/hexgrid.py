"""Hexagonal cell index (H3-analog binning) — exact, codegen, SQL-replicable.

The north-star index family names H3; the engine's primary cell index is the
square Morton grid (functions/cells.py).  This module adds true hexagonal
binning with the same engineering contract: pure JVM codegen columns, shared
expression text between Spark and the DuckDB oracle, exact assignment.

Method (the classic two-lattice construction, e.g. matplotlib's hexbin): the
hexagon centers form a triangular lattice = the union of two staggered
rectangular lattices

    L0 = (i*W, j*H)            L1 = ((i+1/2)*W, (j+1/2)*H)

with W = d (horizontal neighbor distance) and H = d*sqrt(3).  The Voronoi
diagram of a triangular lattice IS the hexagonal grid, so "nearest center"
is an EXACT hex assignment — and the nearest center of each rectangular
lattice is just floor(x/W + 1/2) (ties resolved upward by floor, identically
in every engine).  One comparison of two squared distances picks the
lattice; ties (points on hex edges) go to L0, deterministically.

No rounding function is needed (DuckDB round() is half-away-from-zero,
numpy's is half-to-even — floor(x + 0.5) sidesteps the mismatch), sqrt(3)
is embedded as an exact double literal, and every expression runs in
whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT3 = "1.7320508075688772e0"  # float64(sqrt(3)), exact literal both engines

# packed id: (i + 2^20) * 2^22 + (j + 2^20) * 2 + flag  — i, j in +-2^19
_OFF = 1 << 20


def hex_cell_sql(x: str, y: str, d: str) -> str:
    """Shared Spark-SQL/DuckDB text: packed hex cell id of point (x, y) for
    horizontal center spacing ``d`` (a numeric literal string)."""
    W = f"({d})"
    H = f"(({d}) * {SQRT3})"
    i0 = f"floor(({x}) / {W} + 5.0e-1)"
    j0 = f"floor(({y}) / {H} + 5.0e-1)"
    i1 = f"floor(({x}) / {W})"
    j1 = f"floor(({y}) / {H})"
    c0x, c0y = f"({i0} * {W})", f"({j0} * {H})"
    c1x, c1y = f"(({i1} + 5.0e-1) * {W})", f"(({j1} + 5.0e-1) * {H})"
    d0 = f"((({x}) - {c0x}) * (({x}) - {c0x}) + (({y}) - {c0y}) * (({y}) - {c0y}))"
    d1 = f"((({x}) - {c1x}) * (({x}) - {c1x}) + (({y}) - {c1y}) * (({y}) - {c1y}))"
    pack = lambda i, j, flag: (
        f"((CAST({i} AS BIGINT) + {_OFF}) * {1 << 22}"
        f" + (CAST({j} AS BIGINT) + {_OFF}) * 2 + {flag})"
    )
    return f"(CASE WHEN {d0} <= {d1} THEN {pack(i0, j0, 0)} ELSE {pack(i1, j1, 1)} END)"


def flit(v: float) -> str:
    """Exponent-marked double literal — bare decimals parse as DECIMAL in
    both dialects and can double-round (bit-exactness playbook rule 2)."""
    return f"{float(v):.17e}"


def hex_cell_expr(xcol: str, ycol: str, d: float) -> Column:
    """Column form over existing column NAMES (keeps codegen: one F.expr)."""
    return F.expr(hex_cell_sql(xcol, ycol, flit(d)))


def hex_unpack(cell: int) -> tuple[int, int, int]:
    flag = cell & 1
    j = ((cell >> 1) & ((1 << 21) - 1)) - _OFF
    i = (cell >> 22) - _OFF
    return i, j, flag


def hex_pack(i: int, j: int, flag: int) -> int:
    return (i + _OFF) * (1 << 22) + (j + _OFF) * 2 + flag


def hex_center(cell: int, d: float) -> tuple[float, float]:
    i, j, flag = hex_unpack(cell)
    h = d * np.sqrt(3.0)
    if flag:
        return (i + 0.5) * d, (j + 0.5) * h
    return i * d, j * h


def hex_neighbors(cell: int) -> list[int]:
    """The 6 adjacent hex cells (triangular-lattice neighbors at distance d).

    In lattice coordinates: same-lattice left/right (i±1), plus the four
    nearest opposite-lattice centers."""
    i, j, flag = hex_unpack(cell)
    out = [hex_pack(i - 1, j, flag), hex_pack(i + 1, j, flag)]
    if flag == 0:
        opp = [(i - 1, j - 1), (i, j - 1), (i - 1, j), (i, j)]
        out += [hex_pack(a, b, 1) for a, b in opp]
    else:
        opp = [(i, j), (i + 1, j), (i, j + 1), (i + 1, j + 1)]
        out += [hex_pack(a, b, 0) for a, b in opp]
    return out


def hex_k_ring(cell: int, k: int) -> list[int]:
    """All cells within k hex steps (BFS over hex_neighbors; k is small —
    plan-input scale, the same contract as cells.k_ring)."""
    seen = {cell}
    frontier = [cell]
    for _ in range(k):
        nxt = []
        for c in frontier:
            for n in hex_neighbors(c):
                if n not in seen:
                    seen.add(n)
                    nxt.append(n)
        frontier = nxt
    return sorted(seen)
