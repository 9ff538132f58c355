"""Hexagonal cell index: exact Voronoi assignment, adjacency, k-ring."""

import numpy as np
import pytest

from sis_spark.functions.hexgrid import (
    hex_center,
    hex_cell_expr,
    hex_k_ring,
    hex_neighbors,
    hex_pack,
    hex_unpack,
)

D = 2.0
H = D * np.sqrt(3.0)


def _brute_cell(x, y):
    """Nearest center over a large candidate window of BOTH lattices."""
    best = None
    i0 = int(np.floor(x / D))
    j0 = int(np.floor(y / H))
    for i in range(i0 - 2, i0 + 3):
        for j in range(j0 - 2, j0 + 3):
            for flag in (0, 1):
                c = hex_pack(i, j, flag)
                cx, cy = hex_center(c, D)
                d2 = (x - cx) ** 2 + (y - cy) ** 2
                key = (d2, flag)  # ties -> lattice 0, matching the CASE
                if best is None or key < best[0]:
                    best = (key, c)
    return best[1]


def test_assignment_matches_brute_voronoi(spark):
    rng = np.random.RandomState(23)
    pts = rng.uniform(-50, 50, size=(400, 2))
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "lon double, lat double"
    )
    got = [
        r["cell"]
        for r in df.select(hex_cell_expr("lon", "lat", D).alias("cell")).collect()
    ]
    for (x, y), cell in zip(pts, got):
        assert cell == _brute_cell(x, y), (x, y)


def test_pack_unpack_roundtrip():
    for i, j, flag in [(0, 0, 0), (-5, 7, 1), (1000, -1000, 0), (-1, -1, 1)]:
        assert hex_unpack(hex_pack(i, j, flag)) == (i, j, flag)


def test_neighbors_are_at_unit_distance():
    for cell in [hex_pack(0, 0, 0), hex_pack(3, -2, 1), hex_pack(-7, 5, 0)]:
        cx, cy = hex_center(cell, D)
        ns = hex_neighbors(cell)
        assert len(ns) == len(set(ns)) == 6
        for n in ns:
            nx, ny = hex_center(n, D)
            assert np.hypot(nx - cx, ny - cy) == pytest.approx(D, rel=1e-12)


def test_k_ring_sizes():
    c = hex_pack(2, 2, 1)
    for k in range(4):
        ring = hex_k_ring(c, k)
        assert len(ring) == 1 + 3 * k * (k + 1)  # centered hexagonal numbers
        assert c in ring
