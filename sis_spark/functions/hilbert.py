"""Hilbert-curve spatial ordering: locality-preserving sort keys for layout.

Morton/Z-order (functions/cells.py) is the engine's cell IDENTITY scheme;
the Hilbert index is the better cell ORDERING scheme — unlike Morton it has
no diagonal jumps (every unit step along the curve moves to a 4-adjacent
grid cell), so sorting/partitioning data files by Hilbert key gives strictly
better worst-case locality for bbox range scans.  This is the standard
table-layout trick (publicly documented in the Apache Iceberg spec's
hilbert-curve ordering and the GeoHash/S2 literature); reference parity:
SIS orders tiles row-major (`F/coverage/grid/GridExtent.java` iteration) —
the curve ordering is our scale addition for file clustering.

Algorithm: the classic per-bit rotate/reflect walk (public domain, as on
the Wikipedia "Hilbert curve" page).  The kernel is vectorized numpy over
Arrow batches (the per-bit loop is order(=log2 n) iterations over whole
arrays, data-dependent rotations as boolean masks — a chain of unrolled
CASE columns would blow up Catalyst lineage instead, the cell_compact
lesson).  The DuckDB oracle replays the identical walk as a recursive CTE,
so the gate pins every key bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["hilbert_d_np", "hilbert_index", "hilbert_sql_select"]


def hilbert_d_np(ix: np.ndarray, iy: np.ndarray, order: int) -> np.ndarray:
    """Vectorized (x, y) -> d on the 2^order x 2^order grid."""
    n = 1 << order
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    if len(x) and (x.min() < 0 or x.max() >= n or y.min() < 0 or y.max() >= n):
        raise ValueError("grid coordinates out of range for the order")
    d = np.zeros(len(x), dtype=np.int64)
    s = n >> 1
    while s > 0:
        rx = ((x // s) % 2).astype(np.int64)
        ry = ((y // s) % 2).astype(np.int64)
        # (3*rx) xor ry without ^: 00->0, 01->1, 11->2, 10->3
        quad = np.select(
            [(rx == 0) & (ry == 0), (rx == 0) & (ry == 1), (rx == 1) & (ry == 1)],
            [0, 1, 2],
            default=3,
        )
        d += s * s * quad
        # rotate: where ry == 0 -> (if rx: reflect about n-1) then swap x/y
        m = ry == 0
        refl = m & (rx == 1)
        x[refl] = n - 1 - x[refl]
        y[refl] = n - 1 - y[refl]
        xm = x[m].copy()
        x[m] = y[m]
        y[m] = xm
        s >>= 1
    return d


def hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order: int,
    id_cols: list[str] | None = None,
    out: str = "hkey",
) -> DataFrame:
    """Append the Hilbert key of integer grid columns (map-only Arrow pass;
    at layout time this is the sort key fed to a range-partitioned write)."""
    id_cols = id_cols or [c for c in df.columns if c not in (x_col, y_col)]
    in_cols = [*id_cols, x_col, y_col]
    schema_parts = [f"{f.name} {f.dataType.simpleString()}"
                    for f in df.select(*in_cols).schema.fields]
    schema = ", ".join(schema_parts + [f"{out} long"])

    def go(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            d = hilbert_d_np(
                pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), order
            )
            res = pdf[in_cols].copy()
            res[out] = d
            yield res

    return df.select(*in_cols).mapInPandas(go, schema=schema)


def hilbert_sql_select(
    base_select: str,
    order: int,
    x: str = "ix",
    y: str = "iy",
    id_col: str = "event_id",
) -> str:
    """DuckDB recursive-CTE replay of hilbert_d_np over ``base_select``
    (which must yield {id_col}, {x}, {y}); returns (id, ix, iy, hkey)."""
    n = 1 << order
    return f"""
WITH RECURSIVE base AS ({base_select}),
walk AS (
  SELECT {id_col}, {x} AS ix0, {y} AS iy0,
         CAST({x} AS BIGINT) AS x, CAST({y} AS BIGINT) AS y,
         0::BIGINT AS d, {order} AS lvl
  FROM base
  UNION ALL
  SELECT {id_col}, ix0, iy0,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n} - 1 - y ELSE y END)
              ELSE x END AS x,
         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {n} - 1 - x ELSE x END)
              ELSE y END AS y,
         d + s * s * (CASE WHEN rx = 0 AND ry = 0 THEN 0
                           WHEN rx = 0 AND ry = 1 THEN 1
                           WHEN rx = 1 AND ry = 1 THEN 2
                           ELSE 3 END) AS d,
         lvl - 1 AS lvl
  FROM (SELECT {id_col}, ix0, iy0, x, y, d, lvl,
               (1::BIGINT << CAST(lvl - 1 AS INTEGER)) AS s,
               CAST((x // (1::BIGINT << CAST(lvl - 1 AS INTEGER))) % 2 AS INTEGER) AS rx,
               CAST((y // (1::BIGINT << CAST(lvl - 1 AS INTEGER))) % 2 AS INTEGER) AS ry
        FROM walk WHERE lvl > 0) t
)
SELECT {id_col}, ix0 AS {x}, iy0 AS {y}, d AS hkey FROM walk WHERE lvl = 0
"""
