"""Sources: synthetic deterministic image+caption table, raster tile tables,
GeoTIFF/CSV stores, and geometry-table adapters."""

from __future__ import annotations

import numpy as np


def polygons_from_wkb(rows) -> list[dict]:
    """Adapt a (key, wkb) polygon table to the spatial_join polygon-dict
    shape (key / vx / vy / holes).

    ``rows``: an iterable of (key, wkb_bytes) pairs, or a DataFrame with
    ``key`` and ``wkb`` columns (collected driver-side — the polygon
    dimension is small by design; the reference's equivalent plan-time
    normalization is BinaryGeometryFilter.optimize,
    F/filter/BinaryGeometryFilter.java:43).  A MultiPolygon contributes one
    part per member polygon under the same key; closing duplicate vertices
    are stripped."""
    from ..functions import geometry as geo

    if hasattr(rows, "collect"):
        rows = [(r["key"], r["wkb"]) for r in rows.collect()]

    def ring_open(vx, vy):
        if len(vx) >= 2 and vx[0] == vx[-1] and vy[0] == vy[-1]:
            return np.asarray(vx[:-1]), np.asarray(vy[:-1])
        return np.asarray(vx), np.asarray(vy)

    out = []
    for key, buf in rows:
        typ, val = geo.wkb_parse(bytes(buf))
        if typ == "polygon":
            members = [val]
        elif typ == "multipolygon":
            members = val
        else:
            raise ValueError(f"geometry type {typ!r} is not a polygon (key {key})")
        for rings in members:
            vx, vy = ring_open(*rings[0])
            holes = [ring_open(hvx, hvy) for hvx, hvy in rings[1:]]
            out.append({"key": int(key), "vx": vx, "vy": vy, "holes": holes})
    return out
