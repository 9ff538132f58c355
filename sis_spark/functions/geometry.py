"""Geometry kernels: ray-casting point-in-polygon, haversine, envelopes, WKB.

The reference delegates DE-9IM predicates to JTS/ESRI
(F/geometry/wrapper/GeometryWrapper.java:287); neither library exists here,
so the predicates this engine needs (contains/intersects for point-vs-polygon,
distance) are re-derived as vectorized numpy:

* PIP: classic even-odd ray casting (PNPOLY).  Boundary convention: a point
  exactly on an edge follows the half-open crossing rule (strict ``<`` on the
  intersection abscissa, half-open vertical interval) — deterministic and
  documented, tested against a brute-force reference in tests.
* Distance: spherical haversine (the reference uses Karney ellipsoidal
  geodesics, R/GeodeticCalculator.java:405; spherical is within 0.5% and is
  documented as the engine's metric).
* Envelope: axis-aligned with the anti-meridian wraparound SPLIT rule
  (xmin > xmax is legal and means the box crosses the anti-meridian,
  R/geometry/AbstractEnvelope.java:840, WraparoundMethod.java:55-130).
* WKB: minimal little-endian Point / Polygon / MultiPolygon codec (numpy),
  enough to exchange geometry columns as BinaryType
  (reference I/O analog: F/filter/sqlmm/ST_FromBinary.java).
"""

from __future__ import annotations

import struct

import numpy as np

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius


# ---------------------------------------------------------------- PIP

def points_in_polygon(px: np.ndarray, py: np.ndarray, vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Even-odd ray-cast of many points against ONE polygon ring.

    ``vx, vy``: ring vertices in order (closing edge implied).
    Returns bool array.  O(P*V) vectorized; used inside the refine stage
    after the cell-join prefilter has cut candidates.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    wx = np.roll(vx, -1)
    wy = np.roll(vy, -1)
    cross = (vy[None, :] > py) != (wy[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (wx - vx)[None, :] * (py - vy[None, :]) / (wy - vy)[None, :] + vx[None, :]
    hits = cross & (px < xint)
    return (hits.sum(axis=1) % 2).astype(bool)


def points_in_polygon_with_holes(px, py, rings) -> np.ndarray:
    """Even-odd over all rings: a point inside an odd number of rings is inside
    (outer ring + holes follow even-odd naturally)."""
    acc = np.zeros(len(np.asarray(px)), dtype=np.int64)
    for vx, vy in rings:
        acc += points_in_polygon(px, py, vx, vy).astype(np.int64)
    return (acc % 2).astype(bool)


def pad_polygons(polys_vx, polys_vy, pad_to: int | None = None):
    """Pack variable-length rings into dense (M, K) arrays by repeating the
    last vertex.  A degenerate edge (v == w) never crosses the ray
    ((vy>py) != (wy>py) is false), so padding is exact for even-odd PIP."""
    m = len(polys_vx)
    k = pad_to or max((len(v) for v in polys_vx), default=1)
    VX = np.empty((m, k), dtype=np.float64)
    VY = np.empty((m, k), dtype=np.float64)
    for i in range(m):
        n = len(polys_vx[i])
        VX[i, :n] = polys_vx[i]
        VY[i, :n] = polys_vy[i]
        VX[i, n:] = polys_vx[i][-1]
        VY[i, n:] = polys_vy[i][-1]
    return VX, VY


def _ring_crossings(px2, py2, vx, vy) -> np.ndarray:
    """Ray-crossing counts of points (column vectors) vs gathered rings (N, K)."""
    wx = np.roll(vx, -1, axis=1)
    wy = np.roll(vy, -1, axis=1)
    cross = (vy > py2) != (wy > py2)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (wx - vx) * (py2 - vy) / (wy - vy) + vx
    return (cross & (px2 < xint)).sum(axis=1)


def points_in_padded_polygons(px, py, gi, VX, VY) -> np.ndarray:
    """Fully vectorized PIP of point i against polygon gi[i] (padded dense
    rings).  One (N, K) crossing evaluation — no per-polygon loops; this is
    the hot kernel of the spatial-join refine."""
    px2 = np.asarray(px, dtype=np.float64)[:, None]
    py2 = np.asarray(py, dtype=np.float64)[:, None]
    hits = _ring_crossings(px2, py2, VX[gi], VY[gi])
    return (hits % 2).astype(bool)


def points_in_padded_rings(px, py, gi, RVX, RVY, ring_start) -> np.ndarray:
    """Even-odd PIP where polygon gi[i] owns rings
    RVX[ring_start[gi]:ring_start[gi+1]] (outer ring + holes).  Crossing
    counts are summed across a polygon's rings — a point inside an odd
    number of rings is inside (holes fall out naturally).  Costs one (N, K)
    pass per ring ordinal, so hole-free polygon sets pay exactly the
    points_in_padded_polygons price."""
    px2 = np.asarray(px, dtype=np.float64)[:, None]
    py2 = np.asarray(py, dtype=np.float64)[:, None]
    gi = np.asarray(gi, dtype=np.int64)
    nr = ring_start[gi + 1] - ring_start[gi]
    counts = np.zeros(gi.shape, dtype=np.int64)
    for j in range(int(nr.max()) if nr.size else 0):
        m = nr > j
        if not m.any():
            break
        r = ring_start[gi[m]] + j
        counts[m] += _ring_crossings(px2[m], py2[m], RVX[r], RVY[r])
    return (counts % 2).astype(bool)


def clip_polygon_x(vx, vy, xbound: float, keep_leq: bool):
    """Sutherland-Hodgman clip of a ring against the vertical line
    x = xbound, keeping x <= xbound (or >=).  Returns (vx, vy) possibly
    empty.  Used for the anti-meridian SPLIT of wraparound polygons
    (WraparoundMethod.java:55 SPLIT applied to polygon geometry)."""
    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    ox: list[float] = []
    oy: list[float] = []
    n = len(vx)
    for i in range(n):
        x1, y1 = vx[i], vy[i]
        x2, y2 = vx[(i + 1) % n], vy[(i + 1) % n]
        in1 = x1 <= xbound if keep_leq else x1 >= xbound
        in2 = x2 <= xbound if keep_leq else x2 >= xbound
        if in1:
            ox.append(x1)
            oy.append(y1)
        if in1 != in2:
            t = (xbound - x1) / (x2 - x1)
            ox.append(xbound)
            oy.append(y1 + t * (y2 - y1))
    return np.asarray(ox), np.asarray(oy)


def segments_intersect_rects(vx, vy, wx, wy, x0, y0, x1, y1) -> np.ndarray:
    """For each rect i: does ANY segment (vx_j,vy_j)->(wx_j,wy_j) intersect
    [x0_i,x1_i]x[y0_i,y1_i]?  Liang–Barsky parametric clip, vectorized
    (n_rects, n_edges).  Segments fully inside the rect count as
    intersecting (t-interval [0,1] survives all four clips)."""
    vx = np.asarray(vx, dtype=np.float64)[None, :]
    vy = np.asarray(vy, dtype=np.float64)[None, :]
    dx = np.asarray(wx, dtype=np.float64)[None, :] - vx
    dy = np.asarray(wy, dtype=np.float64)[None, :] - vy
    x0 = np.asarray(x0, dtype=np.float64)[:, None]
    y0 = np.asarray(y0, dtype=np.float64)[:, None]
    x1 = np.asarray(x1, dtype=np.float64)[:, None]
    y1 = np.asarray(y1, dtype=np.float64)[:, None]
    shape = (x0.shape[0], vx.shape[1])
    t_lo = np.zeros(shape)
    t_hi = np.ones(shape)
    ok = np.ones(shape, dtype=bool)
    for pk, qk in (
        (-dx, vx - x0), (dx, x1 - vx), (-dy, vy - y0), (dy, y1 - vy),
    ):
        pk = np.broadcast_to(pk, shape)
        qk = np.broadcast_to(qk, shape)
        ok &= ~((pk == 0) & (qk < 0))  # parallel and outside
        with np.errstate(divide="ignore", invalid="ignore"):
            t = qk / pk
        t_lo = np.where((pk < 0) & (t > t_lo), t, t_lo)
        t_hi = np.where((pk > 0) & (t < t_hi), t, t_hi)
    return (ok & (t_lo <= t_hi)).any(axis=1)


def points_in_many_polygons(px, py, starts, vx, vy):
    """PIP of N points against M polygons stored as concatenated rings.

    ``starts``: int array of length M+1 — ring i is vx[starts[i]:starts[i+1]].
    Returns (point_idx, poly_idx) arrays of matches.  Vectorized per polygon;
    callers prefilter by cell so each batch is small.
    """
    p_idx_out = []
    g_idx_out = []
    for g in range(len(starts) - 1):
        s, e = starts[g], starts[g + 1]
        inside = points_in_polygon(px, py, vx[s:e], vy[s:e])
        idx = np.nonzero(inside)[0]
        p_idx_out.append(idx)
        g_idx_out.append(np.full(idx.shape, g, dtype=np.int64))
    if not p_idx_out:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    return np.concatenate(p_idx_out), np.concatenate(g_idx_out)


# ---------------------------------------------------------------- distance

def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, broadcasting)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon * 0.5) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB SQL mirroring haversine_m (same op order; asin/sqrt/sin/cos)."""
    return (
        f"(2.0 * {EARTH_RADIUS_M} * asin(sqrt(LEAST(GREATEST("
        f"pow(sin((radians({lat2}) - radians({lat1})) * 0.5), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin((radians({lon2}) - radians({lon1})) * 0.5), 2)"
        f", 0.0), 1.0))))"
    )


# ---------------------------------------------------------------- envelopes

def envelope_intersects(axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax):
    """Box-interaction with wraparound: a box with xmin > xmax crosses the
    anti-meridian and behaves as the union of two boxes
    (AbstractEnvelope.java:840 'crossing the anti-meridian' contract)."""
    def _x_overlap(a0, a1, b0, b1):
        a_wrap = a0 > a1
        b_wrap = b0 > b1
        plain = (a0 <= b1) & (b0 <= a1)
        a_split = (a0 <= b1) | (b0 <= a1)  # a wraps: [a0,180]+[−180,a1]
        both = np.broadcast_to(True, np.broadcast(np.asarray(a0), np.asarray(b0)).shape)
        return np.where(
            a_wrap & b_wrap, both,
            np.where(a_wrap, a_split, np.where(b_wrap, (b0 <= a1) | (a0 <= b1), plain)),
        )
    y_ok = (aymin <= bymax) & (bymin <= aymax)
    return _x_overlap(axmin, axmax, bxmin, bxmax) & y_ok


def split_wraparound(xmin, ymin, xmax, ymax):
    """SPLIT rule: one wraparound box -> list of 1 or 2 plain boxes
    (WraparoundMethod.java:55-130 SPLIT)."""
    if xmin > xmax:
        return [(xmin, ymin, 180.0, ymax), (-180.0, ymin, xmax, ymax)]
    return [(xmin, ymin, xmax, ymax)]


# ---------------------------------------------------------------- WKB (minimal)

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_GEOMCOLLECTION = 7


def wkb_linestring(vx, vy) -> bytes:
    vx = np.asarray(vx, dtype=np.float64)
    vy = np.asarray(vy, dtype=np.float64)
    return (
        struct.pack("<BII", 1, _WKB_LINESTRING, len(vx))
        + np.column_stack([vx, vy]).astype("<f8").tobytes()
    )


def wkb_multilinestring(lines) -> bytes:
    return struct.pack("<BII", 1, _WKB_MULTILINESTRING, len(lines)) + b"".join(
        wkb_linestring(vx, vy) for vx, vy in lines
    )


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _WKB_POINT, x, y)


def wkb_multipoint(xs, ys) -> bytes:
    """WKB MultiPoint (each member a full WKB point record, per ISO 19125)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return struct.pack("<BII", 1, _WKB_MULTIPOINT, len(xs)) + b"".join(
        wkb_point(float(x), float(y)) for x, y in zip(xs, ys)
    )


def wkb_multipolygon(polys) -> bytes:
    """polys: list of ring-lists (each as accepted by wkb_polygon)."""
    return struct.pack("<BII", 1, _WKB_MULTIPOLYGON, len(polys)) + b"".join(
        wkb_polygon(rings) for rings in polys
    )


def wkb_geomcollection(members: list[bytes]) -> bytes:
    """WKB GeometryCollection from already-encoded member WKBs."""
    return struct.pack("<BII", 1, _WKB_GEOMCOLLECTION, len(members)) + b"".join(
        bytes(m) for m in members
    )


def wkb_write(typ: str, val) -> bytes:
    """Generic inverse of wkb_parse: re-encode a parsed (typ, val) pair."""
    if typ == "point":
        return wkb_point(*val)
    if typ == "linestring":
        return wkb_linestring(*val)
    if typ == "polygon":
        return wkb_polygon(val)
    if typ == "multipoint":
        return wkb_multipoint([p[0] for p in val], [p[1] for p in val])
    if typ == "multilinestring":
        return wkb_multilinestring(val)
    if typ == "multipolygon":
        return wkb_multipolygon(val)
    if typ == "geomcollection":
        return wkb_geomcollection([wkb_write(t, v) for t, v in val])
    raise ValueError(f"unsupported geometry type {typ!r}")


def wkb_polygon(rings) -> bytes:
    """rings: list of (vx, vy) numpy pairs; ring is closed automatically."""
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for vx, vy in rings:
        vx = np.asarray(vx, dtype=np.float64)
        vy = np.asarray(vy, dtype=np.float64)
        if vx[0] != vx[-1] or vy[0] != vy[-1]:
            vx = np.append(vx, vx[0])
            vy = np.append(vy, vy[0])
        out.append(struct.pack("<I", len(vx)))
        out.append(np.column_stack([vx, vy]).astype("<f8").tobytes())
    return b"".join(out)


def wkb_parse(buf: bytes):
    """Parse Point/Polygon/MultiPolygon -> ('point',(x,y)) | ('polygon',[(vx,vy),...])
    | ('multipolygon', [polygons])."""
    def parse_one(off):
        little = buf[off] == 1
        end = "<" if little else ">"
        (typ,) = struct.unpack_from(end + "I", buf, off + 1)
        off += 5
        if typ == _WKB_POINT:
            x, y = struct.unpack_from(end + "dd", buf, off)
            return ("point", (x, y)), off + 16
        if typ == _WKB_LINESTRING:
            (npts,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            arr = np.frombuffer(buf, dtype=end + "f8", count=2 * npts, offset=off).reshape(-1, 2)
            return ("linestring", (arr[:, 0].copy(), arr[:, 1].copy())), off + 16 * npts
        if typ == _WKB_MULTIPOINT:
            (n,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            pts = []
            for _ in range(n):
                (g, off) = parse_one(off)
                pts.append(g[1])
            return ("multipoint", pts), off
        if typ == _WKB_GEOMCOLLECTION:
            (n,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            members = []
            for _ in range(n):
                (g, off) = parse_one(off)
                members.append(g)
            return ("geomcollection", members), off
        if typ == _WKB_MULTILINESTRING:
            (nl,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            lines = []
            for _ in range(nl):
                (g, off) = parse_one(off)
                lines.append(g[1])
            return ("multilinestring", lines), off
        if typ == _WKB_POLYGON:
            (nrings,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                (npts,) = struct.unpack_from(end + "I", buf, off)
                off += 4
                arr = np.frombuffer(buf, dtype=end + "f8", count=2 * npts, offset=off).reshape(-1, 2)
                rings.append((arr[:, 0].copy(), arr[:, 1].copy()))
                off += 16 * npts
            return ("polygon", rings), off
        if typ == _WKB_MULTIPOLYGON:
            (n,) = struct.unpack_from(end + "I", buf, off)
            off += 4
            polys = []
            for _ in range(n):
                (g, off) = parse_one(off)
                polys.append(g[1])
            return ("multipolygon", polys), off
        raise ValueError(f"unsupported WKB type {typ}")

    g, _ = parse_one(0)
    return g


# ------------------------------------------------- ellipsoidal geodesics (r2)

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_WGS84_B = _WGS84_A * (1.0 - _WGS84_F)


def geodesic_inverse_m(lon1, lat1, lon2, lat2, max_iter: int = 100):
    """Ellipsoidal geodesic distance (meters) on WGS84 — Vincenty's inverse
    formula (T. Vincenty 1975, Survey Review XXIII/176; public), vectorized.

    Matches the reference's ellipsoidal geodesics
    (R/GeodeticCalculator.java:405, Karney).  NEAR-ANTIPODAL pairs, where
    Vincenty's iteration diverges, are re-solved exactly by the
    auxiliary-sphere integral method in functions/geodesic.py (r2: this was
    a documented haversine fallback).  The returned mask flags which rows
    took the fallback path (all rows are ellipsoidal-exact either way).

    Returns (dist_m, vincenty_converged_mask)."""
    lon1 = np.asarray(lon1, np.float64)
    lat1 = np.asarray(lat1, np.float64)
    lon2 = np.asarray(lon2, np.float64)
    lat2 = np.asarray(lat2, np.float64)
    f = _WGS84_F
    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    L = np.radians((lon2 - lon1 + 180.0) % 360.0 - 180.0)  # normalize to (-pi, pi]
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sU2, cU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    active = np.ones(L.shape, dtype=bool)
    sin_sig = np.zeros_like(L)
    cos_sig = np.ones_like(L)
    sigma = np.zeros_like(L)
    cos2_alpha = np.ones_like(L)
    cos_2sm = np.ones_like(L)
    for _ in range(max_iter):
        if not active.any():
            break
        sl, cl = np.sin(lam), np.cos(lam)
        ss = np.sqrt((cU2 * sl) ** 2 + (cU1 * sU2 - sU1 * cU2 * cl) ** 2)
        cs = sU1 * sU2 + cU1 * cU2 * cl
        sig = np.arctan2(ss, cs)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(ss != 0.0, cU1 * cU2 * sl / np.where(ss == 0.0, 1.0, ss), 0.0)
        c2a = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(c2a != 0.0, cs - 2.0 * sU1 * sU2 / np.where(c2a == 0.0, 1.0, c2a), 0.0)
        C = f / 16.0 * c2a * (4.0 + f * (4.0 - 3.0 * c2a))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sig + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm**2))
        )
        delta = np.abs(lam_new - lam)
        upd = active
        lam = np.where(upd, lam_new, lam)
        sin_sig = np.where(upd, ss, sin_sig)
        cos_sig = np.where(upd, cs, cos_sig)
        sigma = np.where(upd, sig, sigma)
        cos2_alpha = np.where(upd, c2a, cos2_alpha)
        cos_2sm = np.where(upd, c2sm, cos_2sm)
        active = active & (delta > 1e-12) & (np.abs(lam) <= np.pi)

    converged = ~active & (np.abs(lam) <= np.pi)
    u2 = cos2_alpha * (_WGS84_A**2 - _WGS84_B**2) / _WGS84_B**2
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = B * sin_sig * (
        cos_2sm + B / 4.0 * (
            cos_sig * (-1.0 + 2.0 * cos_2sm**2)
            - B / 6.0 * cos_2sm * (-3.0 + 4.0 * sin_sig**2) * (-3.0 + 4.0 * cos_2sm**2)
        )
    )
    dist = _WGS84_B * A * (sigma - dsig)
    # coincident points: zero (sigma already 0); non-converged (near-
    # antipodal): exact integral solver on just those rows
    if not converged.all():
        from . import geodesic as _gd

        bad = ~converged
        dist = np.array(dist, copy=True)
        dist[bad] = _gd.inverse_m(lon1[bad], lat1[bad], lon2[bad], lat2[bad])[0]
    return dist, converged


# ------------------------------------------------- point-to-segment distance

def point_segments_dist2(px, py, svx, svy, swx, swy) -> np.ndarray:
    """Squared planar distance from each point to each open segment:
    (n_points, n_segments) float64.

    Clamped-projection formula with a fixed FP expression order so the SQL
    oracle can replicate it term for term (ST_Distance for mixed-dimension
    operands, SQLMM.java:169; the reference delegates to JTS distance ops
    via GeometryWrapper)."""
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    svx = np.asarray(svx, np.float64)[None, :]
    svy = np.asarray(svy, np.float64)[None, :]
    dx = np.asarray(swx, np.float64)[None, :] - svx
    dy = np.asarray(swy, np.float64)[None, :] - svy
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = ((px - svx) * dx + (py - svy) * dy) / len2
    tt = np.where(len2 == 0.0, 0.0, tt)  # degenerate segment -> its start point
    tc = np.clip(tt, 0.0, 1.0)
    ex = px - (svx + dx * tc)
    ey = py - (svy + dy * tc)
    return ex * ex + ey * ey


def map_geom_coords(typ: str, val, fn):
    """Apply ``fn(xs, ys) -> (xs', ys')`` to every coordinate of a parsed
    geometry, preserving structure (ST_Transform.java:63 semantics:
    reproject coordinates, keep geometry shape).  ``fn`` receives numpy
    arrays and must return arrays of the same length."""
    if typ == "point":
        xs, ys = fn(np.asarray([val[0]], float), np.asarray([val[1]], float))
        return (float(xs[0]), float(ys[0]))
    if typ == "linestring":
        xs, ys = fn(np.asarray(val[0], float), np.asarray(val[1], float))
        return (xs, ys)
    if typ == "polygon":
        return [fn(np.asarray(vx, float), np.asarray(vy, float)) for vx, vy in val]
    if typ == "multipoint":
        return [map_geom_coords("point", p, fn) for p in val]
    if typ == "multilinestring":
        return [map_geom_coords("linestring", l, fn) for l in val]
    if typ == "multipolygon":
        return [map_geom_coords("polygon", p, fn) for p in val]
    if typ == "geomcollection":
        return [(t, map_geom_coords(t, v, fn)) for t, v in val]
    raise ValueError(f"unknown geometry type {typ!r}")
