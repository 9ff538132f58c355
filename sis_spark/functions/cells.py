"""Discrete global grid cells: uint64 Morton (quadkey/S2-style) cell ids + Geohash.

Semantics modeled on the reference's Geohash gazetteer
(G/GeohashReferenceSystem.java:400 ``encode``, :463-533 ``decode``):
bit-interleaved lon/lat with the longitude bit first, BASE32 text form.
Our native id is the same interleaving packed into an int64 with a
leading marker bit so ids are unique across resolutions:

    cell = (1 << 2r) | interleave(ix, iy)      # lon bit at the higher position

where ``ix = floor((lon+180)/360 * 2^r)`` clamped to [0, 2^r-1] and
``iy = floor((lat+90)/180 * 2^r)`` — identical scaling to Geohash's
binary subdivision, so the reference's landmark test vectors
(Gt/GeohashReferenceSystemTest.java:85-91) validate this kernel.

Everything is vectorized numpy over uint64 — no per-row Python.
k-ring neighborhoods (absent in the reference, our kNN addition) wrap
in longitude and clamp in latitude.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # 2*29+1 = 59 bits + marker => fits int64

_U = np.uint64

_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)
_BASE32_INV = np.full(128, 255, dtype=np.uint8)
for _i, _c in enumerate(_BASE32):
    _BASE32_INV[_c] = _i


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to even bit positions (Morton)."""
    v = v.astype(np.uint64) & _U(0xFFFFFFFF)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits: gather even bit positions into low 32 bits."""
    v = v.astype(np.uint64) & _U(0x5555555555555555)
    v = (v | (v >> _U(1))) & _U(0x3333333333333333)
    v = (v | (v >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> _U(4))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v >> _U(8))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v >> _U(16))) & _U(0x00000000FFFFFFFF)
    return v


def lonlat_to_ixiy(lon: np.ndarray, lat: np.ndarray, res: int):
    """Integer grid coordinates at resolution ``res`` (2^res cells per axis).

    floor + clamp — same inclusive-low convention as the reference's
    GridExtent (F/coverage/grid/GridExtent.java:340): a coordinate exactly
    on a cell edge belongs to the higher cell, except the top edge which
    clamps into the last cell.
    """
    n = 1 << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon + 180.0) / 360.0 * n)
    iy = np.floor((lat + 90.0) / 180.0 * n)
    ix = np.clip(ix, 0, n - 1)
    iy = np.clip(iy, 0, n - 1)
    return ix.astype(np.uint64), iy.astype(np.uint64)


def encode_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """int64 cell id at resolution ``res`` (vectorized)."""
    if not 0 < res <= MAX_RES:
        raise ValueError(f"res must be in 1..{MAX_RES}")
    ix, iy = lonlat_to_ixiy(lon, lat, res)
    cell = _U(1 << (2 * res)) | (_spread_bits(ix) << _U(1)) | _spread_bits(iy)
    return cell.astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    """Resolution encoded in the marker bit (floor(log4) of the id)."""
    cell = np.asarray(cell, dtype=np.uint64)
    # highest set bit is at position 2*res
    res = np.zeros(cell.shape, dtype=np.int64)
    v = cell.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (_U(1) << _U(shift))
        res[mask] += shift
        v[mask] >>= _U(shift)
    return res // 2


def cell_to_ixiy(cell: np.ndarray, res: int):
    cell = np.asarray(cell, dtype=np.uint64) & ~_U(1 << (2 * res))
    ix = _compact_bits(cell >> _U(1))
    iy = _compact_bits(cell)
    return ix, iy


def cell_to_envelope(cell: np.ndarray, res: int):
    """(lon_min, lat_min, lon_max, lat_max) of each cell."""
    ix, iy = cell_to_ixiy(cell, res)
    n = float(1 << res)
    lon0 = ix.astype(np.float64) / n * 360.0 - 180.0
    lat0 = iy.astype(np.float64) / n * 180.0 - 90.0
    return lon0, lat0, lon0 + 360.0 / n, lat0 + 180.0 / n


def cell_centroid(cell: np.ndarray, res: int):
    x0, y0, x1, y1 = cell_to_envelope(cell, res)
    return (x0 + x1) * 0.5, (y0 + y1) * 0.5


def parent_cell(cell: np.ndarray, res: int, parent_res: int) -> np.ndarray:
    """Ancestor cell id at a coarser resolution (pure bit shift)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    cell = np.asarray(cell, dtype=np.uint64)
    shifted = cell >> _U(2 * (res - parent_res))
    # marker bit moves along with the shift automatically
    return shifted.astype(np.int64)


def ixiy_to_cell(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    cell = (
        _U(1 << (2 * res))
        | (_spread_bits(np.asarray(ix, dtype=np.uint64)) << _U(1))
        | _spread_bits(np.asarray(iy, dtype=np.uint64))
    )
    return cell.astype(np.int64)


def k_ring(cell: int, res: int, k: int) -> np.ndarray:
    """All cell ids within Chebyshev distance k (the (2k+1)^2 block).

    Wraps in longitude (ix mod 2^res), clamps in latitude — the
    anti-meridian neighbor rule matching the reference's wraparound
    handling (R/geometry/WraparoundMethod.java:55-130).
    Absent in the reference (PointTree has no kNN,
    F/index/tree/PointTree.java:82) — this is our kNN primitive.
    """
    n = 1 << res
    ix, iy = cell_to_ixiy(np.asarray([cell]), res)
    ix, iy = int(ix[0]), int(iy[0])
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    nx = np.mod(ix + dx.ravel(), n).astype(np.uint64)
    ny = (iy + dy.ravel()).astype(np.int64)
    keep = (ny >= 0) & (ny < n)
    return np.unique(ixiy_to_cell(nx[keep], ny[keep].astype(np.uint64), res))


def covering_cells(xmin, ymin, xmax, ymax, res: int) -> np.ndarray:
    """Cell ids covering an envelope at ``res`` (plan-time, driver-side).

    The raster analog in the reference is GridDerivation's request∩data
    rounding (F/coverage/grid/GridDerivation.java:332-401).  Handles the
    anti-meridian SPLIT rule: an envelope with xmin > xmax wraps and is
    split into two boxes (R/geometry/AbstractEnvelope.java:840,
    WraparoundMethod.java:55-130).
    """
    n = 1 << res
    if xmin > xmax:  # wraparound envelope
        a = covering_cells(xmin, ymin, 180.0, ymax, res)
        b = covering_cells(-180.0, ymin, xmax, ymax, res)
        return np.unique(np.concatenate([a, b]))
    ix0, iy0 = lonlat_to_ixiy(np.asarray([xmin]), np.asarray([ymin]), res)
    # upper edge: nudge inward so an envelope touching a cell edge from
    # below does not claim the next cell; clamp handles the globe edge
    ix1 = np.minimum(np.floor((np.float64(xmax) + 180.0) / 360.0 * n), n - 1)
    iy1 = np.minimum(np.floor((np.float64(ymax) + 90.0) / 180.0 * n), n - 1)
    ix1 = int(max(ix1, 0))
    iy1 = int(max(iy1, 0))
    gx = np.arange(int(ix0[0]), ix1 + 1, dtype=np.uint64)
    gy = np.arange(int(iy0[0]), iy1 + 1, dtype=np.uint64)
    mx, my = np.meshgrid(gx, gy)
    return ixiy_to_cell(mx.ravel(), my.ravel(), res)


# ---------------------------------------------------------------- geohash

def geohash_encode(lon: np.ndarray, lat: np.ndarray, length: int = 12) -> np.ndarray:
    """BASE32 geohash strings, vectorized (G/GeohashReferenceSystem.java:400).

    ``length`` chars = 5*length bits, alternating lon/lat starting with lon.
    Validated against the 7 landmark vectors of
    Gt/GeohashReferenceSystemTest.java:85-91.
    """
    bits = 5 * length
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)), 0, (1 << lon_bits) - 1).astype(np.uint64)
    iy = np.clip(np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)), 0, (1 << lat_bits) - 1).astype(np.uint64)
    # interleave: MSB of ix is the first (highest) bit of the hash
    if lon_bits == lat_bits:
        inter = (_spread_bits(ix) << _U(1)) | _spread_bits(iy)
    else:  # odd total: lon has one extra bit at the very top
        inter = (_spread_bits(ix & _U((1 << lat_bits) - 1)) << _U(1)) | _spread_bits(iy)
        inter |= (ix >> _U(lat_bits)) << _U(2 * lat_bits)
    out = np.empty((lon.size, length), dtype=np.uint8)
    for c in range(length):
        shift = _U(bits - 5 * (c + 1))
        out[:, c] = _BASE32[((inter >> shift) & _U(31)).astype(np.int64)]
    return out.view(f"S{length}").ravel().astype(str)


def geohash_decode(hashes) -> tuple[np.ndarray, np.ndarray]:
    """Centroid (lon, lat) of each geohash cell
    (G/GeohashReferenceSystem.java:463-533; centroid check per
    Gt/GeohashReferenceSystemTest.java:255-256)."""
    hashes = np.asarray(hashes, dtype=str)
    length = len(hashes[0]) if hashes.size else 0
    bits = 5 * length
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    raw = hashes.astype(f"S{length}").view(np.uint8).reshape(-1, length)
    inter = np.zeros(len(hashes), dtype=np.uint64)
    for c in range(length):
        inter = (inter << _U(5)) | _BASE32_INV[raw[:, c]].astype(np.uint64)
    if lon_bits == lat_bits:
        ix = _compact_bits(inter >> _U(1))
        iy = _compact_bits(inter)
    else:
        top = inter >> _U(2 * lat_bits)
        low = inter & _U((1 << (2 * lat_bits)) - 1)
        ix = (_compact_bits(low >> _U(1))) | (top << _U(lat_bits))
        iy = _compact_bits(low)
    lon = (ix.astype(np.float64) + 0.5) / (1 << lon_bits) * 360.0 - 180.0
    lat = (iy.astype(np.float64) + 0.5) / (1 << lat_bits) * 180.0 - 90.0
    return lon, lat


# ---------------------------------------------------------------- SQL oracle text

def cell_sql(lon_sql: str, lat_sql: str, res: int) -> str:
    """DuckDB SQL computing exactly ``encode_cell`` (bit-identical doubles).

    Emitted as an explicit bit-interleave sum so the oracle shares no code
    with the engine — an independent re-derivation for differential testing
    (the reference's differential-backend test style,
    Ft/filter/sqlmm/RegistryTestCase.java).
    """
    n = 1 << res
    ix = f"CAST(LEAST(GREATEST(floor((({lon_sql}) + 180.0) / 360.0 * {n}.0), 0.0), {n - 1}.0) AS BIGINT)"
    iy = f"CAST(LEAST(GREATEST(floor((({lat_sql}) + 90.0) / 180.0 * {n}.0), 0.0), {n - 1}.0) AS BIGINT)"
    terms = [str(1 << (2 * res))]
    for i in range(res):
        terms.append(f"(((__ix >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((__iy >> {i}) & 1) << {2 * i})")
    expr = " + ".join(terms)
    return f"(SELECT {expr} FROM (SELECT {ix} AS __ix, {iy} AS __iy) __t)", ix, iy


def geohash_sql(lon_sql: str, lat_sql: str, length: int) -> str:
    """DuckDB/Spark SQL computing exactly ``geohash_encode`` (bit interleave
    + BASE32 CASE table).  Emits O(bits + 32*length) CASE arms — verbose but
    a pure independent re-derivation for the oracle."""
    bits = 5 * length
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    ix = (
        f"CAST(LEAST(GREATEST(floor((({lon_sql}) + 180.0) / 360.0 * {1 << lon_bits}.0), 0.0), "
        f"{(1 << lon_bits) - 1}.0) AS BIGINT)"
    )
    iy = (
        f"CAST(LEAST(GREATEST(floor((({lat_sql}) + 90.0) / 180.0 * {1 << lat_bits}.0), 0.0), "
        f"{(1 << lat_bits) - 1}.0) AS BIGINT)"
    )
    # interleave: hash bit (bits-1-k) ... lon gets ceil, starting at the top
    terms = []
    for b in range(bits):  # b = bit position from the top (0 = MSB)
        pos = bits - 1 - b  # position in the integer
        if b % 2 == 0:  # lon bit
            src, srcbit = "__gx", lon_bits - 1 - (b // 2)
        else:
            src, srcbit = "__gy", lat_bits - 1 - (b // 2)
        terms.append(f"((({src} >> {srcbit}) & 1) << {pos})")
    inter = "(" + " + ".join(terms) + ")"
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = []
    for c in range(length):
        shift = bits - 5 * (c + 1)
        arms = " ".join(f"WHEN {i} THEN '{alphabet[i]}'" for i in range(32))
        chars.append(f"(CASE ((__inter >> {shift}) & 31) {arms} END)")
    concat = " || ".join(chars)
    return (
        f"SELECT {concat} AS geohash FROM (SELECT {inter} AS __inter FROM "
        f"(SELECT {ix} AS __gx, {iy} AS __gy FROM __POINTS__) __g) __i"
    )


def cell_sql_flat(lon_sql: str, lat_sql: str, res: int) -> str:
    """Same as cell_sql but as a single flat expression (no subquery)."""
    n = 1 << res
    ix = f"CAST(LEAST(GREATEST(floor((({lon_sql}) + 180.0) / 360.0 * {n}.0), 0.0), {n - 1}.0) AS BIGINT)"
    iy = f"CAST(LEAST(GREATEST(floor((({lat_sql}) + 90.0) / 180.0 * {n}.0), 0.0), {n - 1}.0) AS BIGINT)"
    terms = [str(1 << (2 * res))]
    for i in range(res):
        terms.append(f"((({ix} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({iy} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


_OLC_ALPHABET = "23456789CFGHJMPQRVWX"


def pluscode_expr(lat: str, lon: str, div_op: str) -> str:
    """10-character Open Location Code (Plus Code, Google open spec) as a
    single shared-shape SQL expression: lat/lon scaled by 8000 (the
    10-char cell is 1/8000 deg), five base-20 digit pairs interleaved
    lat-then-lon with '+' after the eighth character.  floor() of the
    identical double product is engine-identical; all digit math is
    integer.  ``div_op`` is ' div ' (Spark) or ' // ' (DuckDB).

    The global-addressing twin of the geohash/MGRS encoders
    (G/GeohashReferenceSystem.java:400 precedent) — map-only codegen."""
    latv = (f"least(greatest(CAST(floor((({lat}) + 90.0e0) * 8.0e3) AS BIGINT),"
            f" 0), {180 * 8000 - 1})")
    lonv = (f"((CAST(floor((({lon}) + 180.0e0) * 8.0e3) AS BIGINT) % {360 * 8000}"
            f" + {360 * 8000}) % {360 * 8000})")
    parts = []
    for i in range(5):
        p = 20 ** (4 - i)
        for v in (latv, lonv):
            idx = f"((({v}){div_op}{p}) % 20)"
            parts.append(
                f"substr('{_OLC_ALPHABET}', CAST({idx} + 1 AS INT), 1)")
        if i == 3:
            parts.append("'+'")
    return "(" + " || ".join(parts) + ")"
