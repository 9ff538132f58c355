"""NTv2 ``.gsb`` shift-grid format: reader + writer (single sub-grid).

The reference loads NTv2 grids through
R/referencing/operation/transform/DatumShiftGridFile.java (provider
NTv2.java parses the record stream); this module re-derives that I/O from
the PUBLIC format description (NTv2 Developer's Guide):

* 11 overview records of 16 bytes — 8-char ASCII name + 8-byte value
  (int32 padded to 8, float64, or 8-char ASCII),
* per sub-grid 11 header records (S_LAT/N_LAT/E_LONG/W_LONG bounds and
  LAT_INC/LONG_INC in ARCSECONDS, GS_COUNT node count),
* GS_COUNT nodes of 4 float32: lat shift, lon shift (both arcseconds,
  longitude POSITIVE WEST — the NTv2 sign convention), and two accuracy
  fields.  Nodes scan row-major from the south-east corner: latitude rows
  south -> north, columns east -> west in positive-west longitude.

``read_ntv2``/``format_ntv2`` convert between those conventions and the
engine's :class:`sis_spark.functions.datums.ShiftGrid` (positive-east
degrees/arcseconds, SW origin, (ny, nx) row-major west->east columns).
Only the float32 node precision is lossy; grids whose values are exactly
representable in float32 (the synthetic gate grid's dyadic values) round-
trip bit-exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.datums import ShiftGrid

_INT_NAMES = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}
_STR_NAMES = {"GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
              "SUB_NAME", "PARENT", "CREATED", "UPDATED"}


def _rec(name: str, value) -> bytes:
    key = name.ljust(8).encode("ascii")
    if name in _INT_NAMES:
        return key + struct.pack("<i", int(value)) + b"\0\0\0\0"
    if name in _STR_NAMES:
        return key + str(value).ljust(8)[:8].encode("ascii")
    return key + struct.pack("<d", float(value))


def _read_rec(buf: bytes, pos: int):
    name = buf[pos:pos + 8].decode("ascii").rstrip()
    raw = buf[pos + 8:pos + 16]
    if name in _INT_NAMES:
        return name, struct.unpack("<i", raw[:4])[0]
    if name in _STR_NAMES:
        return name, raw.decode("ascii").rstrip()
    return name, struct.unpack("<d", raw)[0]


def format_ntv2(grid: ShiftGrid, name: str = "SYNTH", system_f: str = "LOCAL",
                system_t: str = "WGS84") -> bytes:
    """ShiftGrid -> single-sub-grid NTv2 bytes.

    Engine -> NTv2 conversions: positive-east arcsecond lon shifts negate
    to positive-west; the engine's west->east columns reverse to NTv2's
    east->west scan; bounds are in positive-west arcseconds."""
    w = bytearray()
    for r in (("NUM_OREC", 11), ("NUM_SREC", 11), ("NUM_FILE", 1),
              ("GS_TYPE", "SECONDS"), ("VERSION", "NTV2.0"),
              ("SYSTEM_F", system_f), ("SYSTEM_T", system_t),
              ("MAJOR_F", 6378137.0), ("MINOR_F", 6356752.314),
              ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314)):
        w += _rec(*r)
    s_lat = grid.lat0 * 3600.0
    n_lat = (grid.lat0 + grid.dlat * (grid.ny - 1)) * 3600.0
    # positive-west: east bound = -(max positive-east lon)
    e_long = -(grid.lon0 + grid.dlon * (grid.nx - 1)) * 3600.0
    w_long = -grid.lon0 * 3600.0
    count = grid.nx * grid.ny
    for r in (("SUB_NAME", name), ("PARENT", "NONE"),
              ("CREATED", "01012026"), ("UPDATED", "01012026"),
              ("S_LAT", s_lat), ("N_LAT", n_lat),
              ("E_LONG", e_long), ("W_LONG", w_long),
              ("LAT_INC", grid.dlat * 3600.0), ("LONG_INC", grid.dlon * 3600.0),
              ("GS_COUNT", count)):
        w += _rec(*r)
    # rows south->north; columns east->west == reversed engine columns
    lat_shift = grid.slat[:, ::-1].astype(np.float32)
    lon_shift = (-grid.slon[:, ::-1]).astype(np.float32)  # positive west
    acc = np.full(lat_shift.shape, -1.0, np.float32)
    nodes = np.stack([lat_shift, lon_shift, acc, acc], axis=-1)
    w += nodes.astype("<f4").tobytes()
    return bytes(w)


def _read_subgrid(buf: bytes, pos: int):
    """One sub-grid block at ``pos`` -> (ShiftGrid, name, parent, next_pos)."""
    sub = {}
    for _ in range(11):
        k, v = _read_rec(buf, pos)
        sub[k] = v
        pos += 16
    dlat = sub["LAT_INC"] / 3600.0
    dlon = sub["LONG_INC"] / 3600.0
    ny = int(round((sub["N_LAT"] - sub["S_LAT"]) / sub["LAT_INC"])) + 1
    nx = int(round((sub["W_LONG"] - sub["E_LONG"]) / sub["LONG_INC"])) + 1
    count = sub["GS_COUNT"]
    if count != nx * ny:
        raise ValueError(f"GS_COUNT {count} != grid {ny}x{nx}")
    nodes = np.frombuffer(buf, "<f4", count * 4, pos).reshape(ny, nx, 4)
    pos += count * 16
    lat0 = sub["S_LAT"] / 3600.0
    lon0 = -sub["W_LONG"] / 3600.0  # positive-west west bound -> east origin
    slat = nodes[:, ::-1, 0].astype(np.float64)
    slon = (-nodes[:, ::-1, 1]).astype(np.float64)
    g = ShiftGrid(lon0, lat0, dlon, dlat, slon, slat)
    return g, sub.get("SUB_NAME", ""), sub.get("PARENT", "NONE"), pos


def read_ntv2(buf: bytes) -> ShiftGrid:
    """NTv2 bytes -> ShiftGrid (first sub-grid; use read_ntv2_group for
    parent/child hierarchies)."""
    return read_ntv2_group(buf).grids[0]


def read_ntv2_group(buf: bytes):
    """NTv2 bytes -> ShiftGridGroup over ALL sub-grids (NUM_FILE blocks,
    parent/child names preserved) — the DatumShiftGridGroup.java slot:
    per-point sub-grid selection happens in the group, not the reader."""
    from ..functions.datums import ShiftGridGroup

    hdr = {}
    pos = 0
    for _ in range(11):
        k, v = _read_rec(buf, pos)
        hdr[k] = v
        pos += 16
    if hdr.get("GS_TYPE", "SECONDS").upper() != "SECONDS":
        raise ValueError(f"unsupported GS_TYPE {hdr.get('GS_TYPE')!r}")
    n_sub = int(hdr.get("NUM_FILE", 1))
    grids, names, parents = [], [], []
    for _ in range(max(1, n_sub)):
        g, name, parent, pos = _read_subgrid(buf, pos)
        grids.append(g)
        names.append(name)
        parents.append(parent)
    return ShiftGridGroup(grids, names=names, parents=parents)


def format_ntv2_group(grp, system_f: str = "LOCAL",
                      system_t: str = "WGS84") -> bytes:
    """ShiftGridGroup -> multi-sub-grid NTv2 bytes (NUM_FILE = n,
    SUB_NAME/PARENT per block, same node conventions as format_ntv2)."""
    w = bytearray()
    for r in (("NUM_OREC", 11), ("NUM_SREC", 11),
              ("NUM_FILE", len(grp.grids)),
              ("GS_TYPE", "SECONDS"), ("VERSION", "NTV2.0"),
              ("SYSTEM_F", system_f), ("SYSTEM_T", system_t),
              ("MAJOR_F", 6378137.0), ("MINOR_F", 6356752.314),
              ("MAJOR_T", 6378137.0), ("MINOR_T", 6356752.314)):
        w += _rec(*r)
    for grid, name, parent in zip(grp.grids, grp.names, grp.parents):
        s_lat = grid.lat0 * 3600.0
        n_lat = (grid.lat0 + grid.dlat * (grid.ny - 1)) * 3600.0
        e_long = -(grid.lon0 + grid.dlon * (grid.nx - 1)) * 3600.0
        w_long = -grid.lon0 * 3600.0
        count = grid.nx * grid.ny
        for r in (("SUB_NAME", name), ("PARENT", parent),
                  ("CREATED", "01012026"), ("UPDATED", "01012026"),
                  ("S_LAT", s_lat), ("N_LAT", n_lat),
                  ("E_LONG", e_long), ("W_LONG", w_long),
                  ("LAT_INC", grid.dlat * 3600.0),
                  ("LONG_INC", grid.dlon * 3600.0),
                  ("GS_COUNT", count)):
            w += _rec(*r)
        lat_shift = grid.slat[:, ::-1].astype(np.float32)
        lon_shift = (-grid.slon[:, ::-1]).astype(np.float32)
        acc = np.full(lat_shift.shape, -1.0, np.float32)
        nodes = np.stack([lat_shift, lon_shift, acc, acc], axis=-1)
        w += nodes.astype("<f4").tobytes()
    return bytes(w)
