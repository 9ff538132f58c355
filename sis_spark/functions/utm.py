"""Universal Transverse Mercator + MGRS (Military Grid Reference System).

Re-derivation of the reference's TM projection and MGRS gazetteer semantics
(R/operation/projection/TransverseMercator.java;
G/MilitaryGridReferenceSystem.java:373,660,771 — zone/band rules, Norway and
Svalbard exceptions, AA-scheme 100 km square letters) from the PUBLIC
Karney/Krüger series (Karney 2011, "Transverse Mercator with an accuracy of
a few nanometers"; the n^4-truncated series here is sub-micrometer over the
UTM domain).  All vectorized numpy; golden vectors in tests/test_utm.py are
the reference's own MGRS test fixtures
(Gt/MilitaryGridReferenceSystemTest.java:230-271).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# WGS84
A_AXIS = 6378137.0
FLATTENING = 1.0 / 298.257223563
K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0

_n = FLATTENING / (2.0 - FLATTENING)
_A = A_AXIS / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0)
_alpha = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 5.0 * _n**3 / 16.0 + 41.0 * _n**4 / 180.0,
    13.0 * _n**2 / 48.0 - 3.0 * _n**3 / 5.0 + 557.0 * _n**4 / 1440.0,
    61.0 * _n**3 / 240.0 - 103.0 * _n**4 / 140.0,
    49561.0 * _n**4 / 161280.0,
)
_beta = (
    _n / 2.0 - 2.0 * _n**2 / 3.0 + 37.0 * _n**3 / 96.0 - _n**4 / 360.0,
    _n**2 / 48.0 + _n**3 / 15.0 - 437.0 * _n**4 / 1440.0,
    17.0 * _n**3 / 480.0 - 37.0 * _n**4 / 840.0,
    4397.0 * _n**4 / 161280.0,
)
_delta = (
    2.0 * _n - 2.0 * _n**2 / 3.0 - 2.0 * _n**3 + 116.0 * _n**4 / 45.0,
    7.0 * _n**2 / 3.0 - 8.0 * _n**3 / 5.0 - 227.0 * _n**4 / 45.0,
    56.0 * _n**3 / 15.0 - 136.0 * _n**4 / 35.0,
    4279.0 * _n**4 / 630.0,
)
_2RTN = 2.0 * np.sqrt(_n) / (1.0 + _n)


def tm_forward(lon, lat, lon0: float):
    """Transverse Mercator forward (Karney series): degrees -> (easting
    offset, northing) in meters from the central meridian ``lon0`` (no false
    easting/northing, scale k0 applied)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _2RTN * np.arctanh(_2RTN * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_alpha, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return K0 * _A * eta, K0 * _A * xi


def tm_inverse(x, y, lon0: float):
    """Inverse of tm_forward: meters -> (lon, lat) degrees."""
    eta = np.asarray(x, dtype=np.float64) / (K0 * _A)
    xi = np.asarray(y, dtype=np.float64) / (K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
    phi = chi.copy()
    for j, d in enumerate(_delta, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------- UTM zones

def utm_zone(lon, lat):
    """UTM zone with the Norway (32V widened) and Svalbard (31/33/35/37X)
    exceptions (MilitaryGridReferenceSystem.java zone special cases)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    norway = (lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0)
    zone = np.where(norway, 32, zone)
    sval = (lat >= 72.0) & (lat < 84.5)
    zone = np.where(sval & (lon >= 0.0) & (lon < 9.0), 31, zone)
    zone = np.where(sval & (lon >= 9.0) & (lon < 21.0), 33, zone)
    zone = np.where(sval & (lon >= 21.0) & (lon < 33.0), 35, zone)
    zone = np.where(sval & (lon >= 33.0) & (lon < 42.0), 37, zone)
    return zone


def utm_forward(lon, lat):
    """(lon, lat) degrees -> (zone, easting, northing) with UTM false
    easting/northing; southern hemisphere uses the 10,000 km false northing."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = utm_zone(lon, lat)
    lon0 = zone.astype(np.float64) * 6.0 - 183.0
    # per-zone central meridians force a loop over distinct zones (tiny set)
    E = np.empty_like(lon)
    N = np.empty_like(lat)
    for z in np.unique(zone):
        m = zone == z
        e, n_ = tm_forward(lon[m], lat[m], float(z * 6 - 183))
        E[m] = e + FALSE_EASTING
        N[m] = np.where(lat[m] < 0.0, n_ + FALSE_NORTHING_SOUTH, n_)
    return zone, E, N


def utm_inverse(zone, E, N, south):
    zone = np.asarray(zone, dtype=np.int64)
    E = np.asarray(E, dtype=np.float64) - FALSE_EASTING
    N = np.asarray(N, dtype=np.float64)
    N = np.where(np.asarray(south, dtype=bool), N - FALSE_NORTHING_SOUTH, N)
    lon = np.empty_like(E)
    lat = np.empty_like(N)
    for z in np.unique(zone):
        m = zone == z
        lo, la = tm_inverse(E[m], N[m], float(z * 6 - 183))
        lon[m] = lo
        lat[m] = la
    return lon, lat


# ---------------------------------------------------------------- MGRS

_BANDS = "CDEFGHJKLMNPQRSTUVWX"          # 8-deg latitude bands, -80..84
_COLS = "ABCDEFGHJKLMNPQRSTUVWXYZ"       # 24 letters (no I, O)
_ROWS = "ABCDEFGHJKLMNPQRSTUV"           # 20 letters (no I, O)


def _band_letter(lat: float) -> str:
    idx = int(np.floor((lat + 80.0) / 8.0))
    return _BANDS[min(max(idx, 0), 19)]  # X stretches to 84N


def mgrs_encode(lon: float, lat: float, precision: int = 5) -> str:
    """MGRS reference at 10^(5-precision)-meter precision (AA scheme:
    odd zones rows start at A, even zones at F —
    MilitaryGridReferenceSystem.java row offset rule).  Latitudes poleward
    of the UTM domain (>= 84 N, < -80 S) take the UPS polar branch."""
    if lat >= 84.0 or lat < -80.0:
        return mgrs_encode_polar(lon, lat, precision)
    zone, E, N = utm_forward(np.array([lon]), np.array([lat]))
    z, e, n_ = int(zone[0]), float(E[0]), float(N[0])
    col = int(e // 100000)
    row = int(n_ // 100000)
    col_letter = _COLS[((z - 1) % 3) * 8 + col - 1]
    row_letter = _ROWS[(row + (5 if z % 2 == 0 else 0)) % 20]
    step = 10 ** (5 - precision)
    de = int((e % 100000) // step)
    dn = int((n_ % 100000) // step)
    return (
        f"{z:d}{_band_letter(lat)}{col_letter}{row_letter}"
        f"{de:0{precision}d}{dn:0{precision}d}"
    )


def mgrs_decode(ref: str):
    """MGRS reference -> (lon, lat) of the CELL CENTER (the reference's
    decode position contract: envelope center,
    MilitaryGridReferenceSystemTest 'decode' helper).  Polar (A/B/Y/Z)
    references route to the UPS branch."""
    if not ref[0].isdigit():
        return mgrs_decode_polar(ref)
    i = 0
    while ref[i].isdigit():
        i += 1
    z = int(ref[:i])
    band = ref[i]
    col_letter = ref[i + 1]
    row_letter = ref[i + 2]
    digits = ref[i + 3:]
    precision = len(digits) // 2
    step = 10 ** (5 - precision)
    de = int(digits[:precision]) * step if precision else 0
    dn = int(digits[precision:]) * step if precision else 0

    col = _COLS.index(col_letter) - ((z - 1) % 3) * 8 + 1
    row0 = (_ROWS.index(row_letter) - (5 if z % 2 == 0 else 0)) % 20
    band_idx = _BANDS.index(band)
    south = band_idx < 10  # bands C..M are southern
    lat_lo = band_idx * 8.0 - 80.0
    # resolve the 2000 km row-letter ambiguity: pick the row cycle whose
    # northing is nearest the band's latitude span
    _, _, n_ref = utm_forward(np.array([z * 6.0 - 183.0]), np.array([lat_lo + 4.0]))
    base = float(n_ref[0])
    # choose the 2000 km row cycle whose northing is nearest the band center
    row = min(
        (row0 + 20 * k for k in range(6)),
        key=lambda r: abs(r * 100000.0 + dn - base),
    )
    e = col * 100000.0 + de + step * 0.5
    n_ = row * 100000.0 + dn + step * 0.5
    lon, lat = utm_inverse(np.array([z]), np.array([e]), np.array([n_]), np.array([south]))
    return float(lon[0]), float(lat[0]), (e, n_)


# ---------------------------------------------------------------- Spark surface

def st_transform_utm_udf():
    """ST_Transform EPSG:4326 -> UTM (auto zone): (lon, lat) columns ->
    struct (zone int, e double, n double).  Arrow-vectorized; the per-zone
    loop inside runs over the handful of distinct zones in a batch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("zone", T.IntegerType()),
        T.StructField("e", T.DoubleType()),
        T.StructField("n", T.DoubleType()),
    ])

    @F.pandas_udf(schema)
    def _f(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        zone, E, N = utm_forward(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
        return pd.DataFrame({"zone": zone.astype(np.int32), "e": E, "n": N})

    return _f


def utm_zone_udf():
    """(lon, lat) -> UTM zone int (Norway/Svalbard exceptions included)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.IntegerType())
    def _f(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            utm_zone(lon.to_numpy(np.float64), lat.to_numpy(np.float64)).astype("int32")
        )

    return _f


def mgrs_band_udf():
    """lat -> MGRS latitude band letter (C..X, X stretched to 84N)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _f(lat: pd.Series) -> pd.Series:
        idx = np.clip(
            np.floor((lat.to_numpy(np.float64) + 80.0) / 8.0).astype(np.int64), 0, 19
        )
        return pd.Series([_BANDS[i] for i in idx])

    return _f


def mgrs_udf(precision: int = 5):
    """(lon, lat) columns -> MGRS reference string column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _f(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series([
            mgrs_encode(float(a), float(b), precision) for a, b in zip(lon, lat)
        ])

    return _f


# ------------------------------------------------------------ polar MGRS
# UPS grid references for lat >= 84 N / < -80 S
# (MilitaryGridReferenceSystem.java:771 polar branch; letters per the
# public DMA TM 8358.1 scheme).  Zone letters: A/B south of -80 (west/east
# of Greenwich), Y/Z north of 84.  Column letters A-Z omitting
# I,O,D,E,M,N,V,W restart at the 180-degree/0-degree columns; row letters
# A-Z omitting I,O anchored so 'A' sits at the southernmost (north case) /
# northernmost-mirrored (south case) 100 km row on the Greenwich meridian.
# Golden vectors: the reference's own testEncodeUPS/testDecodeUPS fixtures
# (Gt/MilitaryGridReferenceSystemTest.java:398,436).

_POLAR_COLS = "ABCFGHJKLPQRSTUXYZ"        # 18 letters
_POLAR_ROWS = "ABCDEFGHJKLMNPQRSTUVWXYZ"  # 24 letters (no I, O)
_UPS_OFFSETS = None


def _ups_offsets():
    """(north_offset, south_offset): rows to subtract so row letter 'A'
    anchors at the UPS boundary parallels on the Greenwich meridian —
    derived numerically from the engine's own UPS kernels, exactly the
    reference's polarOffset() computation."""
    global _UPS_OFFSETS
    if _UPS_OFFSETS is None:
        from .projections import CRS_REGISTRY

        north = CRS_REGISTRY["EPSG:5041"]
        south = CRS_REGISTRY["EPSG:5042"]
        n_n = float(north.forward(np.array([0.0]), np.array([84.0]))[1][0])
        n_s = float(south.forward(np.array([0.0]), np.array([-80.0]))[1][0])
        _UPS_OFFSETS = (int(np.floor(n_n / 1e5)),
                        int(np.floor((4e6 - n_s) / 1e5)))
    return _UPS_OFFSETS


def mgrs_encode_polar_ups(e: float, n_: float, north: bool, west: bool,
                          precision: int = 5) -> str:
    """Polar MGRS from UPS coordinates (the reference Coder's input shape
    for its testEncodeUPS fixtures)."""
    col = int(e // 100000) - 20
    if west:  # west half counts down from Z
        col += len(_POLAR_COLS)
    if not (0 <= col < len(_POLAR_COLS)):
        raise ValueError("outside the UPS MGRS domain")
    noff, soff = _ups_offsets()
    row = int(n_ // 100000) - (noff if north else soff)
    if not (0 <= row < len(_POLAR_ROWS)):
        raise ValueError("outside the UPS MGRS domain")
    zone = ("Y" if west else "Z") if north else ("A" if west else "B")
    step = 10 ** (5 - precision)
    de = int((e % 100000) // step)
    dn = int((n_ % 100000) // step)
    return (f"{zone}{_POLAR_COLS[col]}{_POLAR_ROWS[row]}"
            f"{de:0{precision}d}{dn:0{precision}d}")


def mgrs_encode_polar(lon: float, lat: float, precision: int = 5) -> str:
    from .projections import CRS_REGISTRY

    north = lat >= 0
    crs = CRS_REGISTRY["EPSG:5041" if north else "EPSG:5042"]
    x, y = crs.forward(np.array([lon]), np.array([lat]))
    return mgrs_encode_polar_ups(
        float(x[0]), float(y[0]), north, not (lon >= 0.0), precision)


def mgrs_decode_polar(ref: str):
    """Polar MGRS -> (lon, lat, (UPS easting, northing)) of the cell
    center (the reference Decoder's position contract)."""
    from .projections import CRS_REGISTRY

    zone = ref[0].upper()
    if zone not in "ABYZ":
        raise ValueError(f"not a polar MGRS reference: {ref!r}")
    north = zone in "YZ"
    west = zone in "AY"
    col = _POLAR_COLS.index(ref[1].upper())
    if west:
        col -= len(_POLAR_COLS)
    col += 20
    noff, soff = _ups_offsets()
    row = _POLAR_ROWS.index(ref[2].upper()) + (noff if north else soff)
    digits = ref[3:]
    precision = len(digits) // 2
    step = 10 ** (5 - precision)
    de = int(digits[:precision]) * step if precision else 0
    dn = int(digits[precision:]) * step if precision else 0
    e = col * 100000.0 + de + step * 0.5
    n_ = row * 100000.0 + dn + step * 0.5
    crs = CRS_REGISTRY["EPSG:5041" if north else "EPSG:5042"]
    lon, lat = crs.inverse(np.array([e]), np.array([n_]))
    return float(lon[0]), float(lat[0]), (e, n_)
