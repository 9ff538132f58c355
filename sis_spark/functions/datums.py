"""EPSG top-20 registry: non-WGS84 datums routed through Helmert.

The reference resolves ANY EPSG pair through its operation registry with
datum shifts (R/referencing/CRS.java:731,
R/referencing/operation/CoordinateOperationFinder.java:128 — Bursa-Wolf
parameters via R/referencing/datum/BursaWolfParameters.java).  This module
is the data-driven slice of that machinery for the most-used national
grids: a parameter table of PUBLIC EPSG values (ellipsoid constants,
7-parameter position-vector transformations, projection parameters) routed
through three kernels — the generalized Karney Transverse Mercator, the
EPSG 9809 Oblique (double) Stereographic, and the Swiss Oblique Mercator
(EPSG 9815 as deployed by swisstopo) — plus the existing LCC/LAEA/PS
kernels in projections.py.

Datum pipeline (the CoordinateOperationFinder two-step through WGS84):

    WGS84 geodetic -> geocentric XYZ -> Helmert (inverse: negated params,
    the EPSG convention for reversing a 7-param transformation) ->
    geodetic on the local ellipsoid (Bowring's closed-form, no iteration —
    both engines evaluate the identical expression, so the oracle matches
    bit-for-bit regardless of the formula's sub-mm absolute error) ->
    projection kernel.

All vectorized numpy; every kernel has an SQL emitter mirroring its IEEE
op order for the DuckDB oracle gates (hyperbolics are composed from
exp/ln in SQL — DuckDB has none — which costs ~1 ulp vs libm; the gates'
irrational-shift meter floor absorbs that, same discipline as the LCC
gate's documented pow/tan ulp tolerance).
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ ellipsoids
# (a, 1/f inverse flattening) — public EPSG ellipsoid table values.
WGS84_E = (6378137.0, 298.257223563)
GRS80_E = (6378137.0, 298.257222101)
AIRY1830 = (6377563.396, 299.3249646)
BESSEL1841 = (6377397.155, 299.1528128)
INTL1924 = (6378388.0, 297.0)


def _ell(ell):
    a, invf = ell
    f = 1.0 / invf
    e2 = f * (2.0 - f)
    return a, f, e2


# ------------------------------------------------ geodetic <-> geocentric

def geodetic_to_geocentric(lon, lat, ell):
    """Degrees (h=0) -> geocentric meters on ``ell``."""
    a, _f, e2 = _ell(ell)
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    s = np.sin(phi)
    c = np.cos(phi)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    return nu * c * np.cos(lam), nu * c * np.sin(lam), nu * (1.0 - e2) * s


def geocentric_to_geodetic(X, Y, Z, ell):
    """Geocentric meters -> degrees (h dropped) on ``ell``.

    Bowring's single-step closed form: no iteration, so Spark and the SQL
    oracle share the exact expression; absolute error is sub-millimeter
    for earth-surface points, and parity is what the gates check."""
    a, f, e2 = _ell(ell)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.sqrt(X * X + Y * Y)
    th = np.arctan2(Z * a, p * b)
    st, ct = np.sin(th), np.cos(th)
    phi = np.arctan2(Z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct)
    lam = np.arctan2(Y, X)
    return np.degrees(lam), np.degrees(phi)


_ARCSEC = np.pi / (180.0 * 3600.0)


def helmert_xyz(X, Y, Z, p: dict, inverse: bool = False):
    """Position-vector 7-parameter transformation (EPSG 9606):
    tx/ty/tz meters, rx/ry/rz ARCSECONDS, ds ppm.  ``inverse`` negates the
    parameters — the EPSG small-angle convention for the reverse
    transformation."""
    sgn = -1.0 if inverse else 1.0
    tx, ty, tz = sgn * p["tx"], sgn * p["ty"], sgn * p["tz"]
    rx, ry, rz = (sgn * p["rx"] * _ARCSEC, sgn * p["ry"] * _ARCSEC,
                  sgn * p["rz"] * _ARCSEC)
    m = 1.0 + sgn * p["ds"] * 1e-6
    Xp = m * X - rz * Y + ry * Z + tx
    Yp = rz * X + m * Y - rx * Z + ty
    Zp = -ry * X + rx * Y + m * Z + tz
    return Xp, Yp, Zp


class Datum:
    """Local ellipsoid + Helmert-to-WGS84; ``helmert=None`` marks datums
    equivalent to WGS84 at this accuracy tier (ETRS89, NAD83, GDA94...)."""

    def __init__(self, ell, helmert: dict | None = None):
        self.ell = ell
        self.helmert = helmert

    def from_wgs84(self, lon, lat):
        if self.helmert is None:
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
        X, Y, Z = geodetic_to_geocentric(lon, lat, WGS84_E)
        X, Y, Z = helmert_xyz(X, Y, Z, self.helmert, inverse=True)
        return geocentric_to_geodetic(X, Y, Z, self.ell)

    def to_wgs84(self, lon, lat):
        if self.helmert is None:
            return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
        X, Y, Z = geodetic_to_geocentric(lon, lat, self.ell)
        X, Y, Z = helmert_xyz(X, Y, Z, self.helmert, inverse=False)
        return geocentric_to_geodetic(X, Y, Z, WGS84_E)


# Published position-vector parameter sets (EPSG registry values; the
# single-Helmert national sets, NOT grid transformations — accuracy is the
# EPSG-documented ~1-5 m tier, exactly the reference's BursaWolf path when
# no grid file is installed).
ETRS89 = Datum(GRS80_E)  # == WGS84 at this tier
OSGB36 = Datum(AIRY1830, dict(  # EPSG 1314 (UK, ~2 m)
    tx=446.448, ty=-125.157, tz=542.060,
    rx=0.1502, ry=0.2470, rz=0.8421, ds=-20.4894))
AMERSFOORT = Datum(BESSEL1841, dict(  # EPSG 15934 (Netherlands)
    tx=565.417, ty=50.3319, tz=465.552,
    rx=-0.398957, ry=0.343988, rz=-1.87740, ds=4.0725))
BD72 = Datum(INTL1924, dict(  # EPSG 15929 (Belgium)
    tx=-106.8686, ty=52.2978, tz=-103.7239,
    rx=0.3366, ry=-0.4570, rz=1.8422, ds=-1.2747))
CH1903_PLUS = Datum(BESSEL1841, dict(  # EPSG 1676 (Switzerland, translation-only)
    tx=674.374, ty=15.056, tz=405.346, rx=0.0, ry=0.0, rz=0.0, ds=0.0))
DHDN = Datum(BESSEL1841, dict(  # EPSG 1777 (Germany west)
    tx=598.1, ty=73.7, tz=418.2, rx=0.202, ry=0.045, rz=-2.455, ds=6.7))
ED50 = Datum(INTL1924, dict(  # EPSG 1133 (mean European, translation-only)
    tx=-87.0, ty=-98.0, tz=-121.0, rx=0.0, ry=0.0, rz=0.0, ds=0.0))


# ------------------------------------------- generalized Transverse Mercator

def _tm_consts(ell):
    a, f, _e2 = _ell(ell)
    n = f / (2.0 - f)
    A = a / (1.0 + n) * (1.0 + n ** 2 / 4.0 + n ** 4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n ** 2 / 3.0 + 5.0 * n ** 3 / 16.0 + 41.0 * n ** 4 / 180.0,
        13.0 * n ** 2 / 48.0 - 3.0 * n ** 3 / 5.0 + 557.0 * n ** 4 / 1440.0,
        61.0 * n ** 3 / 240.0 - 103.0 * n ** 4 / 140.0,
        49561.0 * n ** 4 / 161280.0,
    )
    beta = (
        n / 2.0 - 2.0 * n ** 2 / 3.0 + 37.0 * n ** 3 / 96.0 - n ** 4 / 360.0,
        n ** 2 / 48.0 + n ** 3 / 15.0 - 437.0 * n ** 4 / 1440.0,
        17.0 * n ** 3 / 480.0 - 37.0 * n ** 4 / 840.0,
        4397.0 * n ** 4 / 161280.0,
    )
    delta = (
        2.0 * n - 2.0 * n ** 2 / 3.0 - 2.0 * n ** 3 + 116.0 * n ** 4 / 45.0,
        7.0 * n ** 2 / 3.0 - 8.0 * n ** 3 / 5.0 - 227.0 * n ** 4 / 45.0,
        56.0 * n ** 3 / 15.0 - 136.0 * n ** 4 / 35.0,
        4279.0 * n ** 4 / 630.0,
    )
    two_rtn = 2.0 * np.sqrt(n) / (1.0 + n)
    return A, alpha, beta, delta, two_rtn


class TransverseMercator:
    """Karney-series TM on any ellipsoid with natural origin (lat0, lon0),
    scale k0, false easting/northing — the generalized kernel behind
    EPSG 9807 deployments (OSGB, Gauss-Krueger, ETRS89/UTM, NZTM...).
    Same series as functions/utm.py (n^4 truncation, sub-micrometer on
    UTM-width zones); utm.py stays the WGS84 fast path."""

    def __init__(self, lat0, lon0, k0, fe, fn, ell):
        self.lat0, self.lon0, self.k0 = float(lat0), float(lon0), float(k0)
        self.fe, self.fn = float(fe), float(fn)
        self.ell = ell
        self.A, self.alpha, self.beta, self.delta, self.two_rtn = _tm_consts(ell)
        # meridian-arc northing of the natural origin (lam = 0)
        if lat0 != 0.0:
            _x0, y0 = self._raw_forward(np.asarray([lon0]), np.asarray([lat0]))
            self.m0 = float(y0[0])
        else:
            self.m0 = 0.0

    def _raw_forward(self, lon, lat):
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, np.float64))
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.two_rtn * np.arctanh(self.two_rtn * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, a in enumerate(self.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.k0 * self.A * eta, self.k0 * self.A * xi

    def forward(self, lon, lat):
        x, y = self._raw_forward(lon, lat)
        return x + self.fe, y - self.m0 + self.fn

    def inverse(self, x, y):
        eta = (np.asarray(x, np.float64) - self.fe) / (self.k0 * self.A)
        xi = (np.asarray(y, np.float64) - self.fn + self.m0) / (self.k0 * self.A)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for j, d in enumerate(self.delta, start=1):
            phi += d * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(lam) + self.lon0, np.degrees(phi)


# --------------------------------------- Oblique Stereographic (EPSG 9809)

class ObliqueStereographic:
    """Double stereographic (ellipsoid -> conformal sphere -> plane), the
    RD New / Amersfoort projection method (EPSG Guidance Note 7-2 formulas,
    R/operation/projection/ObliqueStereographic.java semantics)."""

    def __init__(self, lat0, lon0, k0, fe, fn, ell):
        a, f, e2 = _ell(ell)
        self.a, self.e2 = a, e2
        self.e = np.sqrt(e2)
        self.lat0 = float(lat0)
        self.ell = ell
        self.lon0, self.k0, self.fe, self.fn = float(lon0), float(k0), float(fe), float(fn)
        phi0 = np.radians(float(lat0))
        s0 = np.sin(phi0)
        c0 = np.cos(phi0)
        rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
        nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
        self.R = np.sqrt(rho0 * nu0)
        self.n = np.sqrt(1.0 + (e2 * c0 ** 4) / (1.0 - e2))
        S1 = (1.0 + s0) / (1.0 - s0)
        S2 = (1.0 - self.e * s0) / (1.0 + self.e * s0)
        w1 = (S1 * S2 ** self.e) ** self.n
        sin_chi0 = (w1 - 1.0) / (w1 + 1.0)
        self.c = ((self.n + s0) * (1.0 - sin_chi0)) / ((self.n - s0) * (1.0 + sin_chi0))
        w2 = self.c * w1
        self.chi0 = np.arcsin((w2 - 1.0) / (w2 + 1.0))
        self.lam0 = np.radians(float(lon0))

    def _conformal(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        s = np.sin(phi)
        Sa = (1.0 + s) / (1.0 - s)
        Sb = (1.0 - self.e * s) / (1.0 + self.e * s)
        w = self.c * (Sa * Sb ** self.e) ** self.n
        chi = np.arcsin((w - 1.0) / (w + 1.0))
        Lam = self.n * (lam - self.lam0) + self.lam0
        return chi, Lam

    def forward(self, lon, lat):
        chi, Lam = self._conformal(lon, lat)
        dl = Lam - self.lam0
        B = (1.0 + np.sin(chi) * np.sin(self.chi0)
             + np.cos(chi) * np.cos(self.chi0) * np.cos(dl))
        x = self.fe + 2.0 * self.R * self.k0 * np.cos(chi) * np.sin(dl) / B
        y = self.fn + 2.0 * self.R * self.k0 * (
            np.sin(chi) * np.cos(self.chi0)
            - np.cos(chi) * np.sin(self.chi0) * np.cos(dl)) / B
        return x, y

    def inverse(self, x, y):
        g = 2.0 * self.R * self.k0 * np.tan(np.pi / 4.0 - self.chi0 / 2.0)
        h = 4.0 * self.R * self.k0 * np.tan(self.chi0) + g
        dx = np.asarray(x, np.float64) - self.fe
        dy = np.asarray(y, np.float64) - self.fn
        i = np.arctan2(dx, h + dy)
        j = np.arctan2(dx, g - dy) - i
        chi = self.chi0 + 2.0 * np.arctan2(
            dy - dx * np.tan(j / 2.0), 2.0 * self.R * self.k0)
        Lam = j + 2.0 * i + self.lam0
        lam = (Lam - self.lam0) / self.n + self.lam0
        # conformal -> geodetic latitude: fixed-point on the isometric
        # latitude (EPSG's iterative psi inversion, 4 rounds to fp precision)
        psi = 0.5 * np.log((1.0 + np.sin(chi)) / (self.c * (1.0 - np.sin(chi)))) / self.n
        phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
        for _ in range(4):
            s = np.sin(phi)
            psi_i = np.log(
                np.tan(phi / 2.0 + np.pi / 4.0)
                * ((1.0 - self.e * s) / (1.0 + self.e * s)) ** (self.e / 2.0))
            phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - self.e2 * s * s) / (1.0 - self.e2)
        return np.degrees(lam), np.degrees(phi)


# ------------------------------------- Swiss Oblique Mercator (EPSG 9815*)

class SwissObliqueMercator:
    """The swisstopo double projection (ellipsoid -> conformal sphere ->
    equator-rotated sphere -> Mercator): CH1903/LV03 and CH1903+/LV95.
    Public swisstopo formulas (rigorous, not the approximate polynomials)."""

    def __init__(self, lat0, lon0, fe, fn, ell):
        a, f, e2 = _ell(ell)
        self.e2 = e2
        self.e = np.sqrt(e2)
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.ell = ell
        self.fe, self.fn = float(fe), float(fn)
        phi0 = np.radians(float(lat0))
        self.lam0 = np.radians(float(lon0))
        s0 = np.sin(phi0)
        self.alpha = np.sqrt(1.0 + (e2 / (1.0 - e2)) * np.cos(phi0) ** 4)
        self.Rsph = a * np.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
        self.b0 = np.arcsin(s0 / self.alpha)
        self.K = (np.log(np.tan(np.pi / 4.0 + self.b0 / 2.0))
                  - self.alpha * np.log(np.tan(np.pi / 4.0 + phi0 / 2.0))
                  + self.alpha * self.e / 2.0
                  * np.log((1.0 + self.e * s0) / (1.0 - self.e * s0)))

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64))
        s = np.sin(phi)
        S = (self.alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
             - self.alpha * self.e / 2.0
             * np.log((1.0 + self.e * s) / (1.0 - self.e * s)) + self.K)
        b = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)
        ell_ = self.alpha * (lam - self.lam0)
        # rotate to the pseudo-equator system
        bbar = np.arcsin(np.cos(self.b0) * np.sin(b)
                         - np.sin(self.b0) * np.cos(b) * np.cos(ell_))
        lbar = np.arctan2(np.sin(ell_) * np.cos(b),
                          np.cos(self.b0) * np.cos(b) * np.cos(ell_)
                          + np.sin(self.b0) * np.sin(b))
        y = self.Rsph * lbar
        x = self.Rsph / 2.0 * np.log((1.0 + np.sin(bbar)) / (1.0 - np.sin(bbar)))
        return y + self.fe, x + self.fn

    def inverse(self, E, N):
        Y = (np.asarray(E, np.float64) - self.fe) / self.Rsph
        X = (np.asarray(N, np.float64) - self.fn) / self.Rsph
        bbar = 2.0 * (np.arctan(np.exp(X)) - np.pi / 4.0)
        lbar = Y
        b = np.arcsin(np.cos(self.b0) * np.sin(bbar)
                      + np.sin(self.b0) * np.cos(bbar) * np.cos(lbar))
        ell_ = np.arctan2(np.sin(lbar) * np.cos(bbar),
                          np.cos(self.b0) * np.cos(bbar) * np.cos(lbar)
                          - np.sin(self.b0) * np.sin(bbar))
        lam = self.lam0 + ell_ / self.alpha
        # sphere -> ellipsoid latitude: fixed-point (swisstopo iteration)
        S = np.log(np.tan(np.pi / 4.0 + b / 2.0))
        phi = b.copy() if isinstance(b, np.ndarray) else np.asarray(b)
        for _ in range(6):
            s = np.sin(phi)
            phi = 2.0 * np.arctan(np.exp(
                (S - self.K) / self.alpha
                + self.e / 2.0 * np.log((1.0 + self.e * s) / (1.0 - self.e * s))
            )) - np.pi / 2.0
        return np.degrees(lam), np.degrees(phi)


# ------------------------------------------------- datum-projected wrapper

class DatumProjected:
    """Projection kernel on its own datum, exposed in the registry's WGS84
    hub convention: forward consumes WGS84 degrees, inverse returns them."""

    def __init__(self, proj, datum: Datum):
        self.proj = proj
        self.datum = datum

    def forward(self, lon, lat):
        dl, dp = self.datum.from_wgs84(lon, lat)
        return self.proj.forward(dl, dp)

    def inverse(self, x, y):
        dl, dp = self.proj.inverse(x, y)
        return self.datum.to_wgs84(dl, dp)


class GeographicOnDatum:
    """A geographic CRS on a non-WGS84 datum (EPSG:4277 OSGB36 etc.):
    'projection' = the datum shift itself, coordinates stay degrees."""

    def __init__(self, datum: Datum):
        self.datum = datum

    def forward(self, lon, lat):
        return self.datum.from_wgs84(lon, lat)

    def inverse(self, lon, lat):
        return self.datum.to_wgs84(lon, lat)


def registry_entries() -> dict:
    """The EPSG top-20 additions (public parameter values)."""
    return {
        # --- ETRS89 / NAD83-tier (datum == WGS84 here) TM grids
        "EPSG:25832": TransverseMercator(0.0, 9.0, 0.9996, 500000.0, 0.0, GRS80_E),
        "EPSG:25833": TransverseMercator(0.0, 15.0, 0.9996, 500000.0, 0.0, GRS80_E),
        "EPSG:3067": TransverseMercator(0.0, 27.0, 0.9996, 500000.0, 0.0, GRS80_E),   # TM35FIN
        "EPSG:2193": TransverseMercator(0.0, 173.0, 0.9996, 1600000.0, 10000000.0, GRS80_E),  # NZTM2000
        # --- British National Grid: Airy 1830 + OSGB36 Helmert
        "EPSG:27700": DatumProjected(
            TransverseMercator(49.0, -2.0, 0.9996012717, 400000.0, -100000.0, AIRY1830),
            OSGB36),
        # --- RD New: Bessel 1841 oblique stereographic + Amersfoort Helmert
        "EPSG:28992": DatumProjected(
            ObliqueStereographic(52.15616055555555, 5.38763888888889,
                                 0.9999079, 155000.0, 463000.0, BESSEL1841),
            AMERSFOORT),
        # --- Belgian Lambert 72: Intl 1924 LCC 2SP + BD72 Helmert
        # (projections.LambertConformal2SP imported lazily to avoid cycle)
        # added in _belgian() below
        # --- LV95: Bessel 1841 Swiss oblique Mercator + CH1903+ translation
        "EPSG:2056": DatumProjected(
            SwissObliqueMercator(46.95240555555556, 7.439583333333333,
                                 2600000.0, 1200000.0, BESSEL1841),
            CH1903_PLUS),
        # LV03 (legacy Swiss grid: same kernel, old false origin, same datum
        # at this accuracy tier)
        "EPSG:21781": DatumProjected(
            SwissObliqueMercator(46.95240555555556, 7.439583333333333,
                                 600000.0, 200000.0, BESSEL1841),
            CH1903_PLUS),
        # --- DHDN Gauss-Krueger zones 3/4 (Bessel + DHDN Helmert)
        "EPSG:31467": DatumProjected(
            TransverseMercator(0.0, 9.0, 1.0, 3500000.0, 0.0, BESSEL1841), DHDN),
        "EPSG:31468": DatumProjected(
            TransverseMercator(0.0, 12.0, 1.0, 4500000.0, 0.0, BESSEL1841), DHDN),
        # --- ED50 / UTM 31N..33N (Intl 1924 + mean-European translation)
        "EPSG:23031": DatumProjected(
            TransverseMercator(0.0, 3.0, 0.9996, 500000.0, 0.0, INTL1924), ED50),
        "EPSG:23032": DatumProjected(
            TransverseMercator(0.0, 9.0, 0.9996, 500000.0, 0.0, INTL1924), ED50),
        "EPSG:23033": DatumProjected(
            TransverseMercator(0.0, 15.0, 0.9996, 500000.0, 0.0, INTL1924), ED50),
        # --- geographic CRS on shifted datums
        "EPSG:4277": GeographicOnDatum(OSGB36),     # OSGB36
        "EPSG:4230": GeographicOnDatum(ED50),       # ED50
        "EPSG:4289": GeographicOnDatum(AMERSFOORT),  # Amersfoort
        "EPSG:4258": GeographicOnDatum(ETRS89),     # ETRS89 (identity tier)
    }


def _belgian():
    from .projections import INTL1924_P, LambertConformal2SP  # noqa: F401

    return DatumProjected(
        LambertConformal2SP(51.16666723333333, 49.8333339, 90.0,
                            4.367486666666666, 150000.013, 5400088.438,
                            INTL1924_P),
        BD72)


# ------------------------------------------------------------ SQL emitters
#
# DuckDB oracle re-derivations mirroring the numpy op order (the
# lcc_transform discipline).  DuckDB lacks hyperbolics, so sinh/cosh/atanh
# are composed from exp/ln — a ~1-ulp departure from libm that the gates'
# irrational-shift meter floor absorbs.  Each emitter returns a chain of
# CTE stages over an input relation carrying (event_id, lon, lat).

def _fl(v) -> str:
    from .. import synth

    return synth.flit(float(v))


def datum_shift_sql(datum: Datum, rel: str) -> str:
    """CTE chain: WGS84 (lon, lat) in ``rel`` -> (event_id, dlon, dlat) on
    the datum — geocentric, negated-parameter Helmert, Bowring.  Mirrors
    Datum.from_wgs84 term for term."""
    if datum.helmert is None:
        # WGS84-equivalent tier (ETRS89 &c.): mirror from_wgs84's identity
        # branch with a pass-through CTE
        return f"""
__d AS (
  SELECT event_id, lon AS dlon, lat AS dlat
  FROM {rel})"""
    aw, _fw, e2w = _ell(WGS84_E)
    a2, f2, e22 = _ell(datum.ell)
    b2 = a2 * (1.0 - f2)
    ep2 = e22 / (1.0 - e22)
    p = datum.helmert
    tx, ty, tz = -p["tx"], -p["ty"], -p["tz"]
    rx, ry, rz = -p["rx"] * _ARCSEC, -p["ry"] * _ARCSEC, -p["rz"] * _ARCSEC
    m = 1.0 - p["ds"] * 1e-6
    return f"""
__g AS (
  SELECT event_id,
         __nu * __c * cos(radians(lon)) AS gx,
         __nu * __c * sin(radians(lon)) AS gy,
         __nu * {_fl(1.0 - e2w)} * __s AS gz
  FROM (SELECT event_id, lon, lat,
               sin(radians(lat)) AS __s, cos(radians(lat)) AS __c,
               {_fl(aw)} / sqrt(1.0e0 - {_fl(e2w)} * sin(radians(lat)) * sin(radians(lat))) AS __nu
        FROM {rel}) __q),
__h AS (
  SELECT event_id,
         {_fl(m)} * gx - ({_fl(rz)}) * gy + ({_fl(ry)}) * gz + ({_fl(tx)}) AS hx,
         ({_fl(rz)}) * gx + {_fl(m)} * gy - ({_fl(rx)}) * gz + ({_fl(ty)}) AS hy,
         -({_fl(ry)}) * gx + ({_fl(rx)}) * gy + {_fl(m)} * gz + ({_fl(tz)}) AS hz
  FROM __g),
__d AS (
  SELECT event_id,
         degrees(atan2(hy, hx)) AS dlon,
         degrees(atan2(hz + {_fl(ep2 * b2)} * __st * __st * __st,
                       __pp - {_fl(e22 * a2)} * __ct * __ct * __ct)) AS dlat
  FROM (SELECT *, sin(__th) AS __st, cos(__th) AS __ct
        FROM (SELECT *, atan2(hz * {_fl(a2)}, __pp * {_fl(b2)}) AS __th
              FROM (SELECT *, sqrt(hx * hx + hy * hy) AS __pp FROM __h) __h1) __h2) __h3)"""


_SINH = "((exp({u}) - exp(-({u}))) / 2.0e0)"
_COSH = "((exp({u}) + exp(-({u}))) / 2.0e0)"
_ATANH = "(0.5e0 * ln((1.0e0 + {z}) / (1.0e0 - {z})))"


def tm_forward_sql(tm: TransverseMercator, rel: str,
                   lon_col: str = "dlon", lat_col: str = "dlat") -> str:
    """CTE chain: (event_id, lon/lat on the kernel's datum) in ``rel`` ->
    (event_id, px, py) projected meters.  Mirrors TransverseMercator
    forward (Karney series) with composed hyperbolics."""
    at1 = _ATANH.format(z=f"sin(radians({lat_col}))")
    at2 = _ATANH.format(z=f"({_fl(tm.two_rtn)} * sin(radians({lat_col})))")
    u = f"({at1} - {_fl(tm.two_rtn)} * {at2})"
    xi_terms = " + ".join(
        f"{_fl(a)} * sin({_fl(2.0 * j)} * __xip) * " + _COSH.format(u=f"({_fl(2.0 * j)} * __etap)")
        for j, a in enumerate(tm.alpha, start=1))
    eta_terms = " + ".join(
        f"{_fl(a)} * cos({_fl(2.0 * j)} * __xip) * " + _SINH.format(u=f"({_fl(2.0 * j)} * __etap)")
        for j, a in enumerate(tm.alpha, start=1))
    kA = tm.k0 * tm.A
    return f"""
__t AS (
  SELECT event_id, {_SINH.format(u=u)} AS __tt,
         radians({lon_col} - ({_fl(tm.lon0)})) AS __lam
  FROM {rel}),
__xe AS (
  SELECT event_id,
         atan2(__tt, cos(__lam)) AS __xip,
         {_ATANH.format(z="(sin(__lam) / sqrt(1.0e0 + __tt * __tt))")} AS __etap
  FROM __t),
__p AS (
  SELECT event_id,
         ({_fl(tm.fe)}) + {_fl(kA)} * (__etap + {eta_terms}) AS px,
         ({_fl(tm.fn)}) - ({_fl(tm.m0)}) + {_fl(kA)} * (__xip + {xi_terms}) AS py
  FROM __xe)"""


def oblique_stereo_sql(os_: ObliqueStereographic, rel: str,
                       lon_col: str = "dlon", lat_col: str = "dlat") -> str:
    """CTE chain mirroring ObliqueStereographic.forward."""
    e = float(os_.e)
    return f"""
__cf AS (
  SELECT event_id,
         asin((__w - 1.0e0) / (__w + 1.0e0)) AS __chi,
         {_fl(os_.n)} * (radians({lon_col}) - ({_fl(os_.lam0)})) AS __dl
  FROM (SELECT event_id, {lon_col},
               {_fl(os_.c)} * pow(((1.0e0 + __s) / (1.0e0 - __s))
                   * pow((1.0e0 - {_fl(e)} * __s) / (1.0e0 + {_fl(e)} * __s), {_fl(e)}),
                   {_fl(os_.n)}) AS __w
        FROM (SELECT event_id, {lon_col}, sin(radians({lat_col})) AS __s FROM {rel}) __q0) __q1),
__p AS (
  SELECT event_id,
         ({_fl(os_.fe)}) + {_fl(2.0 * os_.R * os_.k0)} * cos(__chi) * sin(__dl) / __B AS px,
         ({_fl(os_.fn)}) + {_fl(2.0 * os_.R * os_.k0)}
           * (sin(__chi) * {_fl(np.cos(os_.chi0))}
              - cos(__chi) * {_fl(np.sin(os_.chi0))} * cos(__dl)) / __B AS py
  FROM (SELECT *, 1.0e0 + sin(__chi) * {_fl(np.sin(os_.chi0))}
               + cos(__chi) * {_fl(np.cos(os_.chi0))} * cos(__dl) AS __B
        FROM __cf) __q2)"""


def swiss_sql(sw: SwissObliqueMercator, rel: str,
              lon_col: str = "dlon", lat_col: str = "dlat") -> str:
    """CTE chain mirroring SwissObliqueMercator.forward."""
    e = float(sw.e)
    return f"""
__sb AS (
  SELECT event_id,
         2.0e0 * (atan(exp(
             {_fl(sw.alpha)} * ln(tan(pi() / 4.0e0 + radians({lat_col}) / 2.0e0))
             - {_fl(sw.alpha * e / 2.0)}
               * ln((1.0e0 + {_fl(e)} * sin(radians({lat_col})))
                    / (1.0e0 - {_fl(e)} * sin(radians({lat_col}))))
             + ({_fl(sw.K)}))) - pi() / 4.0e0) AS __b,
         {_fl(sw.alpha)} * (radians({lon_col}) - ({_fl(sw.lam0)})) AS __l
  FROM {rel}),
__rot AS (
  SELECT event_id,
         asin({_fl(np.cos(sw.b0))} * sin(__b)
              - {_fl(np.sin(sw.b0))} * cos(__b) * cos(__l)) AS __bb,
         atan2(sin(__l) * cos(__b),
               {_fl(np.cos(sw.b0))} * cos(__b) * cos(__l)
               + {_fl(np.sin(sw.b0))} * sin(__b)) AS __lb
  FROM __sb),
__p AS (
  SELECT event_id,
         {_fl(sw.Rsph)} * __lb + ({_fl(sw.fe)}) AS px,
         {_fl(sw.Rsph)} / 2.0e0
           * ln((1.0e0 + sin(__bb)) / (1.0e0 - sin(__bb))) + ({_fl(sw.fn)}) AS py
  FROM __rot)"""


def lcc_forward_sql(p, rel: str, lon_col: str = "dlon", lat_col: str = "dlat") -> str:
    """CTE chain mirroring projections.LambertConformal2SP.forward (the
    lcc_transform oracle's expressions, parametrized for datum input)."""
    e = float(p.e)
    t = (f"(tan(pi()/4.0 - radians({lat_col})/2.0) / "
         f"pow((1.0 - {_fl(e)} * sin(radians({lat_col}))) / "
         f"(1.0 + {_fl(e)} * sin(radians({lat_col}))), {_fl(e)} / 2.0))")
    return f"""
__p AS (
  SELECT event_id,
         ({_fl(p.fe)}) + __rho * sin(__th) AS px,
         ({_fl(p.fn)}) + ({_fl(p.rho0)}) - __rho * cos(__th) AS py
  FROM (SELECT event_id,
               {_fl(p.a)} * {_fl(p.F)} * pow({t}, {_fl(p.n)}) AS __rho,
               {_fl(p.n)} * radians({lon_col} - ({_fl(p.lon0)})) AS __th
        FROM {rel}) __q)"""


# ------------------------------------- grid-interpolation datum shift (r4)
#
# The reference's high-accuracy tier interpolates per-point offsets from a
# shift grid (R/referencing/operation/transform/DatumShiftGrid.java:
# interpolateAt -> interpolateInCell bilinear over grid coordinates;
# loaded from NTv2 .gsb / OSTN15 files by DatumShiftGridFile).  This class
# is that machinery: a regular lon/lat grid of (dlon, dlat) arcsecond
# offsets, bilinear interpolation, iterative inverse — with a
# deterministic synthetic grid standing in for the real files (which are
# licensed data, not shipped; plugging an NTv2 parse into ``slon/slat``
# is sources/ntv2.py).

class ShiftGrid:
    """Regular shift grid: origin (lon0, lat0) = SW node, spacing
    (dlon, dlat) degrees, node arrays ``slon/slat`` of shape (ny, nx) in
    POSITIVE-EAST arcseconds.  ``to_wgs84`` adds the interpolated shift
    (source datum -> WGS84, the NTv2 forward convention); ``from_wgs84``
    inverts by fixed-point iteration (the DatumShiftGrid.inverse loop,
    4 rounds — sub-mm for real-world shift magnitudes)."""

    def __init__(self, lon0: float, lat0: float, dlon: float, dlat: float,
                 slon: np.ndarray, slat: np.ndarray):
        self.lon0, self.lat0 = float(lon0), float(lat0)
        self.dlon, self.dlat = float(dlon), float(dlat)
        self.slon = np.asarray(slon, np.float64)
        self.slat = np.asarray(slat, np.float64)
        if self.slon.shape != self.slat.shape or self.slon.ndim != 2:
            raise ValueError("slon/slat must be equal-shape 2-D arrays")
        self.ny, self.nx = self.slon.shape

    def interpolate(self, lon, lat):
        """Bilinear (slon, slat) arcseconds at each point; outside the grid
        the edge cell extrapolates via clamping (DatumShiftGridFile's
        nearest-cell fallback)."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        gx = (lon - self.lon0) / self.dlon
        gy = (lat - self.lat0) / self.dlat
        ix = np.clip(np.floor(gx), 0, self.nx - 2).astype(np.int64)
        iy = np.clip(np.floor(gy), 0, self.ny - 2).astype(np.int64)
        fx = gx - ix
        fy = gy - iy
        out = []
        for g in (self.slon, self.slat):
            s00 = g[iy, ix]
            s10 = g[iy, ix + 1]
            s01 = g[iy + 1, ix]
            s11 = g[iy + 1, ix + 1]
            # the exact expression order the SQL oracle replays
            out.append((s00 * (1.0 - fx) + s10 * fx) * (1.0 - fy)
                       + (s01 * (1.0 - fx) + s11 * fx) * fy)
        return out[0], out[1]

    def to_wgs84(self, lon, lat):
        sx, sy = self.interpolate(lon, lat)
        return (np.asarray(lon, np.float64) + sx / 3600.0,
                np.asarray(lat, np.float64) + sy / 3600.0)

    def from_wgs84(self, lon, lat, iterations: int = 4):
        """Fixed-point inverse: x <- target - shift(x), seeded at the
        target (shift fields are smooth and tiny relative to cell size, so
        the iteration contracts; DatumShiftGrid.java's inverse loop)."""
        tlon = np.asarray(lon, np.float64)
        tlat = np.asarray(lat, np.float64)
        clon, clat = tlon.copy(), tlat.copy()
        for _ in range(iterations):
            sx, sy = self.interpolate(clon, clat)
            clon = tlon - sx / 3600.0
            clat = tlat - sy / 3600.0
        return clon, clat

    # -- deterministic synthetic grid (tests + oracle) ------------------

    @classmethod
    def synthetic(cls, lon0=-8.0, lat0=48.0, dlon=0.5, dlat=0.5,
                  nx=33, ny=25):
        """The gate's deterministic grid: node values from an integer
        formula with dyadic magnitudes (exact in float32 AND float64, so
        the NTv2 round-trip and the SQL oracle are both bit-exact):

            slon(ix, iy) = ((7*ix + 11*iy) % 13) * 0.25 - 1.5
            slat(ix, iy) = ((5*ix +  3*iy) % 11) * 0.25 - 1.25
        """
        ix = np.arange(nx, dtype=np.int64)[None, :]
        iy = np.arange(ny, dtype=np.int64)[:, None]
        slon = ((7 * ix + 11 * iy) % 13) * 0.25 - 1.5
        slat = ((5 * ix + 3 * iy) % 11) * 0.25 - 1.25
        return cls(lon0, lat0, dlon, dlat,
                   np.broadcast_to(slon, (ny, nx)).copy(),
                   np.broadcast_to(slat, (ny, nx)).copy())


class ShiftGridGroup:
    """Parent/child NTv2 sub-grid hierarchy — the DatumShiftGridGroup
    semantics (R/referencing/operation/transform/DatumShiftGridGroup.java:
    interpolateInCell selects the sub-grid of smallest cell size whose
    extent contains the point).  Selection rule here, SQL-replayable:

    * candidate sub-grids are those whose [lon0, lon_max] x [lat0, lat_max]
      extent contains the point (inclusive both edges);
    * the DENSEST candidate (smallest dlat*dlon cell area) wins; ties
      break on file order;
    * a point outside every sub-grid clamps into the FIRST (base) grid —
      the same edge-extrapolation a single grid applies.
    """

    def __init__(self, grids: list, names: list | None = None,
                 parents: list | None = None):
        if not grids:
            raise ValueError("ShiftGridGroup needs at least one sub-grid")
        self.grids = list(grids)
        self.names = list(names) if names else [
            f"SUB{i}" for i in range(len(grids))]
        self.parents = list(parents) if parents else (
            ["NONE"] + [self.names[0]] * (len(grids) - 1))
        self._order = sorted(
            range(len(self.grids)),
            key=lambda i: (self.grids[i].dlat * self.grids[i].dlon, i))

    def _extent(self, i: int):
        g = self.grids[i]
        return (g.lon0, g.lon0 + g.dlon * (g.nx - 1),
                g.lat0, g.lat0 + g.dlat * (g.ny - 1))

    def interpolate(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        ox = np.zeros_like(lon)
        oy = np.zeros_like(lat)
        assigned = np.zeros(lon.shape, bool)
        for i in self._order:
            x0, x1, y0, y1 = self._extent(i)
            m = (~assigned & (lon >= x0) & (lon <= x1)
                 & (lat >= y0) & (lat <= y1))
            if m.any():
                sx, sy = self.grids[i].interpolate(lon[m], lat[m])
                ox[m] = sx
                oy[m] = sy
                assigned |= m
        if not assigned.all():
            m = ~assigned
            sx, sy = self.grids[0].interpolate(lon[m], lat[m])
            ox[m] = sx
            oy[m] = sy
        return ox, oy

    def to_wgs84(self, lon, lat):
        sx, sy = self.interpolate(lon, lat)
        return (np.asarray(lon, np.float64) + sx / 3600.0,
                np.asarray(lat, np.float64) + sy / 3600.0)

    def from_wgs84(self, lon, lat, iterations: int = 4):
        tlon = np.asarray(lon, np.float64)
        tlat = np.asarray(lat, np.float64)
        clon, clat = tlon.copy(), tlat.copy()
        for _ in range(iterations):
            sx, sy = self.interpolate(clon, clat)
            clon = tlon - sx / 3600.0
            clat = tlat - sy / 3600.0
        return clon, clat

    @classmethod
    def synthetic(cls):
        """The multi-grid gate's deterministic hierarchy: the single-grid
        synthetic parent plus an aligned 4x-denser child over
        lon [-4, 2] x lat [52, 56] with its own dyadic node formula:

            slon(ix, iy) = ((3*ix + 5*iy) % 9) * 0.125 - 0.5
            slat(ix, iy) = ((2*ix + 7*iy) % 7) * 0.125 - 0.375
        """
        parent = ShiftGrid.synthetic()
        nx, ny = 49, 33
        ix = np.arange(nx, dtype=np.int64)[None, :]
        iy = np.arange(ny, dtype=np.int64)[:, None]
        slon = ((3 * ix + 5 * iy) % 9) * 0.125 - 0.5
        slat = ((2 * ix + 7 * iy) % 7) * 0.125 - 0.375
        child = ShiftGrid(-4.0, 52.0, 0.125, 0.125,
                          np.broadcast_to(slon, (ny, nx)).copy(),
                          np.broadcast_to(slat, (ny, nx)).copy())
        return cls([parent, child], names=["PARENT", "CHILD"],
                   parents=["NONE", "PARENT"])


def shift_grid_sql(g: ShiftGrid, rel: str) -> str:
    """CTE: WGS-datum (event_id, lon, lat) in ``rel`` -> (event_id, dlon,
    dlat) shifted TO WGS84 by the SYNTHETIC grid formula — replays
    ShiftGrid.synthetic's node formula and the bilinear expression order
    term for term (the oracle cannot read numpy arrays, so only the
    formula-defined grid is SQL-replayable; data-backed grids gate through
    pytest round-trips instead)."""
    return f"""
__gx AS (
  SELECT event_id, lon, lat,
         (lon - ({_fl(g.lon0)})) / {_fl(g.dlon)} AS gx,
         (lat - ({_fl(g.lat0)})) / {_fl(g.dlat)} AS gy
  FROM {rel}),
__gc AS (
  SELECT event_id, lon, lat, gx, gy,
         CAST(least(greatest(floor(gx), 0), {g.nx - 2}) AS BIGINT) AS ix,
         CAST(least(greatest(floor(gy), 0), {g.ny - 2}) AS BIGINT) AS iy
  FROM __gx),
__gf AS (
  SELECT event_id, lon, lat, ix, iy,
         gx - ix AS fx, gy - iy AS fy,
         ((7 * ix + 11 * iy) % 13) * 0.25e0 - 1.5e0 AS s00x,
         ((7 * (ix + 1) + 11 * iy) % 13) * 0.25e0 - 1.5e0 AS s10x,
         ((7 * ix + 11 * (iy + 1)) % 13) * 0.25e0 - 1.5e0 AS s01x,
         ((7 * (ix + 1) + 11 * (iy + 1)) % 13) * 0.25e0 - 1.5e0 AS s11x,
         ((5 * ix + 3 * iy) % 11) * 0.25e0 - 1.25e0 AS s00y,
         ((5 * (ix + 1) + 3 * iy) % 11) * 0.25e0 - 1.25e0 AS s10y,
         ((5 * ix + 3 * (iy + 1)) % 11) * 0.25e0 - 1.25e0 AS s01y,
         ((5 * (ix + 1) + 3 * (iy + 1)) % 11) * 0.25e0 - 1.25e0 AS s11y
  FROM __gc),
__d AS (
  SELECT event_id,
         lon + ((s00x * (1.0e0 - fx) + s10x * fx) * (1.0e0 - fy)
              + (s01x * (1.0e0 - fx) + s11x * fx) * fy) / 3600.0e0 AS dlon,
         lat + ((s00y * (1.0e0 - fx) + s10y * fx) * (1.0e0 - fy)
              + (s01y * (1.0e0 - fx) + s11y * fx) * fy) / 3600.0e0 AS dlat
  FROM __gf)"""


def shift_grid_group_sql(grp: ShiftGridGroup, rel: str) -> str:
    """CTE replaying ShiftGridGroup.synthetic(): per point, the child
    formula when the point lies inside the child extent (the densest-
    candidate rule — the child always wins where it applies), else the
    parent formula; identical bilinear expression order as shift_grid_sql
    in both branches."""
    par, chi = grp.grids[0], grp.grids[1]
    cx0, cx1, cy0, cy1 = grp._extent(1)
    return f"""
__gx AS (
  SELECT event_id, lon, lat,
         (lon >= ({_fl(cx0)}) AND lon <= ({_fl(cx1)})
          AND lat >= ({_fl(cy0)}) AND lat <= ({_fl(cy1)})) AS in_child,
         (lon - ({_fl(par.lon0)})) / {_fl(par.dlon)} AS pgx,
         (lat - ({_fl(par.lat0)})) / {_fl(par.dlat)} AS pgy,
         (lon - ({_fl(chi.lon0)})) / {_fl(chi.dlon)} AS cgx,
         (lat - ({_fl(chi.lat0)})) / {_fl(chi.dlat)} AS cgy
  FROM {rel}),
__gc AS (
  SELECT event_id, lon, lat, in_child, pgx, pgy, cgx, cgy,
         CAST(least(greatest(floor(pgx), 0), {par.nx - 2}) AS BIGINT) AS pix,
         CAST(least(greatest(floor(pgy), 0), {par.ny - 2}) AS BIGINT) AS piy,
         CAST(least(greatest(floor(cgx), 0), {chi.nx - 2}) AS BIGINT) AS cix,
         CAST(least(greatest(floor(cgy), 0), {chi.ny - 2}) AS BIGINT) AS ciy
  FROM __gx),
__gf AS (
  SELECT event_id, lon, lat, in_child, pix, piy, cix, ciy,
         pgx - pix AS pfx, pgy - piy AS pfy,
         cgx - cix AS cfx, cgy - ciy AS cfy,
         ((7 * pix + 11 * piy) % 13) * 0.25e0 - 1.5e0 AS p00x,
         ((7 * (pix + 1) + 11 * piy) % 13) * 0.25e0 - 1.5e0 AS p10x,
         ((7 * pix + 11 * (piy + 1)) % 13) * 0.25e0 - 1.5e0 AS p01x,
         ((7 * (pix + 1) + 11 * (piy + 1)) % 13) * 0.25e0 - 1.5e0 AS p11x,
         ((5 * pix + 3 * piy) % 11) * 0.25e0 - 1.25e0 AS p00y,
         ((5 * (pix + 1) + 3 * piy) % 11) * 0.25e0 - 1.25e0 AS p10y,
         ((5 * pix + 3 * (piy + 1)) % 11) * 0.25e0 - 1.25e0 AS p01y,
         ((5 * (pix + 1) + 3 * (piy + 1)) % 11) * 0.25e0 - 1.25e0 AS p11y,
         ((3 * cix + 5 * ciy) % 9) * 0.125e0 - 0.5e0 AS c00x,
         ((3 * (cix + 1) + 5 * ciy) % 9) * 0.125e0 - 0.5e0 AS c10x,
         ((3 * cix + 5 * (ciy + 1)) % 9) * 0.125e0 - 0.5e0 AS c01x,
         ((3 * (cix + 1) + 5 * (ciy + 1)) % 9) * 0.125e0 - 0.5e0 AS c11x,
         ((2 * cix + 7 * ciy) % 7) * 0.125e0 - 0.375e0 AS c00y,
         ((2 * (cix + 1) + 7 * ciy) % 7) * 0.125e0 - 0.375e0 AS c10y,
         ((2 * cix + 7 * (ciy + 1)) % 7) * 0.125e0 - 0.375e0 AS c01y,
         ((2 * (cix + 1) + 7 * (ciy + 1)) % 7) * 0.125e0 - 0.375e0 AS c11y
  FROM __gc),
__d AS (
  SELECT event_id,
         lon + (CASE WHEN in_child THEN
                  (c00x * (1.0e0 - cfx) + c10x * cfx) * (1.0e0 - cfy)
                + (c01x * (1.0e0 - cfx) + c11x * cfx) * cfy
               ELSE
                  (p00x * (1.0e0 - pfx) + p10x * pfx) * (1.0e0 - pfy)
                + (p01x * (1.0e0 - pfx) + p11x * pfx) * pfy
               END) / 3600.0e0 AS dlon,
         lat + (CASE WHEN in_child THEN
                  (c00y * (1.0e0 - cfx) + c10y * cfx) * (1.0e0 - cfy)
                + (c01y * (1.0e0 - cfx) + c11y * cfx) * cfy
               ELSE
                  (p00y * (1.0e0 - pfx) + p10y * pfx) * (1.0e0 - pfy)
                + (p01y * (1.0e0 - pfx) + p11y * pfx) * pfy
               END) / 3600.0e0 AS dlat
  FROM __gf)"""
