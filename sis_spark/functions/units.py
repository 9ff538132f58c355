"""Units of measure: exact rational unit conversion.

Reference parity: the reference's units engine stores every linear unit
converter as a RATIONAL scale (+ offset) — `U/measure/LinearConverter.java`
keeps numerator/denominator and only falls back to doubles when forced,
`U/measure/Prefixes.java` resolves SI prefixes, `U/measure/Units.java`
declares the unit constants and `UnitFormat.java` parses symbols.  This
module re-derives that model Spark-first: a symbol registry mapping to a
dimension vector and an exact (num, den, offset_num, offset_den) converter
to SI base units, compound `A/B` parsing, and plan-time resolution of a
(from, to) pair into ONE exact integer multiply/divide the engine and the
DuckDB oracle replay identically (offset units — temperatures — compose as
affine rationals).  No floats anywhere in the conversion path.

Angles (degree -> radian) are intentionally OUT of the rational registry —
their factor pi/180 is irrational; the projection/geodesic modules own
angle handling (documented model boundary, mirroring ConventionalUnit's
double-factor fallback).
"""

from __future__ import annotations

from fractions import Fraction

# dimension vector: (length, mass, time, temperature)
_DIMS = {
    "1": (0, 0, 0, 0),
    "m": (1, 0, 0, 0),
    "kg": (0, 1, 0, 0),
    "s": (0, 0, 1, 0),
    "K": (0, 0, 0, 1),
}

# symbol -> (dim, factor to SI base, affine offset in SI units)
# factor/offset are exact Fractions (LinearConverter.java:1 parity).
UNITS: dict = {}


def _u(sym: str, dim, factor, offset=Fraction(0)):
    UNITS[sym] = (dim, Fraction(factor), Fraction(offset))


_L = _DIMS["m"]
_M = _DIMS["kg"]
_T = _DIMS["s"]
_K = _DIMS["K"]
_AREA = (2, 0, 0, 0)
_VOL = (3, 0, 0, 0)
_SPEED = (1, 0, -1, 0)

_u("m", _L, 1)
_u("km", _L, 1000)
_u("cm", _L, Fraction(1, 100))
_u("mm", _L, Fraction(1, 1000))
_u("ft", _L, Fraction(3048, 10000))       # international foot (exact)
_u("in", _L, Fraction(254, 10000))
_u("yd", _L, Fraction(9144, 10000))
_u("mi", _L, Fraction(1609344, 1000))
_u("nmi", _L, 1852)                        # nautical mile (exact SI)
_u("s", _T, 1)
_u("min", _T, 60)
_u("h", _T, 3600)
_u("d", _T, 86400)
_u("kg", _M, 1)
_u("g", _M, Fraction(1, 1000))
_u("t", _M, 1000)
_u("lb", _M, Fraction(45359237, 100000000))  # avoirdupois pound (exact)
_u("oz", _M, Fraction(45359237, 100000000 * 16))
_u("K", _K, 1)
_u("degC", _K, 1, Fraction(27315, 100))
_u("degF", _K, Fraction(5, 9), Fraction(45967, 100) * Fraction(5, 9))
_u("m2", _AREA, 1)
_u("ha", _AREA, 10000)
_u("km2", _AREA, 1000000)
_u("acre", _AREA, Fraction(9144, 10000) ** 2 * 4840)  # 4840 sq yd (exact)
_u("m3", _VOL, 1)
_u("L", _VOL, Fraction(1, 1000))


def resolve(symbol: str):
    """Resolve a simple or compound ``A/B`` symbol -> (dim, factor,
    offset).  Compound units must be offset-free (no degC/s)."""
    if symbol in UNITS:
        return UNITS[symbol]
    if "/" in symbol:
        a, b = symbol.split("/", 1)
        da, fa, oa = resolve(a)
        db, fb, ob = resolve(b)
        if oa != 0 or ob != 0:
            raise ValueError(f"offset unit in compound symbol: {symbol}")
        dim = tuple(x - y for x, y in zip(da, db))
        return dim, fa / fb, Fraction(0)
    raise KeyError(f"unknown unit: {symbol}")


def converter(src: str, dst: str):
    """Exact affine converter src -> dst as Fractions (scale, offset):
    value_dst = value_src * scale + offset.  Raises on incommensurable
    dimensions (the reference's IncommensurableException contract)."""
    ds, fs, os_ = resolve(src)
    dd, fd, od = resolve(dst)
    if ds != dd:
        raise ValueError(f"incommensurable units: {src} -> {dst}")
    scale = fs / fd
    offset = (os_ - od) / fd
    return scale, offset


def convert_q_sql(value_q: str, src: str, dst: str, q: int, div_op: str) -> str:
    """SQL text converting a value quantized at ``q`` (integer
    value*q) from src to dst, exactly:
    out_q = (v_q * scale_num + offset*q*scale_den_part ...) div ... —
    emitted as ONE integer multiply-add floor-divided by the reduced
    denominator, so both engines agree bit-for-bit.  All operands must be
    nonnegative OR the caller accepts truncating `div` semantics
    (temperatures offsets keep the numerator positive for earthly
    inputs)."""
    scale, offset = converter(src, dst)
    num = scale.numerator
    den = scale.denominator
    onum = (offset * q).limit_denominator(10**12)
    if onum != offset * q:
        raise ValueError("offset not representable at this quantization")
    # out = (v * num + offset_q * den_adj) / den with offset_q = offset*q
    onum_frac = offset * q
    common = den * onum_frac.denominator
    a = num * onum_frac.denominator
    b = onum_frac.numerator * den
    return f"((({value_q}) * {a} + {b}){div_op}{common})"


def dms_exprs(deg_q: str, div_op: str, q: int = 10**6) -> dict:
    """Sexagesimal decomposition + formatting of an angle quantized at
    ``q`` micro-degree-style units (AngleFormat.java parity — the
    reference's DMS formatter, D deg MM' SS.S''): sign, whole degrees,
    minutes, seconds and tenths all by exact positive integer division
    (work on |angle|, reapply the sign in the string), plus the formatted
    'D°MM′SS.T″' text built with lpad — identical string ops both
    engines (STRING is a cast alias in Spark AND DuckDB; VARCHAR is not
    a bare Spark type).  Returns {sign, d, m, s10, dms} SQL texts."""
    o = div_op
    a = f"abs({deg_q})"
    d = f"(({a}){o}{q})"
    rem = f"(({a}) % {q})"
    # minutes in q-units: rem * 60 / q ...
    m = f"((({rem}) * 60){o}{q})"
    rem2 = f"((({rem}) * 60) % {q})"
    s10 = f"((({rem2}) * 600){o}{q})"
    sign = f"(CASE WHEN ({deg_q}) < 0 THEN -1 ELSE 1 END)"
    dms = (
        f"(CASE WHEN ({deg_q}) < 0 THEN '-' ELSE '' END || "
        f"CAST({d} AS STRING) || '°' || "
        f"lpad(CAST({m} AS STRING), 2, '0') || '′' || "
        f"lpad(CAST(({s10}){o}10 AS STRING), 2, '0') || '.' || "
        f"CAST(({s10}) % 10 AS STRING) || '″')"
    )
    return {"sign": sign, "d": d, "m": m, "s10": s10, "dms": dms}
