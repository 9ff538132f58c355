"""Exact rational unit registry (functions/units.py)."""

from fractions import Fraction

import pytest

from sis_spark.functions.units import UNITS, converter, resolve


def test_known_conversions_exact():
    assert converter("mi", "m") == (Fraction(1609344, 1000), 0)
    assert converter("km/h", "m/s") == (Fraction(5, 18), 0)
    assert converter("degC", "degF") == (Fraction(9, 5), 32)
    assert converter("nmi", "km") == (Fraction(1852, 1000), 0)
    s, o = converter("acre", "m2")
    assert float(s) == pytest.approx(4046.8564224, abs=1e-9) and o == 0


def test_roundtrips_are_identity():
    for a, b in [("km", "mi"), ("degF", "degC"), ("lb", "g"),
                 ("km/h", "m/s"), ("ha", "acre")]:
        s1, o1 = converter(a, b)
        s2, o2 = converter(b, a)
        assert s1 * s2 == 1
        assert o2 + o1 * s2 == 0


def test_dimension_safety():
    with pytest.raises(ValueError):
        converter("kg", "m")
    with pytest.raises(ValueError):
        converter("m/s", "m")
    with pytest.raises(ValueError):
        resolve("degC/s")  # offset unit in compound
    with pytest.raises(KeyError):
        resolve("furlong")


def test_compound_dimensions():
    dim, f, o = resolve("m/s")
    assert dim == (1, 0, -1, 0) and o == 0
    dim, f, o = resolve("km/h")
    assert f == Fraction(1000, 3600)
