"""WKT store: grammar, WKT1 + WKT2 parsing, writer round-trip parity."""

import numpy as np
import pytest

from sis_spark.functions.projections import CRS_REGISTRY, _crs
from sis_spark.functions.wkt_crs import crs_from_wkt, parse_wkt, to_wkt

# ESRI-style WKT 1 for Lambert-93 (no AUTHORITY -> structural resolution)
WKT1_LCC = """PROJCS["RGF93_Lambert_93",
  GEOGCS["GCS_RGF_1993", DATUM["D_RGF_1993",
    SPHEROID["GRS_1980", 6378137.0, 298.257222101]],
    PRIMEM["Greenwich", 0.0], UNIT["Degree", 0.0174532925199433]],
  PROJECTION["Lambert_Conformal_Conic_2SP"],
  PARAMETER["False_Easting", 700000.0],
  PARAMETER["False_Northing", 6600000.0],
  PARAMETER["Central_Meridian", 3.0],
  PARAMETER["Standard_Parallel_1", 49.0],
  PARAMETER["Standard_Parallel_2", 44.0],
  PARAMETER["Latitude_Of_Origin", 46.5],
  UNIT["Meter", 1.0]]"""


def test_grammar():
    n = parse_wkt('A["x,] ""q""", 1.5, B[2], C]')
    assert n.keyword == "A"
    assert n.args[0] == 'x,] "q"'
    assert n.args[1] == 1.5
    assert n.child("B").args == [2.0]
    assert n.child("C").args == []


def test_wkt1_structural_matches_registry():
    crs = crs_from_wkt(WKT1_LCC)
    ref = CRS_REGISTRY["EPSG:2154"]
    lon = np.linspace(-5, 9, 50)
    lat = np.linspace(41, 51, 50)
    assert all(
        np.array_equal(a, b)
        for a, b in zip(crs.forward(lon, lat), ref.forward(lon, lat))
    )


@pytest.mark.parametrize("code", sorted(CRS_REGISTRY) + ["EPSG:32631", "EPSG:32733"])
def test_roundtrip_exact(code):
    w = to_wkt(code)
    ref = _crs(code)
    built = crs_from_wkt(w, prefer_id=False)  # force structural build
    lon = np.linspace(-170, 170, 37)
    lat = np.linspace(-80, 80, 23)
    LON, LAT = (m.ravel() for m in np.meshgrid(lon, lat))
    for a, b in zip(ref.forward(LON, LAT), built.forward(LON, LAT)):
        assert np.array_equal(a, b, equal_nan=True)
    # with the ID kept, registry entries resolve to the canonical object
    if code in CRS_REGISTRY:
        assert crs_from_wkt(w) is ref


def test_id_preference_and_errors():
    assert crs_from_wkt('GEOGCRS["x", DATUM["d", ELLIPSOID["WGS 84", 6378137, 298.257223563]]]').forward(1, 2) == (1.0, 2.0)
    with pytest.raises(ValueError):
        crs_from_wkt('PROJCRS["p", CONVERSION["c", METHOD["Bonne"]]]')


def test_geotiff_geokeys_roundtrip():
    import numpy as np

    from sis_spark.sources.geotiff import (
        crs_geokeys, encode_geotiff, geokeys_to_crs, parse_ifds,
    )

    arr = (np.arange(64 * 64).reshape(64, 64) % 256).astype(np.uint8)
    for code in ("EPSG:4326", "EPSG:2154", "EPSG:32631"):
        buf = encode_geotiff(arr, affine=(0.5, 0, 10.0, 0, -0.5, 20.0), crs=code)
        assert geokeys_to_crs(parse_ifds(buf)[0]["geokeys"]) == code
        # every emitted code resolves through the registry
        assert _crs(geokeys_to_crs(crs_geokeys(code))) is not None


def test_prj_sidecar(spark, tmp_path):
    import numpy as np

    from sis_spark.raster.grid import GridGeometry
    from sis_spark.sources.ascii_grid import format_ascii_grid, read_ascii_grid

    gg = GridGeometry((0, 0, 3, 2), (1.0, 0.0, 0.0, 0.0, -1.0, 3.0))
    (tmp_path / "g.asc").write_text(
        format_ascii_grid(np.zeros((3, 4)), gg))
    (tmp_path / "g.prj").write_text(to_wkt("EPSG:2154"))
    _tiles, gg2 = read_ascii_grid(spark, str(tmp_path / "g.asc"))
    assert gg2.crs == "EPSG:2154"
