"""Landsat scene store — MTL metadata + band rasters.

Re-derivation of the reference's earth-observation Landsat DataStore
(S.earthobservation/.../landsat/): ``MetadataReader.java:257-330`` parses
the MTL text as flat ``KEY = value`` pairs (GROUP/END_GROUP structure
recorded but keys are globally unique; ``*_BAND_n`` suffixes index band
n), stopping at ``END``; ``BandName.java:32-43`` fixes the band number ->
(group, title, peak wavelength nm) table; band rasters are the scene's
GeoTIFF files named by ``FILE_NAME_BAND_n``, and the level-1 radiometric
rescaling coefficients (``REFLECTANCE_MULT/ADD_BAND_n``) convert DN to
top-of-atmosphere reflectance.

Spark shape: the MTL is tiny and parses driver-side (it is the catalog
entry); each band raster loads through the engine's distributed GeoTIFF
reader (deferred executor-side tile decode), and the DN->reflectance
conversion is the ConvertedGridCoverage transfer function.
"""

from __future__ import annotations

import os
import re

# band number -> (group, title, wavelength nm), per BandName.java:32-43
# (Landsat 8/9 OLI/TIRS numbering)
BAND_TABLE = {
    1: ("REFLECTIVE", "Coastal Aerosol", 433),
    2: ("REFLECTIVE", "Blue", 482),
    3: ("REFLECTIVE", "Green", 562),
    4: ("REFLECTIVE", "Red", 655),
    5: ("REFLECTIVE", "Near-Infrared", 865),
    6: ("REFLECTIVE", "Short Wavelength Infrared (SWIR) 1", 1610),
    7: ("REFLECTIVE", "Short Wavelength Infrared (SWIR) 2", 2200),
    8: ("PANCHROMATIC", "Panchromatic", 590),
    9: ("REFLECTIVE", "Cirrus", 1375),
    10: ("THERMAL", "Thermal Infrared Sensor (TIRS) 1", 10800),
    11: ("THERMAL", "Thermal Infrared Sensor (TIRS) 2", 12000),
}

_LINE = re.compile(r"\s*([A-Z0-9_]+)\s*=\s*(.*?)\s*$")


def parse_mtl(text: str) -> dict:
    """MTL text -> flat {KEY: value} with typed values (quoted -> str,
    numeric -> float/int).  GROUP/END_GROUP lines delimit sections but the
    keys are globally unique, so the reference (and this parser) flattens
    them.  Parsing stops at the END keyword."""
    out: dict = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line == "END":
            break
        m = _LINE.match(line)
        if not m:
            continue
        key, val = m.groups()
        if key in ("GROUP", "END_GROUP"):
            continue
        if val.startswith('"') and val.endswith('"'):
            out[key] = val[1:-1]
        else:
            try:
                f = float(val)
                out[key] = int(f) if f == int(f) and "." not in val and "e" not in val.lower() else f
            except ValueError:
                out[key] = val
    return out


def band_metadata(mtl: dict) -> list[dict]:
    """Per-band rows joining the MTL's *_BAND_n keys with BAND_TABLE."""
    bands = []
    for n, (group, title, wl) in BAND_TABLE.items():
        fname = mtl.get(f"FILE_NAME_BAND_{n}")
        if fname is None:
            continue
        bands.append({
            "band": n, "group": group, "title": title, "wavelength_nm": wl,
            "file_name": fname,
            "reflectance_mult": mtl.get(f"REFLECTANCE_MULT_BAND_{n}"),
            "reflectance_add": mtl.get(f"REFLECTANCE_ADD_BAND_{n}"),
            "radiance_mult": mtl.get(f"RADIANCE_MULT_BAND_{n}"),
            "radiance_add": mtl.get(f"RADIANCE_ADD_BAND_{n}"),
        })
    return bands


class LandsatScene:
    """Parsed scene: metadata dict, band rows, and distributed band loads."""

    def __init__(self, mtl_path: str):
        with open(mtl_path, "r") as f:
            self.mtl = parse_mtl(f.read())
        self.dir = os.path.dirname(mtl_path)
        self.bands = band_metadata(self.mtl)

    def band(self, n: int) -> dict:
        for b in self.bands:
            if b["band"] == n:
                return b
        raise KeyError(f"band {n} not in scene")

    def load_band(self, spark, n: int, tile_size: int = 64):
        """Distributed GeoTIFF read of one band -> (tiles_df, GridGeometry)."""
        from .geotiff import geotiff_tiles

        with open(os.path.join(self.dir, self.band(n)["file_name"]), "rb") as f:
            buf = f.read()
        return geotiff_tiles(spark, buf, tile_size=tile_size)


def open_scene(mtl_path: str) -> LandsatScene:
    return LandsatScene(mtl_path)
