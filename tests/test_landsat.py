"""Landsat store: MTL parsing, band table join, distributed band read."""

import numpy as np

from sis_spark.queries import _landsat_write_scene
from sis_spark.sources.landsat import band_metadata, open_scene, parse_mtl


def test_parse_mtl_types():
    mtl = parse_mtl(
        "GROUP = X\n"
        '  SPACECRAFT_ID = "LANDSAT_9"\n'
        "  WRS_PATH = 123\n"
        "  CLOUD_COVER = 12.5\n"
        "  REFLECTANCE_MULT_BAND_2 = 2.0E-05\n"
        "END_GROUP = X\n"
        "END\n"
        "IGNORED_AFTER_END = 1\n")
    assert mtl["SPACECRAFT_ID"] == "LANDSAT_9"
    assert mtl["WRS_PATH"] == 123 and isinstance(mtl["WRS_PATH"], int)
    assert mtl["CLOUD_COVER"] == 12.5
    assert mtl["REFLECTANCE_MULT_BAND_2"] == 2.0e-05
    assert "IGNORED_AFTER_END" not in mtl
    assert "GROUP" not in mtl


def test_band_metadata_join():
    mtl = {"FILE_NAME_BAND_4": "b4.tif", "REFLECTANCE_MULT_BAND_4": 0.1,
           "FILE_NAME_BAND_10": "b10.tif", "RADIANCE_ADD_BAND_10": 0.2}
    rows = {b["band"]: b for b in band_metadata(mtl)}
    assert set(rows) == {4, 10}
    assert rows[4]["title"] == "Red" and rows[4]["wavelength_nm"] == 655
    assert rows[4]["group"] == "REFLECTIVE"
    assert rows[10]["group"] == "THERMAL" and rows[10]["radiance_add"] == 0.2


def test_scene_band_read(spark):
    scene = open_scene(_landsat_write_scene())
    assert scene.mtl["SPACECRAFT_ID"] == "LANDSAT_9"
    assert [b["band"] for b in scene.bands] == [2, 3]
    tiles, gg = scene.load_band(spark, 3)
    assert (gg.width, gg.height) == (96, 96)
    from sis_spark.raster.tiles import tiles_to_raster

    back = tiles_to_raster(tiles, gg)[..., 0]
    gy, gx = np.mgrid[0:96, 0:96]
    assert (back == (gx * 5 + gy * 9 + 3 * 17) % 256).all()
