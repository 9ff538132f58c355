"""CoverageJSON store: document parse (values and start/stop/num axes),
null -> NaN, non-spatial axis selection, band stacking, round-trip."""

import json

import numpy as np

from sis_spark.raster.tiles import tiles_to_raster
from sis_spark.sources.coveragejson import (
    coverage_grid_geometry, coveragejson_tiles, format_coverage,
    parse_coverage,
)


def test_parse_axis_forms():
    doc = {
        "type": "Coverage",
        "domain": {"type": "Domain", "domainType": "Grid", "axes": {
            "x": {"start": 0.0, "stop": 9.0, "num": 10},
            "y": {"values": [5.0, 4.0, 3.0]},
        }},
        "ranges": {"v": {"type": "NdArray", "dataType": "float",
                         "axisNames": ["y", "x"], "shape": [3, 10],
                         "values": [None] + list(range(29))}},
    }
    cov = parse_coverage(doc)
    assert list(cov["axes"]["x"]) == list(map(float, range(10)))
    v, names = cov["params"]["v"]
    assert np.isnan(v[0, 0]) and v[2, 9] == 28.0 and names == ["y", "x"]
    gg = coverage_grid_geometry(cov["axes"])
    assert gg.affine == (1.0, 0.0, -0.5, 0.0, -1.0, 5.5)


def test_roundtrip_and_bands(spark, tmp_path):
    h, w = 70, 100
    gy, gx = np.mgrid[0:h, 0:w]
    paths = []
    for band in range(2):
        arr = ((gx * 3 + gy * 7 + band * 11) % 90).astype(np.float64)
        arr[5, 6] = np.nan
        text = format_coverage(
            {"x": -10.0 + 0.5 * np.arange(w), "y": 30.0 - 0.5 * np.arange(h)},
            {"temp": arr},
        )
        p = tmp_path / f"c{band}.covjson"
        p.write_text(text)
        paths.append(str(p))

    tiles, gg = coveragejson_tiles(spark, paths, "temp")
    assert gg.affine == (0.5, 0.0, -10.25, 0.0, -0.5, 30.25)
    back = tiles_to_raster(tiles, gg, dtype=np.float64)
    assert back.shape == (h, w, 2)
    for band in range(2):
        expect = ((gx * 3 + gy * 7 + band * 11) % 90).astype(np.float64)
        m = np.ones_like(expect, bool)
        m[5, 6] = False
        assert (back[..., band][m] == expect[m]).all()
        assert np.isnan(back[5, 6, band])


def test_axis_selection(spark, tmp_path):
    # (t, x, y) axis order exercises both selection and the transpose
    t, h, w = 3, 4, 6
    vals = np.arange(t * w * h, dtype=float).reshape(t, w, h)
    doc = {
        "type": "Coverage",
        "domain": {"type": "Domain", "domainType": "Grid", "axes": {
            "t": {"values": [0.0, 1.0, 2.0]},
            "x": {"values": list(np.arange(w, dtype=float))},
            "y": {"values": list(np.arange(h, dtype=float))},
        }},
        "ranges": {"v": {"type": "NdArray", "dataType": "float",
                         "axisNames": ["t", "x", "y"],
                         "shape": [t, w, h],
                         "values": [float(v) for v in vals.ravel()]}},
    }
    p = tmp_path / "c.covjson"
    p.write_text(json.dumps(doc))
    tiles, gg = coveragejson_tiles(spark, [str(p)], "v", index={"t": 2})
    back = tiles_to_raster(tiles, gg, dtype=np.float64)[..., 0]
    assert (back == vals[2].T).all()
