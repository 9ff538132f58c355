"""CoverageJSON store — JSON-encoded coverages (OGC Community Standard).

The reference scopes CoverageJSON in its incubator
(incubator/src/org.apache.sis.storage.coveragejson/); this implementation
is original, built on the PUBLIC OGC CoverageJSON Community Standard:

* a ``Coverage`` document has a ``domain`` (domainType ``Grid``: axes
  ``x``/``y`` [+ ``t``/``z``] as either ``values`` lists or
  ``start/stop/num`` descriptors) and ``ranges`` (one NdArray per
  parameter: ``axisNames``, ``shape``, flat row-major ``values`` with
  nulls for missing data);
* axis values are cell CENTERS (same convention as netCDF/CF), so a
  regular grid yields the engine's corner-registered affine.

Spark shape: documents are self-describing JSON, so a folder of coverage
documents parallelizes per file (the GPX/MF-CSV pattern): each task
json-parses its files and emits finished tile blocks.  Within one very
large document the per-parameter NdArray is sliced per tile row after a
single parse — CoverageJSON is a text interchange format, not a scale
format, and the store documents that boundary (the scale path is
GeoTIFF/raw/netCDF).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..raster.grid import GridGeometry
from ..raster.tiles import TILE_SCHEMA


def _axis_values(axis: dict) -> np.ndarray:
    if "values" in axis:
        return np.asarray(axis["values"], dtype=np.float64)
    n = int(axis["num"])
    start, stop = float(axis["start"]), float(axis["stop"])
    if n == 1:
        return np.array([start])
    step = (stop - start) / (n - 1)
    return start + step * np.arange(n)


def parse_coverage(doc: dict) -> dict:
    """Coverage document -> {axes: {name: ndarray}, params: {name:
    (array shaped (..., y, x) float64 with NaN for nulls, axisNames)}}."""
    if doc.get("type") != "Coverage":
        raise ValueError("not a CoverageJSON Coverage document")
    dom = doc["domain"]
    if dom.get("domainType") not in ("Grid", None):
        raise ValueError(f"unsupported domainType {dom.get('domainType')!r}")
    axes = {k: _axis_values(v) for k, v in dom["axes"].items()}
    params = {}
    for name, nd in doc.get("ranges", {}).items():
        if nd.get("type") != "NdArray":
            raise ValueError(f"range {name!r} is not an NdArray")
        shape = tuple(int(s) for s in nd["shape"])
        vals = np.array(
            [np.nan if v is None else float(v) for v in nd["values"]],
            dtype=np.float64,
        ).reshape(shape)
        params[name] = (vals, list(nd["axisNames"]))
    return {"axes": axes, "params": params}


def coverage_grid_geometry(axes: dict) -> GridGeometry | None:
    xs, ys = axes.get("x"), axes.get("y")
    if xs is None or ys is None or len(xs) < 2 or len(ys) < 2:
        return None
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    if not (np.all(np.diff(xs) == dx) and np.all(np.diff(ys) == dy)):
        return None
    return GridGeometry(
        (0, 0, len(xs) - 1, len(ys) - 1),
        (dx, 0.0, xs[0] - 0.5 * dx, 0.0, dy, ys[0] - 0.5 * dy),
    )


def coveragejson_tiles(
    spark: SparkSession, paths: list[str], parameter: str,
    index: dict | None = None, tile_size: int = 64,
) -> tuple[DataFrame, GridGeometry | None]:
    """Distributed read of one parameter across coverage documents: band =
    file position in ``paths`` (a folder of time slices reads as a band
    stack).  ``index`` fixes non-spatial axes by integer position, e.g.
    ``{"t": 0}``."""
    with open(paths[0], "r") as f:
        first = parse_coverage(json.load(f))
    gg = coverage_grid_geometry(first["axes"])
    h = len(first["axes"]["y"])
    w = len(first["axes"]["x"])
    index = dict(index or {})

    par = spark.sparkContext.defaultParallelism
    pdf = pd.DataFrame({"band": np.arange(len(paths)), "path": paths})
    df = spark.createDataFrame(pdf).repartition(min(len(paths), par) or 1)

    def read_docs(batches):
        for b in batches:
            for band, path in zip(b["band"], b["path"]):
                with open(path, "r") as f:
                    cov = parse_coverage(json.load(f))
                vals, axis_names = cov["params"][parameter]
                sel = []
                for ax in axis_names:
                    if ax == "y":
                        sel.append(slice(None))
                    elif ax == "x":
                        sel.append(slice(None))
                    else:
                        sel.append(int(index.get(ax, 0)))
                plane = vals[tuple(sel)]
                if axis_names.index("x") < axis_names.index("y"):
                    plane = plane.T
                out = []
                for ty in range((h + tile_size - 1) // tile_size):
                    for tx in range((w + tile_size - 1) // tile_size):
                        block = np.zeros((tile_size, tile_size), np.float64)
                        sub = plane[ty * tile_size:(ty + 1) * tile_size,
                                    tx * tile_size:(tx + 1) * tile_size]
                        block[: sub.shape[0], : sub.shape[1]] = sub
                        out.append((tx, ty, int(band), block.tobytes()))
                yield pd.DataFrame(out, columns=["tx", "ty", "band", "data"])

    return df.mapInPandas(read_docs, schema=TILE_SCHEMA), gg


def format_coverage(axes: dict, params: dict) -> str:
    """{axes name -> 1-D array} + {param name -> (y, x) array} ->
    Coverage document text (NaN serialized as null)."""
    ax_json = {
        k: {"values": [float(v) for v in np.asarray(vs)]}
        for k, vs in axes.items()
    }
    ranges = {}
    for name, arr in params.items():
        arr = np.asarray(arr, dtype=np.float64)
        ranges[name] = {
            "type": "NdArray", "dataType": "float",
            "axisNames": ["y", "x"], "shape": list(arr.shape),
            "values": [None if v != v else float(v) for v in arr.ravel()],
        }
    return json.dumps({
        "type": "Coverage",
        "domain": {"type": "Domain", "domainType": "Grid", "axes": ax_json},
        "ranges": ranges,
    })
