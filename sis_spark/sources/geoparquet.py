"""GeoParquet store (public spec, https://geoparquet.org, v1.0 metadata
shape): parquet files whose footer carries a ``geo`` JSON key describing
the WKB geometry column, its geometry types, and the file-level bbox.

Reference analog: the SQL/feature stores of the endorsed storage module
(S/storage/...) — here the parquet-native geospatial interchange format.

Scale shape: WRITING is one mapInPandas pass — every partition writes its
own parquet file with its own footer (bbox computed from its rows) and
emits one manifest row; no driver collect of data.  READING is
``spark.read.parquet`` over the directory; ``prune_files`` parses only
the FOOTERS driver-side (a few KB per file) and returns the file subset
whose bbox intersects the query window — the open-few-files discipline of
sources/table_format.read_pruned applied to the public format."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GEO_KEY = b"geo"


def _geo_meta(bbox, geometry_types, column="geometry") -> dict:
    return {
        "version": "1.0.0",
        "primary_column": column,
        "columns": {
            column: {
                "encoding": "WKB",
                "geometry_types": sorted(geometry_types),
                "bbox": list(bbox),
            }
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Write ``df`` (must carry ``geometry_col`` WKB point bytes plus the
    lon/lat columns the bbox derives from) as a directory of GeoParquet
    files, one per partition.  Returns the manifest (file, n, xmin, ymin,
    xmax, ymax) — also persisted as ``_manifest.json`` for readers."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    cols = [c for c in df.columns]

    def writer(batches):
        rows = []
        parts = []
        for pdf in batches:
            if len(pdf):
                parts.append(pdf)
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            fname = f"part-{uuid.uuid4().hex}.parquet"
            bbox = (
                float(pdf[lon_col].min()), float(pdf[lat_col].min()),
                float(pdf[lon_col].max()), float(pdf[lat_col].max()),
            )
            table = pa.Table.from_pandas(pdf[cols], preserve_index=False)
            meta = dict(table.schema.metadata or {})
            meta[GEO_KEY] = json.dumps(
                _geo_meta(bbox, ["Point"], geometry_col)
            ).encode()
            table = table.replace_schema_metadata(meta)
            pq.write_table(table, os.path.join(path, fname))
            rows.append({
                "file": fname, "n": len(pdf),
                "xmin": bbox[0], "ymin": bbox[1],
                "xmax": bbox[2], "ymax": bbox[3],
            })
        if rows:
            yield pd.DataFrame(rows)

    manifest = df.mapInPandas(
        writer,
        "file string, n long, xmin double, ymin double, "
        "xmax double, ymax double",
    ).collect()
    man = [r.asDict() for r in manifest]
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(man, f)
    return df.sparkSession.createDataFrame(
        man,
        "file string, n long, xmin double, ymin double, "
        "xmax double, ymax double",
    )


def read_geo_metadata(path: str) -> dict:
    """Parse every file's footer ``geo`` metadata (driver-side, footers
    only).  Returns {filename: geo_dict}; raises on a non-WKB encoding."""
    import pyarrow.parquet as pq

    out = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.read_schema(os.path.join(path, fname)).metadata or {}
        if GEO_KEY in meta:
            g = json.loads(meta[GEO_KEY])
            col = g["primary_column"]
            enc = g["columns"][col]["encoding"]
            if enc != "WKB":
                raise ValueError(f"{fname}: unsupported encoding {enc!r}")
            out[fname] = g
    return out


def prune_files(path: str, xmin: float, ymin: float,
                xmax: float, ymax: float) -> list[str]:
    """File paths whose footer bbox intersects the window — the reader's
    partition-pruning step (footers only, no data read)."""
    keep = []
    for fname, g in read_geo_metadata(path).items():
        col = g["primary_column"]
        b = g["columns"][col]["bbox"]
        if b[0] <= xmax and b[2] >= xmin and b[1] <= ymax and b[3] >= ymin:
            keep.append(os.path.join(path, fname))
    return keep


def read_geoparquet(
    spark: SparkSession,
    path: str,
    bbox: tuple | None = None,
) -> DataFrame:
    """Read a GeoParquet directory; with ``bbox``, only footer-matching
    files are opened AND the residual filter is applied to lon/lat (the
    bbox is a file-level index, not row-exact)."""
    if bbox is None:
        return spark.read.parquet(path)
    files = prune_files(path, *bbox)
    if not files:
        return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(*files)
    xmin, ymin, xmax, ymax = bbox
    return df.filter(
        (F.col("lon") >= xmin) & (F.col("lon") <= xmax)
        & (F.col("lat") >= ymin) & (F.col("lat") <= ymax)
    )
