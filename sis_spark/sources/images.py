"""The primary input table of the north rule: image + caption rows.

Schema (mandated by BASELINE.json input_hint):
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash bigint)
plus derived (lon, lat) — the skewed spatial distribution from synth.py.

Everything is derivable from ``image_id`` alone (FIXTURES.md §1 rule), so any
row can be re-materialized in isolation — this is what makes checkpoint
resume and per-row verification possible without storing inputs.

Generation is distributed: mapInPandas over spark.range(n) — each Arrow batch
synthesizes its rows with closed-form numpy (no driver-side data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..raster import codec

SIZES = [16, 32, 64]
FMTS = ["png", "raw", "jpeg"]

_VOCAB = (
    "ridge harbor basalt meadow quartz delta canyon willow summit lagoon "
    "mesa tundra fjord atoll dune reef crater butte arroyo glacier"
).split()


def image_dims(i: int) -> tuple[int, int, str]:
    return SIZES[i % 3], SIZES[(i // 3) % 3], FMTS[i % len(FMTS)]


def pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Closed-form pixel content — f(x, y, channel, id), no RNG needed."""
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    ch = np.arange(3)[None, None, :]
    return ((x * 3 + y * 7 + ch * 31 + i * 13) % 256).astype(np.uint8)


def caption_for(i: int) -> str:
    words = [_VOCAB[(i * 7 + k * 13) % len(_VOCAB)] for k in range(6)]
    return f"caption of img-{i:012d}: " + " ".join(words)


def make_row(i: int) -> dict:
    w, h, fmt = image_dims(i)
    arr = pixels_for(i, w, h)
    buf = codec.encode(arr, fmt)
    # phash over the *decoded* pixels (lossy fmt hashes its own reconstruction)
    dec = codec.decode(buf, fmt)
    return {
        "image_id": f"img-{i:012d}",
        "bytes": buf,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption_for(i),
        "phash": np.int64(codec.phash64(dec)),
    }


IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double"
)


_FIELD_TYPES = {
    "image_id": "string", "bytes": "binary", "w": "int", "h": "int",
    "fmt": "string", "caption": "string", "phash": "long",
    "lon": "double", "lat": "double",
}


def images_table(
    spark: SparkSession,
    n_rows: int,
    partitions: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed deterministic image+caption DataFrame of n_rows.

    ``columns``: optional projection pushed INTO the generator — the
    generative-source analog of parquet ReadSchema pruning.  A mapInPandas
    source is opaque to Catalyst's column pruning (a downstream .select
    drops columns only AFTER Python computed them), so the projection must
    be pushed in by hand; any projection without ``bytes``/``phash`` skips
    the image codec entirely, which is the dominant generation cost.  At
    100 TB the table is a stored Iceberg/parquet scan and the same pruning
    is automatic — this keeps the generated stand-in honest about it."""
    cols = list(IMAGE_SCHEMA.split(", ")) if columns is None else columns
    names = [c.split(" ")[0] for c in cols] if columns is None else list(columns)
    bad = set(names) - set(_FIELD_TYPES)
    if bad:
        raise ValueError(f"unknown image columns: {sorted(bad)}")
    schema = ", ".join(f"{n} {_FIELD_TYPES[n]}" for n in names)
    need_codec = "bytes" in names or "phash" in names
    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if need_codec:
                out = pd.DataFrame([make_row(int(i)) for i in ids])
            else:
                out = pd.DataFrame(index=np.arange(len(ids)))
                if "image_id" in names:
                    out["image_id"] = [f"img-{int(i):012d}" for i in ids]
                if "w" in names:
                    out["w"] = np.array(SIZES, np.int32)[ids % 3]
                if "h" in names:
                    out["h"] = np.array(SIZES, np.int32)[(ids // 3) % 3]
                if "fmt" in names:
                    out["fmt"] = np.array(FMTS)[ids % len(FMTS)]
                if "caption" in names:
                    out["caption"] = [caption_for(int(i)) for i in ids]
            if "lon" in names or "lat" in names:
                lon, lat = synth.point_lonlat_np(ids)
                out["lon"] = lon
                out["lat"] = lat
            yield out[names]

    return rng.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------- partitioned layout

PREFIX_RES = 4  # 256 coarse cells -> directory partitions


def write_images_partitioned(
    spark: SparkSession, n_rows: int, path: str, prefix_res: int = PREFIX_RES
) -> None:
    """Write the image table hive-partitioned by coarse spatial cell
    (``cell_p`` = cell id at ``prefix_res``).

    This is the engine's Iceberg-style table layout (the parquet
    ``partitionBy`` stand-in for an Iceberg identity-partition spec on the
    cell column): spatially-filtered reads prune whole directories at plan
    time, and a cell-keyed join reads only the polygon-covered partitions —
    the storage-level analog of GridDerivation's request∩data pruning
    (F/coverage/grid/GridDerivation.java:332-401)."""
    from ..functions.spark_exprs import cell_col
    from pyspark.sql import functions as F

    df = images_table(spark, n_rows).withColumn(
        "cell_p", cell_col(F.col("lon"), F.col("lat"), prefix_res)
    )
    df.write.partitionBy("cell_p").mode("overwrite").parquet(path)


def read_images(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def covering_prefixes(polygons: list[dict], prefix_res: int = PREFIX_RES) -> list[int]:
    """Driver-side plan input: the coarse cells covered by any polygon
    envelope (SPLIT-aware) — the partition-pruning predicate values."""
    from ..functions.cells import covering_cells
    from ..operators.spatial_join import normalize_polygons

    out: set[int] = set()
    for p in normalize_polygons(polygons):
        for c in covering_cells(p["xmin"], p["ymin"], p["xmax"], p["ymax"], prefix_res):
            out.add(int(c))
    return sorted(out)


def write_images_snapshot(
    spark: SparkSession, n_rows: int, root: str, prefix_res: int = PREFIX_RES
) -> int:
    """The image table as a SNAPSHOT TABLE (sources/table_format.py): cell-
    partitioned like write_images_partitioned, but committed through the
    manifest protocol — appends are atomic, reads are snapshot-isolated,
    and spatial reads prune from the manifest instead of listing dirs."""
    from ..functions.spark_exprs import cell_col
    from . import table_format as tf
    from pyspark.sql import functions as F

    df = images_table(spark, n_rows).withColumn(
        "cell_p", cell_col(F.col("lon"), F.col("lat"), prefix_res)
    )
    return tf.create_table(spark, root, df, partition_by=["cell_p"])


def spatial_join_snapshot(
    spark: SparkSession,
    root: str,
    polygons: list[dict],
    prefix_res: int = PREFIX_RES,
    snapshot: int | None = None,
    **kwargs,
) -> DataFrame:
    """Spatial join over a snapshot image table: the polygon covering
    prefixes prune FILES from the manifest on the driver (the Iceberg
    partition-prune analog — the cluster opens only covered partitions),
    then the standard two-phase join runs on the pruned read."""
    from . import table_format as tf
    from ..operators.spatial_join import spatial_join

    want = {str(c) for c in covering_prefixes(polygons, prefix_res)}
    pruned = tf.read(spark, root, snapshot=snapshot,
                     partition_filter=lambda part: part["cell_p"] in want)
    return spatial_join(pruned, polygons, **kwargs)


def spatial_join_pruned(
    images_df: DataFrame,
    polygons: list[dict],
    prefix_res: int = PREFIX_RES,
    **kwargs,
) -> DataFrame:
    """Spatial join over a cell-partitioned image table: partition-prune to
    the polygon-covered coarse cells first (Catalyst pushes the IN-filter
    into PartitionFilters — verified in tests/test_plans.py), then the
    standard two-phase cell-prefilter + PIP refine."""
    from pyspark.sql import functions as F

    from ..operators.spatial_join import spatial_join

    prefixes = covering_prefixes(polygons, prefix_res)
    pruned = images_df.filter(F.col("cell_p").isin(prefixes))
    return spatial_join(pruned, polygons, **kwargs)
