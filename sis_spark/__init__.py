"""sis_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Semantics are modeled on Apache SIS (reference snapshot at /root/reference,
cited by file:line in docstrings) but the execution architecture is pure
Spark: DataFrame/SQL logical plans optimized by Catalyst, with Arrow-
vectorized pandas UDFs (numpy kernels) only where Spark has no built-in
(cell encoding, ray-casting point-in-polygon, Mercator math, raster tiles).

Layout:
    functions/   numpy kernels + pandas_udf wrappers (cells, transforms, geometry)
    operators/   DataFrame-level operators (spatial join, kNN, tiling, query facade)
    sources/     synthetic deterministic image+caption table, raster tile tables
    plans/       checkpoint manifests for idempotent resume
    synth.py     deterministic coordinate/polygon derivations shared with the
                 DuckDB oracle SQL (bit-identical arithmetic in both engines)
"""

__version__ = "0.1.0"
