"""Cross-engine dtype-split scan: for every registry query, compare the
SPARK result schema (plan-only — no job runs) against the ORACLE's pandas
dtypes (DuckDB executes at sf0.01, cheap) and report any column where one
side is integer and the other float — the exact condition that makes the
driver's value-hash mismatch even when values are equal (HUGEINT->float64
via fetch_df on the oracle side is the usual culprit).

Much cheaper than the full board: no Spark jobs except the handful of
queries whose plan construction itself collects loop-control scalars.

    python tools/scan_dtype_splits.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_INT = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}
_FLOAT = {"float", "double"}


def spark_kind(dt: str) -> str:
    s = dt.lower()
    if s in _INT:
        return "i"
    if s in _FLOAT:
        return "f"
    return "other"


def pandas_kind(dtype) -> str:
    k = np.dtype(dtype).kind if dtype != object else "O"
    return {"i": "i", "u": "i", "f": "f"}.get(k, "other")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    from sis_spark.queries import QUERIES
    from sis_spark.session import get_spark

    spark = get_spark("dtype-scan", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    splits = 0
    for name, (fn, ofn) in QUERIES.items():
        if ofn is None:
            continue
        try:
            schema = {f.name: f.dataType.simpleString() for f in fn(spark, sf_dir).schema.fields}
        except Exception as exc:
            print(f"ERR {name}: spark plan: {type(exc).__name__}: {exc}")
            continue
        try:
            odf = con.execute(ofn()).fetch_df()
        except Exception as exc:
            print(f"ERR {name}: oracle: {type(exc).__name__}: {exc}")
            continue
        for c, sdt in schema.items():
            if c not in odf.columns:
                print(f"COLS {name}: spark col {c!r} missing from oracle")
                splits += 1
                continue
            sk, ok_ = spark_kind(sdt), pandas_kind(odf[c].dtype)
            if {sk, ok_} == {"i", "f"}:
                if odf[c].isna().any():
                    # nullable int: BOTH engines render float64 in pandas
                    # (Spark toPandas does the same widening), so the
                    # driver's hash sees matching dtypes — benign.
                    print(f"nullable-ok {name}.{c}: spark {sdt}, oracle "
                          f"{odf[c].dtype} with NULLs (both sides widen)")
                    continue
                print(f"SPLIT {name}.{c}: spark {sdt} vs oracle {odf[c].dtype}")
                splits += 1
    print(f"done: {splits} splits")
    sys.exit(1 if splits else 0)


if __name__ == "__main__":
    main()
