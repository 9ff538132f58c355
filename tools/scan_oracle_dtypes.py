"""DuckDB-only dtype hazard scan (no Spark): run every registry oracle and
flag float64 columns whose values are all integral — the HUGEINT->float64
fetch_df signature that makes the driver's hash mismatch an int64 Spark
column even when values are equal (the pack_stream/simhash/sessionize class).

Suspects need manual triage: a column can be float64 legitimately (a mean,
a ratio) and still be integral-valued on small data.  Usage:

    python tools/scan_oracle_dtypes.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    from sis_spark.queries import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    suspects = []
    for name, (_fn, ofn) in QUERIES.items():
        if ofn is None:
            continue
        try:
            df = con.execute(ofn()).fetch_df()
        except Exception as exc:
            print(f"ERR {name}: {type(exc).__name__}: {exc}")
            continue
        for c in df.columns:
            if df[c].dtype == np.float64 and len(df):
                v = df[c].dropna().to_numpy()
                if len(v) and np.all(v == np.floor(v)) and np.all(np.abs(v) < 2 ** 53):
                    suspects.append((name, c))
                    print(f"SUSPECT {name}.{c}: float64, all-integral values")
    print(f"done: {len(suspects)} suspects")


if __name__ == "__main__":
    main()
