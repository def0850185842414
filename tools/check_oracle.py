#!/usr/bin/env python3
"""Dev-only oracle checker (mimics the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with the sf tables registered as views,
sorts columns by name and rows by all columns, and compares values.
Not part of the shipped library (driver-side python only).
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [colnames[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only is not None:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            # ASYMMETRIC read, mimicking the driver exactly: the Spark
            # result parquet through PYARROW (a DecimalType column stays
            # decimal.Decimal objects), the oracle through duckdb .df()
            # (decimals -> float64, HUGEINT -> float64, NULL int ->
            # float64/NaN). Reading both sides through DuckDB (the pre-r15
            # harness) normalizes decimals identically on both sides and
            # MISSED the five r14 decimal-output hash failures.
            s_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            s_df = pq.ParquetDataset(s_files).read().to_pandas()
            s_cols, s_rows = canon(s_df.itertuples(index=False), list(s_df.columns))
            o_df = con.sql(sql).df()
            o_cols, o_rows = canon(o_df.itertuples(index=False), list(o_df.columns))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns {s_cols} != {o_cols}")
            n_fail += 1
        elif s_rows != o_rows:
            n_fail += 1
            diff = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            print(
                f"FAIL {name}: {len(s_rows)} vs {len(o_rows)} rows; "
                f"first diffs: {diff}"
            )
        else:
            n_pass += 1
            print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
