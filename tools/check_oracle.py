#!/usr/bin/env python3
"""Dev-only oracle checker (mimics the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the
matching SQL from <out>/oracle_sql.json in DuckDB against the sf_dir
tables, sorts columns by name and rows by all columns, and compares.
NOT part of the shipped library — requires driver-side python deps.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle_df = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            failures += 1
        elif len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            failures += 1
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            idx = neq.any(axis=1)
            print(pd.concat([s[idx].head(3).add_prefix("spark_"),
                             o[idx].head(3).add_prefix("oracle_")], axis=1).to_string())
            failures += 1
        else:
            print(f"OK   {name} ({len(s)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
