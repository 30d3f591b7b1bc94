#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables, compare to the Spark parquet
dump (column names sorted, row multiset)."""
import duckdb, json, sys, glob, os

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf0.001"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails.append(name); continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"FAIL {name}: cols spark={sc} duck={dc}"); fails.append(name); continue
    a = spark_df[sc]; b = duck_df[sc]
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails.append(name); continue
    def norm(df):
        import pandas as pd
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif "datetime" in str(df[c].dtype) or df[c].dtype.kind in "mM":
                df[c] = df[c].astype(str)
            elif df[c].dtype.kind == "f":
                df[c] = df[c].round(6)
            elif df[c].dtype.kind in "iu":
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    na, nb = norm(a), norm(b)
    if na.equals(nb):
        print(f"PASS {name} ({len(a)} rows)")
    else:
        neq = (na != nb) & ~(na.isna() & nb.isna())
        bad = neq.any(axis=1)
        print(f"FAIL {name}: {bad.sum()}/{len(na)} differing rows")
        if bad.sum():
            print("  spark:", na[bad].head(3).to_dict("records"))
            print("  duck :", nb[bad].head(3).to_dict("records"))
        fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} PASS")
sys.exit(1 if fails else 0)
