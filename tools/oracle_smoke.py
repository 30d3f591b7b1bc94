#!/usr/bin/env python3
"""Oracle rot gate: execute EVERY registry oracle in DuckDB over the
scale-factor parquet views. No Spark comparison here (check.py does
that against a Verify dump) — this answers the cheaper question "does
the independent engine still accept and run each oracle", so schema
drift or SQL rot surfaces inside `sbt test` instead of the driver's
round gate. Usage: oracle_smoke.py SF_DIR ORACLE_JSON"""
import duckdb, json, sys, glob, os

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
errs = []
for name, sql in sorted(oracle.items()):
    try:
        rows = len(con.execute(sql).fetchall())
        print(f"OK {name} ({rows} rows)")
    except Exception as e:
        errs.append(name)
        print(f"ERR {name}: {e}")
print(f"\n{len(oracle) - len(errs)}/{len(oracle)} OK")
sys.exit(1 if errs else 0)
