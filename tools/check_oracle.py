#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
(tables = parquet files in sfDir), load the Spark result parquet, compare
row counts, schemas (column names) and value multisets (sorted columns by
name, rows sorted).
"""
import duckdb, json, sys, glob, os

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS FROM '{p}'")

sqls = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(sqls.items()):
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"{name}: NO SPARK OUTPUT")
        fails += 1
        continue
    spark = con.execute(f"FROM '{spark_dir}/*.parquet'").df()
    o = oracle.reindex(sorted(oracle.columns), axis=1)
    s = spark.reindex(sorted(spark.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"{name}: SCHEMA MISMATCH oracle={list(o.columns)} spark={list(s.columns)}")
        fails += 1
        continue
    if len(o) != len(s):
        print(f"{name}: ROWCOUNT MISMATCH oracle={len(o)} spark={len(s)}")
        fails += 1
        continue
    o_sorted = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s_sorted = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    # normalize dtypes for compare
    try:
        import pandas as pd
        eq = o_sorted.astype(str).equals(s_sorted.astype(str))
    except Exception:
        eq = False
    if not eq:
        print(f"{name}: VALUE MISMATCH ({len(o)} rows)")
        diff = (o_sorted.astype(str) != s_sorted.astype(str)).any(axis=1)
        print("  first diffs (oracle | spark):")
        for i in o_sorted.index[diff][:3]:
            print("   O:", o_sorted.loc[i].to_dict())
            print("   S:", s_sorted.loc[i].to_dict())
        fails += 1
    else:
        print(f"{name}: OK ({len(o)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
