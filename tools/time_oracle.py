#!/usr/bin/env python3
"""Time each oracle SQL alone in DuckDB (no Spark compare) to find the
queries that blow the driver's correctness-check time budget.

Usage: python3 tools/time_oracle.py <sfDir> <oracle_sql.json> [only...]
"""
import duckdb, json, sys, glob, os, time

sf, sqls_path = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS FROM '{p}'")

sqls = json.load(open(sqls_path))
total = 0.0
rows = []
for name, sql in sorted(sqls.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        n = len(con.execute(sql).df())
        err = ""
    except Exception as e:
        n, err = -1, str(e)[:120]
    dt = time.time() - t0
    total += dt
    rows.append((dt, name, n, err))
    print(f"{name}: {dt:.2f}s rows={n} {err}", flush=True)
print("-- sorted by cost --")
for dt, name, n, err in sorted(rows, reverse=True)[:12]:
    print(f"{dt:8.2f}s {name}")
print(f"TOTAL: {total:.1f}s")
