#!/usr/bin/env python3
"""(Re)generate scripts/duckdb_baseline_sf0.1.json: time every
oracle_sql.json entry in DuckDB (threads=32) over the sf0.1 parquet,
best of --runs (default 2). Pass query names to time a subset and merge
into the existing file; no names = all queries, full rewrite.

Usage: make_duckdb_baseline.py <verifyOutDir> [--runs=N] [q1 q2 ...]
"""
import glob
import json
import os
import sys
import time

import duckdb

out_dir = sys.argv[1]
opts = dict(a.split("=") for a in sys.argv[2:] if a.startswith("--") and "=" in a)
runs = int(opts.get("--runs", 2))
names = [a for a in sys.argv[2:] if not a.startswith("--")]

sf_dir = "/root/testdata/sf0.1"
base_path = os.path.join(os.path.dirname(__file__), "duckdb_baseline_sf0.1.json")

con = duckdb.connect()
con.sql("SET threads=32")
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    t = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
targets = names if names else sorted(oracle)

baseline = {}
if names and os.path.exists(base_path):
    baseline = json.load(open(base_path))

for name in targets:
    sql = oracle[name]
    best = None
    for _ in range(runs):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    baseline[name] = round(best, 3)
    print(f"{name}: {baseline[name]}s")

json.dump(dict(sorted(baseline.items())), open(base_path, "w"), indent=1)
print(f"wrote {base_path} ({len(baseline)} queries)")
