#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf test tables and compare (columns sorted by name, rows
sorted, exact value match) with the parquet dumped by graft.Verify.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    res_path = os.path.join(out_dir, name)
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no spark result dir"); fails.append(name); continue
    try:
        got = canon(pd.read_parquet(res_path))
        want = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails.append(name); continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails.append(name); continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails.append(name); continue
    ok = True
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            same = (pd.isna(a) & pd.isna(b)) | (a == b) | (np.isnan(a.astype('f8'), where=~pd.isna(a), out=np.zeros(len(a), bool)) & np.isnan(b.astype('f8'), where=~pd.isna(b), out=np.zeros(len(b), bool)))
        else:
            same = (pd.Series(a).isna() & pd.Series(b).isna()).to_numpy() | (a == b)
        if not same.all():
            i = int(np.argmin(same))
            print(f"FAIL {name}: col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r}")
            ok = False; fails.append(name); break
    if ok:
        print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(set(fails))}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
