#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate: reads the
Verify dump + oracle_sql.json, runs each oracle in DuckDB over the same
parquet tables, and diffs exactly (columns sorted by name, rows in dumped
order). Usage: check.py [sfDir] [verifyOut]"""
import os, sys, json
import duckdb
import pandas as pd
from pandas.testing import assert_frame_equal

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
# CHECK_THREADS=4 for large-sf (ScaleLand) sweeps: DuckDB's per-thread
# operator state on the string-heavy oracles scales with threads, and
# the 32-thread default OOMs on the composed-funnel oracle at 10x
# while 4 threads complete it comfortably
if os.environ.get("CHECK_THREADS"):
    con.sql(f"SET threads={int(os.environ['CHECK_THREADS'])}")
for tbl in tables:
    # driver testdata is one file per table; ScaleLand-landed dirs are
    # spark parquet DIRECTORIES — glob those
    src = f"{sf}/{tbl}.parquet"
    if os.path.isdir(src):
        src += "/*.parquet"
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{src}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
# optional 3rd arg: comma-separated key subset (single-key iteration /
# per-key budgeting at large sf where one oracle can dominate the run)
if len(sys.argv) > 3:
    keys = set(sys.argv[3].split(","))
    unknown = keys - oracle.keys()
    assert not unknown, f"unknown key(s): {sorted(unknown)}"
    oracle = {k: oracle[k] for k in keys}
fails = []
for name, sql in sorted(oracle.items()):
    try:
        a = con.sql(sql).df()
        b = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        a = a.reindex(sorted(a.columns), axis=1).reset_index(drop=True)
        b = b.reindex(sorted(b.columns), axis=1).reset_index(drop=True)
        assert sorted(a.columns) == sorted(b.columns), \
            f"columns: oracle={sorted(a.columns)} spark={sorted(b.columns)}"
        assert len(a) == len(b), f"rows: oracle={len(a)} spark={len(b)}"
        assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({len(a)} rows)")
    except Exception as e:
        fails.append(name)
        msg = str(e).replace("\n", " | ")[:500]
        print(f"FAIL {name}: {msg}")
for name in con.sql("SELECT 1").fetchall() and []:
    pass
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass" +
      (f" — FAILING: {fails}" if fails else ""))
sys.exit(1 if fails else 0)
