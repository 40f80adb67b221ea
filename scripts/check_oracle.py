#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py [sfdir] [verify_out]
Runs each oracle_sql.json query in DuckDB against the sf parquet tables
and strictly compares (schema, rows, values) with the Spark dump.
"""
import duckdb, json, glob, pathlib, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Memory-robust oracle (mirrors the r11 driver-gate OOM fix): bound the
# working set BELOW the box headroom and give DuckDB a spill directory,
# so a memory-starved box (e.g. a 48g bench JVM running beside the
# gate) degrades to disk spill instead of OutOfMemoryException inside
# the oracle. The bound must stay generous (the recursive-CTE oracles
# legitimately hold multi-GB intermediates that cannot all spill — 2GB
# broke 18 of them), and the connection must be FRESH per query: a
# shared connection accrues non-evictable buffer-pool state across the
# 250+ queries until a later query OOMs at ANY limit (measured:
# ann_sq8 fails in a shared 24GB connection, passes standalone at 8GB).
def fresh_con():
    c = duckdb.connect()
    c.execute("SET memory_limit='24GB'")
    c.execute(f"SET temp_directory='{out}/.duck_spill'")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        c.execute(f"CREATE VIEW {pathlib.Path(p).stem} AS SELECT * FROM read_parquet('{p}')")
    return c

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for q in sorted(oracle):
    try:
        con = fresh_con()
        got = con.execute(f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").fetchdf()
        exp = con.execute(oracle[q]).fetchdf()
        con.close()
    except Exception as e:
        print(f"FAIL {q}: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    problems = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif got.shape != exp.shape:
        problems.append(f"shape {got.shape} != {exp.shape}")
    else:
        if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
            problems.append(f"dtypes {list(map(str,got.dtypes))} != {list(map(str,exp.dtypes))}")
        neq = (got.astype(str) != exp.astype(str))
        if neq.any().any():
            bad = neq.any(axis=1)
            problems.append("values:\nspark:\n" + got[bad].head(3).to_string() +
                            "\nduck:\n" + exp[bad].head(3).to_string())
    if problems:
        fails += 1
        print(f"FAIL {q}: " + "; ".join(problems))
    else:
        print(f"OK   {q} ({got.shape[0]} rows)")
print(f"{len(oracle)-fails}/{len(oracle)} oracle-matched")
sys.exit(1 if fails else 0)
