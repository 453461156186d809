#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the Spark result with pandas/pyarrow (NOT via DuckDB — DuckDB would
coerce both sides to its own types and hide dtype divergence: the driver's
hash gate sees int64 5 vs float64 5.0 as different values). The oracle side
runs in DuckDB and comes back via fetchdf(), exactly like the driver.

Comparison is order-insensitive (rows sorted, columns sorted by name) and
STRICT: dtype kinds must match and values must match exactly (floats by
bit pattern, not tolerance).

Usage: check_oracle.py [sfDir] [outDir] [namePrefixes]
  namePrefixes: optional comma-separated query-name prefixes — check only
  those (local iteration after a partial Verify run; the full gate always
  runs with no filter).
"""
import duckdb, json, sys, math, struct
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
prefixes = sys.argv[3].split(",") if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(v):
    # exact canonicalization: no int<->float bridging, float by bit pattern
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return "f" + struct.pack(">d", v).hex()
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return type(v).__name__ + ":" + str(v)

def norm(df):
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)

fails = 0
if prefixes:
    oracle = {k: v for k, v in oracle.items()
              if any(k.startswith(p) for p in prefixes)}
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"{name}: SPARK RESULT MISSING: {e}"); fails += 1; continue
    # The driver canonicalizes with pandas sort_values over ALL columns;
    # array-typed output columns raise "unhashable type: numpy.ndarray"
    # there even though the tuple-sort below handles them fine. Replicate
    # that sort so the failure class is caught locally (r07: q95/q100/q128).
    try:
        got.sort_values(by=list(got.columns))
        exp.sort_values(by=list(exp.columns))
    except Exception as e:
        print(f"{name}: DRIVER-SORT HAZARD (pandas sort_values): {e}")
        fails += 1; continue
    if sorted(exp.columns) != sorted(got.columns):
        print(f"{name}: COLUMN MISMATCH spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
        fails += 1; continue
    cols = sorted(exp.columns)
    dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in cols
                   if got[c].dtype.kind != exp[c].dtype.kind]
    if dt_mismatch:
        print(f"{name}: DTYPE MISMATCH (spark vs oracle): {dt_mismatch}")
        fails += 1; continue
    a, b = norm(got), norm(exp)
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"); fails += 1; continue
    if a == b:
        print(f"{name}: OK ({len(a)} rows)")
    else:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"{name}: VALUE MISMATCH ({sum(1 for x, y in zip(a, b) if x != y)} rows), first: {diffs}")
        fails += 1
print("FAILURES:", fails)
