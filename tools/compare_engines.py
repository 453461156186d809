#!/usr/bin/env python3
"""Join the Spark per-query bench (BENCH_DETAIL.json) with the DuckDB
oracle bench (tools/bench_duckdb.py output) and print the engine-vs-engine
ratio table, slowest-Spark-relative first.

Usage: compare_engines.py [benchDetail] [duckJson]
"""
import json, sys

spark_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
duck_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duckdb_bench.json"
sp = json.load(open(spark_path))
du = json.load(open(duck_path))
sq, dq = sp["queries"], du["queries"]
common = sorted(set(sq) & set(dq))
rows = [(n, sq[n], dq[n], sq[n] / dq[n] if dq[n] else float("inf"))
        for n in common]
rows.sort(key=lambda r: -r[3])
print(f"{'query':34} {'spark_s':>8} {'duck_s':>8} {'spark/duck':>10}")
for n, s, d, r in rows:
    print(f"{n:34} {s:8.3f} {d:8.3f} {r:10.2f}")
st, dt = sum(sq[n] for n in common), sum(dq[n] for n in common)
n_faster = sum(1 for r in rows if r[3] < 1.0)
med = sorted(r[3] for r in rows)[len(rows) // 2]
print(f"\ncommon queries: {len(common)}  spark total {st:.1f}s  "
      f"duckdb total {dt:.1f}s  (suite ratio {st / dt:.2f})")
print(f"spark faster on {n_faster}/{len(rows)}; median per-query ratio {med:.2f}")
