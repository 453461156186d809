#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB on the same parquet tables — the
single-node engine baseline, per query.

The oracle SQL replays each query's exact algorithm (same hashes, same
fixed-point discipline), so this measures DuckDB executing the same
logical computation the Spark entry runs — engine vs engine, same
machine, same files. Warm pass first, then per-query min over REPS
full-suite passes (the Bench.scala discipline, so contention bands
decorrelate across passes).

Usage: bench_duckdb.py [sfDir] [oracleJson] [outJson]
Defaults: /root/testdata/sf0.1  /tmp/presnapshot_out/oracle_sql.json
          /tmp/duckdb_bench.json
"""
import duckdb, json, sys, time

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/presnapshot_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duckdb_bench.json"
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

con = duckdb.connect()
import os
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written dataset directory
        p += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
names = sorted(oracle)

# warm: one full pass absorbs buffer-pool fill and casts the first-run cost
for n in names:
    t0 = time.perf_counter()
    try:
        con.execute(oracle[n]).fetchall()
        print(f"warm {n} {time.perf_counter() - t0:.2f}s", flush=True)
    except Exception as e:
        print(f"WARM-ERR {n}: {str(e).splitlines()[0][:120]}", flush=True)

# NaN never wins a `<` comparison, so updating best with a failed rep's NaN
# would be order-dependent (a first-pass failure pins NaN even if later
# passes succeed): skip the update entirely on exception and report it.
best = {}
for p in range(reps):
    for n in names:
        t0 = time.perf_counter()
        try:
            con.execute(oracle[n]).fetchall()
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"REP-ERR pass {p + 1} {n}: {str(e).splitlines()[0][:120]}",
                  flush=True)
            best.setdefault(n, float("nan"))
            continue
        if n not in best or not (dt >= best[n]):  # handles prior NaN too
            best[n] = dt
    print(f"pass {p + 1}/{reps} done", flush=True)

total = sum(v for v in best.values() if v == v)
out = {"sf": sf, "agg": f"min-of-{reps}-passes", "total_sec": round(total, 3),
       "queries": {k: round(v, 3) for k, v in sorted(best.items())}}
json.dump(out, open(out_path, "w"), indent=None)
print(json.dumps({"metric": "duckdb_oracle_suite_sec", "value": round(total, 3),
                  "n_queries": len(best)}))
