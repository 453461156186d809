#!/usr/bin/env bash
# Pre-snapshot gate: run before ANY end-of-round commit.
# Fails loudly if the tree would not pass the driver's correctness flow.
#   1. sbt Test/compile   — the round-5 failure mode (snapshot didn't build)
#   2. sbt test           — full ScalaTest suite
#   3. graft.Verify       — dump every SparkEntry.queries result at sf0.01
#   4. check_oracle.py    — strict DuckDB compare, expect "FAILURES: 0"
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/presnapshot_out}"

echo "== 1/4 sbt Test/compile"
sbt -batch Test/compile

echo "== 2/4 sbt test"
sbt -batch test

echo "== 3/4 graft.Verify $SF -> $OUT"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep '\[verify\]' \
  && { echo "verify reported per-query failures"; exit 1; } || true

echo "== 4/4 oracle gate"
python3 tools/check_oracle.py "$SF" "$OUT" | tee /tmp/presnapshot_oracle.log
grep -q '^FAILURES: 0$' /tmp/presnapshot_oracle.log \
  || { echo "ORACLE GATE FAILED"; exit 1; }

echo "PRESNAPSHOT: ALL GREEN"
