#!/usr/bin/env bash
# One-command correctness adjudication: the full Verify dump + the
# DuckDB-oracle compare, exactly what the driver's CORRECTNESS gate
# runs (and what the round-6 judge assembled by hand). Prints the
# per-key PASS/FAIL lines and the final "N/M pass" line. Usage:
#   scripts/judge.sh [sfDir] [cpus]   (defaults: /root/testdata/sf0.01, 8)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
CPUS=${2:-8}
OUT=/tmp/graft_judge_$(basename "$SF")
echo "== Verify: full query suite at $SF (cpus=$CPUS) -> $OUT =="
SPARK_GRAFT_CPUS=$CPUS sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 \
  | grep -E '\[verify\].*failed' && { echo "VERIFY FAILURES ^"; exit 1; } || true
echo "== DuckDB oracle compare =="
python3 scripts/check.py "$SF" "$OUT"
