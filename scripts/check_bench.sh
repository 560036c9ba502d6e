#!/usr/bin/env bash
# Bench-gate guard: run graft.Bench exactly the way the driver does and
# assert the stdout TAIL parses as the driver parses it — last line =
# pure JSON with the expected fields. Guards the regression class that
# cost rounds 1-3 their bench numbers (sbt [info] prefixes / shutdown
# noise printed after the JSON line). Usage:
#   scripts/check_bench.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.001}
OUT=$(mktemp)
# a guard run at a small SF writes its full-run artifact to its own
# scratch path, never the one a real round run might be using
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_BENCH_OUT=$OUT.full.json \
  sbt -batch "runMain graft.Bench" >"$OUT" 2>/dev/null
python3 - "$OUT" <<'EOF'
import json, sys
lines = [l.rstrip("\n") for l in open(sys.argv[1]) if l.strip()]
last = lines[-1]
try:
    j = json.loads(last)
except Exception as e:
    print(f"BENCH GUARD FAIL: last stdout line is not pure JSON: {e}\n{last[:200]}")
    sys.exit(1)
for field in ("metric", "value", "unit", "n_queries", "queries", "sf"):
    assert field in j, f"BENCH GUARD FAIL: missing field {field}"
assert j["value"] > 0 and j["n_queries"] > 0
# the driver reads a bounded tail: the machine-readable line must fit it
assert len(last) <= 2000, f"BENCH GUARD FAIL: tail line {len(last)} chars > 2000"
print(f"bench guard OK: {j['n_queries']} queries, {j['value']}s, tail {len(last)} chars")
EOF
