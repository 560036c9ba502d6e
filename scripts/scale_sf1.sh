#!/usr/bin/env bash
# One-more-decade scale proof (r16, VERDICT r15 ask #1): synthesize a
# deterministic sf1.0 fixture (graft.ScaleGen — 10x sf0.1 with
# decorrelated copies) and run the heaviest / quadratic-shaped queries
# at sf0.1 AND sf1.0, asserting time(sf1.0)/time(sf0.1) < 15 for 10x
# the data — the same protocol as scripts/scale_gate.sh one decade up.
# The query list is the r15 verdict's: the cell-join kNN-graph family,
# positional-gram span dedup, the global-rank xi, the capped wedge
# join, and all five CDC maintain audits.
#
# Usage: scripts/scale_sf1.sh [out.json]   (default SCALE_SF1_r18.json)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-SCALE_SF1_r18.json}
SF1DIR=${SCALE_SF1_DIR:-/tmp/graft_sf1}
CPUS=${SPARK_GRAFT_CPUS:-32}
THRESHOLD=${SCALE_SF1_THRESHOLD:-15.0}
# AUTO (r18, VERDICT r17 ask #3): every key the committed
# plan-fingerprint artifact carries an fp_exec for, plus the BenchGate
# anchors — so every executed-plan fingerprint at the decade has a
# MEASURED decade cost next to it (r17 fingerprinted 43 keys at sf1.0
# but timed only 17, so the two AQE flip keys' costs were adjudicated,
# not measured).
QUERIES=${SCALE_SF1_QUERIES:-AUTO}
if [ "$QUERIES" = "AUTO" ]; then
  QUERIES=$(python3 - <<'EOF'
import glob, json, re
arts = sorted(glob.glob("PLANFINGERPRINT_r*.json"),
              key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
keys = set()
if arts:
    fps = json.load(open(arts[-1]))["fingerprints"]
    keys = {k for k, v in fps.items() if any(x.startswith("fp_exec")
                                             for x in v)}
keys |= {"group_hash_agg", "kneser_ney_continuation", "scan_orc_roundtrip",
         "posexplode_tracknum", "hurst_rs_daily"}
print(",".join(sorted(keys)))
EOF
)
  echo "scale_sf1: AUTO key set ($(echo "$QUERIES" | tr ',' '\n' | wc -l) keys)"
fi

sbt -batch compile >/dev/null 2>&1

if [ ! -d "$SF1DIR/lineitem.parquet" ]; then
  echo "== ScaleGen: synthesizing sf1.0 at $SF1DIR =="
  SPARK_GRAFT_CPUS=$CPUS sbt -batch \
    "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1DIR" 2>/dev/null \
    | grep scalegen
fi

run_bench() { # $1 = sf dir, $2 = tag
  echo "== Bench at $1 (cpus=$CPUS) =="
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$QUERIES SPARK_GRAFT_CPUS=$CPUS \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '{"metric"' > /tmp/scale_sf1_all_$2.json
  head -1 /tmp/scale_sf1_all_$2.json > /tmp/scale_sf1_$2.json
}

run_bench /root/testdata/sf0.1 lo
run_bench "$SF1DIR" hi

python3 - "$OUT" "$THRESHOLD" <<'EOF'
import json, sys
out, threshold = sys.argv[1], float(sys.argv[2])
lo = json.load(open('/tmp/scale_sf1_lo.json'))
hi = json.load(open('/tmp/scale_sf1_hi.json'))
rows, failed = {}, []
for k, t_hi in hi['queries'].items():
    t_lo = lo['queries'][k]
    ratio = t_hi / max(t_lo, 0.15)
    ok = ratio < threshold
    rows[k] = {"t_sf0.1": round(t_lo, 3), "t_sf1.0": round(t_hi, 3),
               "ratio": round(ratio, 2), "pass": ok}
    if not ok:
        failed.append(k)
artifact = {"metric": "scale_trend_sf1", "data_ratio": 10,
            "threshold": threshold, "n_queries": len(rows),
            "n_failed": len(failed), "failed": failed,
            "fixture": "graft.ScaleGen 10x-decorrelated sf0.1 replica",
            "queries": rows}
with open(out, "w") as f:
    json.dump(artifact, f, indent=1)
for k, r in sorted(rows.items(), key=lambda kv: -kv[1]["ratio"]):
    print(f"{'PASS' if r['pass'] else 'FAIL'} {k}: "
          f"{r['t_sf0.1']}s -> {r['t_sf1.0']}s (x{r['ratio']})")
print(f"\n{len(rows)-len(failed)}/{len(rows)} pass -> {out}")
sys.exit(1 if failed else 0)
EOF
