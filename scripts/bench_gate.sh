#!/usr/bin/env bash
# Bench-artifact sanity gate (r14, VERDICT r13 ask #1): REJECT a bench
# run whose numbers a loaded VM inflated past isolated truth, instead of
# committing whatever the machine produced. Two checks over the full
# bench JSON (the `fullLine` artifact with per-query run triples):
#
#   1. SANITY ANCHORS — queries whose isolated cost is known and stable
#      across rounds must come in under a generous ceiling (set ~2x the
#      isolated truth the r13 judge measured at sf0.1). A breach means
#      the whole run was taken under load and NOTHING in it should be
#      quoted:
#        group_hash_agg          <= 0.3 s   (isolated 0.14-0.19)
#        kneser_ney_continuation <= 1.0 s   (isolated 0.39-0.44)
#        scan_orc_roundtrip      <= 1.0 s   (isolated 0.36-0.46)
#        posexplode_tracknum     <= 1.0 s   (isolated ~0.68)
#        hurst_rs_daily          <= 1.0 s   (isolated ~0.40-0.49)
#   2. NO RISING TRIPLES — a per-query (r1, r2, r3) that strictly rises
#      with spread > 2x means contention grew DURING the measurement
#      (min-of-3 may still save the headline number, but the artifact
#      would carry load noise in its runs and fail the r12 "runs do not
#      trend upward" criterion).
#
# Usage: scripts/bench_gate.sh [bench.json]   (default bench_full.json)
# Exit 0 = artifact is quotable; exit 1 = re-run the bench.
set -euo pipefail
cd "$(dirname "$0")/.."
IN=${1:-bench_full.json}

python3 - "$IN" <<'EOF'
import json, sys
j = json.load(open(sys.argv[1]))
anchors = {
    "group_hash_agg": 0.3,
    "kneser_ney_continuation": 1.0,
    "scan_orc_roundtrip": 1.0,
    "posexplode_tracknum": 1.0,
    "hurst_rs_daily": 1.0,
}
bad = []
qs = j["queries"]
for q, cap in anchors.items():
    if q in qs and qs[q] > cap:
        bad.append(f"ANCHOR {q}: {qs[q]}s > {cap}s")
n_rising = 0
for q, runs in j.get("runs", {}).items():
    if len(runs) >= 3 and all(runs[i] < runs[i+1] for i in range(len(runs)-1)) \
            and max(runs) > 2.0 * max(min(runs), 0.05):
        n_rising += 1
        bad.append(f"RISING {q}: runs {runs}")
if j.get("n_failed", 0) > 0:
    bad.append(f"FAILED QUERIES: {j.get('failed', j['n_failed'])}")
# r15: Bench self-gates at run time and stamps its own verdict; an
# artifact that declares itself unquotable is rejected here too, even
# if the accepted triples would pass the re-check above.
if j.get("gate") == "reject":
    bad.append(f"SELF-GATE REJECT: {j.get('gate_violations', [])}")
for b in bad:
    print(f"BENCH GATE FAIL: {b}")
print(f"bench gate: {len(qs)} queries, total {j['value']}s, "
      f"{len(bad)} violations -> {'REJECT' if bad else 'OK'}")
sys.exit(1 if bad else 0)
EOF
