#!/usr/bin/env bash
# Bench-artifact sanity gate (r14, VERDICT r13 ask #1; rising rule
# revised r16, VERDICT r15 ask #2): REJECT a bench run whose numbers a
# loaded VM inflated past isolated truth, instead of committing whatever
# the machine produced. Checks over the full bench JSON (the `fullLine`
# artifact with per-query run triples):
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
#   2. RISING TRIPLES — a per-query (r1, r2, r3) that strictly rises
#      with spread > 2x means contention grew DURING the measurement.
#      The quoted stat is min-of-3, and in a rising triple the min is
#      run 1 — measured under the LEAST load — so (r16) a rising shape
#      REJECTS only when the min itself regressed past 1.5x the prior
#      round's committed figure for that query; otherwise it prints as
#      an informational note (the r15 false-reject: rich_club_knn
#      [0.780, 0.780, 1.847] unquotified a 501-query artifact whose
#      quoted 0.780 was clean). Priors come from a second artifact arg
#      (per-query seconds, sf-matched); without one, rising shapes are
#      notes only. This mirrors graft.BenchGate exactly (the in-process
#      gate inside Bench.main) — BenchGateSpec pins both directions.
#
# Usage: scripts/bench_gate.sh [bench.json] [prior.json]
#   (defaults: bench_full.json, none)
# Exit 0 = artifact is quotable; exit 1 = re-run the bench.
set -euo pipefail
cd "$(dirname "$0")/.."
IN=${1:-bench_full.json}
PRIOR=${2:-}

python3 - "$IN" "$PRIOR" <<'EOF'
import json, os, sys
j = json.load(open(sys.argv[1]))
prior_path = sys.argv[2]
priors = {}
if prior_path and os.path.isfile(prior_path):
    p = json.load(open(prior_path))
    # the driver's wrapper nests the payload under "parsed" (BenchGate's
    # jackson loader handles the same shape)
    if isinstance(p.get("parsed"), dict):
        p = p["parsed"]
    # sf-matched only: sf0.01 priors would flag every healthy sf0.1 query
    sf = lambda d: os.path.basename(str(d.get("sf", "")).rstrip("/"))
    if sf(p) != sf(j):
        print(f"bench gate: prior sf {sf(p)!r} != run sf {sf(j)!r} - "
              "rising triples downgrade to notes")
    elif p.get("gate") != "pass":
        # ADVICE r16 #1/#4: a gate-rejected (or gate-less) artifact must
        # never seed the rising-triple thresholds — a load-inflated prior
        # would raise the 1.5x bar and mask genuine regressions
        print(f"bench gate: prior artifact gate={p.get('gate')!r} != "
              "'pass' - refused; rising triples downgrade to notes")
    else:
        priors = p.get("queries", {})
anchors = {
    "group_hash_agg": 0.3,
    "kneser_ney_continuation": 1.0,
    "scan_orc_roundtrip": 1.0,
    "posexplode_tracknum": 1.0,
    "hurst_rs_daily": 1.0,
}
RISING_MIN_FACTOR = 1.5
bad, notes = [], []
qs = j["queries"]
for q, cap in anchors.items():
    if q in qs and qs[q] > cap:
        bad.append(f"ANCHOR {q}: {qs[q]}s > {cap}s")
for q, runs in j.get("runs", {}).items():
    if len(runs) >= 3 and all(runs[i] < runs[i+1] for i in range(len(runs)-1)) \
            and max(runs) > 2.0 * max(min(runs), 0.05):
        lo = min(runs)
        if q in priors and lo > RISING_MIN_FACTOR * max(priors[q], 0.05):
            bad.append(f"RISING {q}: runs {runs} min {lo} > "
                       f"{RISING_MIN_FACTOR}x prior {priors[q]}")
        else:
            ref = (f"within {RISING_MIN_FACTOR}x prior {priors[q]}"
                   if q in priors else "no prior figure")
            notes.append(f"rising {q}: runs {runs} ({ref} - quoted min "
                         "untouched)")
if j.get("n_failed", 0) > 0:
    bad.append(f"FAILED QUERIES: {j.get('failed', j['n_failed'])}")
# r15: Bench self-gates at run time and stamps its own verdict; an
# artifact that declares itself unquotable is rejected here too, even
# if the accepted triples would pass the re-check above.
if j.get("gate") == "reject":
    bad.append(f"SELF-GATE REJECT: {j.get('gate_violations', [])}")
for n in notes:
    print(f"bench gate note: {n}")
for b in bad:
    print(f"BENCH GATE FAIL: {b}")
print(f"bench gate: {len(qs)} queries, total {j['value']}s, "
      f"{len(notes)} notes, {len(bad)} violations -> "
      f"{'REJECT' if bad else 'OK'}")
sys.exit(1 if bad else 0)
EOF
