#!/usr/bin/env bash
# Bench-artifact sanity gate (r14, VERDICT r13 ask #1; rising rule
# revised r16, VERDICT r15 ask #2; load-aware r18, VERDICT r17 ask #1):
# REJECT a bench run whose numbers a loaded VM inflated past isolated
# truth, instead of committing whatever the machine produced. Checks
# over the full bench JSON (the `fullLine` artifact with per-query run
# triples):
#
#   1. SANITY ANCHORS — queries whose isolated cost is known and stable
#      across rounds must come in under a generous ceiling (set ~2x the
#      isolated truth the r13 judge measured at sf0.1):
#        group_hash_agg          <= 0.3 s   (isolated 0.14-0.19)
#        kneser_ney_continuation <= 1.0 s   (isolated 0.39-0.44)
#        scan_orc_roundtrip      <= 1.0 s   (isolated 0.36-0.46)
#        posexplode_tracknum     <= 1.0 s   (isolated ~0.68)
#        hurst_rs_daily          <= 1.0 s   (isolated ~0.40-0.49)
#      r18: the caps are LOAD-CALIBRATED — the artifact's `load_probe`
#      (group_hash_agg timed at sweep start/end vs its 0.17 s
#      cross-round isolated truth) scales every cap, clamped to [1, 3]x,
#      so a loaded epoch no longer coin-flips the verdict (the r17
#      driver re-run self-rejected on a bit-identical plan at loadavg
#      5.02). A breach of the SCALED cap that the artifact's
#      `adjudications` stamp classifies as `load` (the key re-measured
#      in its own JVM within threshold) is a note; an unadjudicated or
#      `plan`-classified breach rejects.
#   2. RISING TRIPLES — a per-query (r1, r2, r3) that strictly rises
#      with spread > 2x means contention grew DURING the measurement.
#      The quoted stat is min-of-3, and in a rising triple the min is
#      run 1 — measured under the LEAST load — so (r16) a rising shape
#      REJECTS only when the min itself regressed past 1.5x the prior
#      round's committed figure for that query; otherwise it prints as
#      an informational note. Priors come from a second artifact arg,
#      or AUTO (the newest committed gate-pass sf-matched
#      BENCH_rNN.json — ADVICE r17 #3: never a by-name newest that
#      might be gate-rejected). This mirrors graft.BenchGate exactly
#      (the in-process gate inside Bench.main) — BenchGateSpec pins
#      both directions.
#
# Usage: scripts/bench_gate.sh [bench.json] [prior.json|AUTO]
#   (defaults: target/bench_run.json — the current run's scratch
#    artifact — and AUTO)
# Exit 0 = artifact is quotable; exit 1 = re-run the bench.
set -euo pipefail
cd "$(dirname "$0")/.."
IN=${1:-target/bench_run.json}
PRIOR=${2:-AUTO}

python3 - "$IN" "$PRIOR" <<'EOF'
import glob, json, os, re, sys
j = json.load(open(sys.argv[1]))
prior_path = sys.argv[2]

def payload(p):
    # the driver's wrapper nests the payload under "parsed" (BenchGate's
    # jackson loader handles the same shape)
    return p["parsed"] if isinstance(p.get("parsed"), dict) else p

sf = lambda d: os.path.basename(str(d.get("sf", "")).rstrip("/"))

def load_prior(path):
    p = payload(json.load(open(path)))
    if sf(p) != sf(j):
        return None, f"prior sf {sf(p)!r} != run sf {sf(j)!r}"
    if p.get("gate") != "pass":
        # ADVICE r16 #1/#4: a gate-rejected (or gate-less) artifact must
        # never seed the rising-triple thresholds — a load-inflated prior
        # would raise the 1.5x bar and mask genuine regressions
        return None, f"prior gate={p.get('gate')!r} != 'pass' - refused"
    return p.get("queries", {}), None

priors = {}
if prior_path == "AUTO":
    # newest committed gate-pass sf-matched artifact — identical
    # resolution to BenchGate.loadPriors(AUTO) (ADVICE r17 #3)
    arts = sorted(glob.glob("BENCH_r*.json"),
                  key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
                  reverse=True)
    for a in arts:
        try:
            got, why = load_prior(a)
        except Exception:
            continue
        if got:
            priors = got
            print(f"bench gate: AUTO prior -> {a} ({len(priors)} figures)")
            break
    if not priors:
        print("bench gate: no gate-pass sf-matched committed artifact - "
              "rising triples downgrade to notes")
elif prior_path and os.path.isfile(prior_path):
    priors, why = load_prior(prior_path)
    if priors is None:
        print(f"bench gate: {why}; rising triples downgrade to notes")
        priors = {}

anchors = {
    "group_hash_agg": 0.3,
    "kneser_ney_continuation": 1.0,
    "scan_orc_roundtrip": 1.0,
    "posexplode_tracknum": 1.0,
    "hurst_rs_daily": 1.0,
}
RISING_MIN_FACTOR = 1.5
# load calibration (r18): scale anchor caps by the artifact's own probe
# factor, clamped exactly as BenchGate.loadFactor does
probe = j.get("load_probe", {})
factor = min(3.0, max(1.0, float(probe.get("factor", 1.0))))
if factor > 1.0:
    print(f"bench gate: load probe factor {factor:.2f}x "
          f"(start {probe.get('start_sec')}s end {probe.get('end_sec')}s "
          f"vs ref {probe.get('ref_sec')}s) - anchor caps scaled")
adj = {(a.get("kind"), a.get("key")): a for a in j.get("adjudications", [])}
bad, notes = [], []
qs = j["queries"]
# anchor caps are sf0.1 isolated truths (Bench scopes them identically)
if sf(j) != "sf0.1":
    anchors = {}
for q, cap in anchors.items():
    cap_eff = cap * factor
    if q in qs and qs[q] > cap_eff:
        a = adj.get(("anchor", q))
        if a and a.get("violation_class") == "load":
            notes.append(f"ANCHOR {q}: {qs[q]}s > {cap_eff:.3f}s but "
                         f"adjudicated load (isolated {a.get('isolated_s')}s "
                         f"<= threshold {a.get('threshold_s')}s)")
        else:
            bad.append(f"ANCHOR {q}: {qs[q]}s > {cap_eff:.3f}s"
                       + (" (scaled)" if factor > 1.0 else ""))
for q, runs in j.get("runs", {}).items():
    if len(runs) >= 3 and all(runs[i] < runs[i+1] for i in range(len(runs)-1)) \
            and max(runs) > 2.0 * max(min(runs), 0.05):
        lo = min(runs)
        if q in priors and lo > RISING_MIN_FACTOR * max(priors[q], 0.05):
            a = adj.get(("rising", q))
            if a and a.get("violation_class") == "load":
                notes.append(f"RISING {q}: min {lo} > {RISING_MIN_FACTOR}x "
                             f"prior {priors[q]} but adjudicated load "
                             f"(isolated {a.get('isolated_s')}s)")
            else:
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
