#!/usr/bin/env bash
# Plan-fingerprint gate (r15, VERDICT r14 ask #5): a silent physical-plan
# change (broadcast→SMJ, lost pushdown, new mid-plan exchange) must not
# land unnamed. Regenerates the per-query canonical-plan hashes and
# compares them to the committed artifact:
#
#   - UNCHANGED fingerprint  -> ok
#   - NEW query              -> ok (new operators fingerprint on arrival)
#   - REMOVED query          -> needs a round-tagged `plan-change(rNN): <query>`
#   - CHANGED fingerprint    -> needs a round-tagged `plan-change(rNN): <query>`
#
# Round scoping (ADVICE r15): changelog lines are round-TAGGED —
# `plan-change(r16): query` — and only lines tagged with the CURRENT
# round (PLANFP_ROUND, default derived from the artifact filename's
# rNN) explain a change. Untagged legacy `plan-change: query` lines
# from rounds <= 15 are grandfathered ONLY when the artifact filename
# still says r15 or lower; from r16 on, an old changelog line cannot
# silently bless a future regression of the same query.
#
# On success the fresh artifact replaces the committed one (so the
# changelog line and the new hash land in the same commit). Usage:
#   scripts/planfp_gate.sh [committed.json] [sfDir]
# Defaults: PLANFINGERPRINT_r16.json, /root/testdata/sf0.001.
# Exit 0 = plans accounted for; exit 1 = unexplained plan change.
set -euo pipefail
cd "$(dirname "$0")/.."
ART=${1:-PLANFINGERPRINT_r16.json}
SF=${2:-/root/testdata/sf0.001}
ROUND=${PLANFP_ROUND:-$(basename "$ART" | grep -oE 'r[0-9]+' || echo rX)}
export PLANFP_ROUND_RESOLVED=$ROUND
NEW=/tmp/planfp_new.json
LOG=/tmp/planfp_gate.log

echo "== PlanFingerprint sweep at $SF -> $NEW (log: $LOG) =="
if ! sbt -batch "runMain graft.PlanFingerprint $SF $NEW" >"$LOG" 2>&1; then
  tail -n 40 "$LOG"
  echo "PLANFP SWEEP CRASHED (sbt exit != 0; full log: $LOG)"
  exit 1
fi

python3 - "$ART" "$NEW" "$ROUND" <<'EOF'
import json, os, re, shutil, sys
art, new_path, round_tag = sys.argv[1], sys.argv[2], sys.argv[3]
new = json.load(open(new_path))["fingerprints"]
old = {}
if os.path.exists(art):
    old = json.load(open(art))["fingerprints"]
else:
    # first run of a new round: baseline against the latest committed
    # prior-round artifact instead of an empty map (an empty baseline
    # would wave every plan through as "new")
    import glob
    prior = sorted(glob.glob("PLANFINGERPRINT_r*.json"),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if prior:
        print(f"planfp gate: no {art} yet - baselining against {prior[-1]}")
        old = json.load(open(prior[-1]))["fingerprints"]
survey = open("SURVEY.md").read()
# current-round tagged lines only: plan-change(r16): query
named = set(re.findall(
    r"plan-change\(" + re.escape(round_tag) + r"\):\s*`?([A-Za-z0-9_]+)`?",
    survey))
# legacy untagged lines grandfathered through r15 artifacts only
legacy_ok = re.fullmatch(r"r(\d+)", round_tag) and \
    int(round_tag[1:]) <= 15
if legacy_ok:
    named |= set(re.findall(r"plan-change:\s*`?([A-Za-z0-9_]+)`?", survey))
bad = []
for q in sorted(set(old) | set(new)):
    if q not in old:
        continue  # new query: fingerprints on arrival
    if q not in new:
        status = "REMOVED"
    elif old[q]["fp"] != new[q]["fp"]:
        status = f"CHANGED {old[q]['fp'][:12]} -> {new[q]['fp'][:12]}"
    elif "fp_exec" in old[q] and "fp_exec" in new[q] \
            and old[q]["fp_exec"] != new[q]["fp_exec"]:
        # r16: a runtime-only plan change (AQE re-plan at execution)
        # is invisible to the initial-plan hash but not to fp_exec
        status = (f"EXEC-CHANGED {old[q]['fp_exec'][:12]} -> "
                  f"{new[q]['fp_exec'][:12]}")
    else:
        continue
    if q in named:
        print(f"planfp: {q} {status} (named in SURVEY {round_tag} "
              "changelog - ok)")
    else:
        bad.append(f"{q} {status}")
for b in bad:
    print(f"PLANFP GATE FAIL: {b} (no `plan-change({round_tag}): "
          f"{b.split()[0]}` line in SURVEY.md)")
n_changed = sum(1 for q in old if q in new and old[q]["fp"] != new[q]["fp"])
n_new = len(set(new) - set(old))
print(f"planfp gate: {len(new)} queries, {n_new} new, {n_changed} changed, "
      f"{len(bad)} unexplained -> {'REJECT' if bad else 'OK'}")
if bad:
    sys.exit(1)
shutil.copyfile(new_path, art)
print(f"planfp gate: committed artifact refreshed -> {art}")
EOF
