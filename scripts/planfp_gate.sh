#!/usr/bin/env bash
# Plan-fingerprint gate (r15, VERDICT r14 ask #5): a silent physical-plan
# change (broadcast→SMJ, lost pushdown, new mid-plan exchange) must not
# land unnamed. Regenerates the per-query canonical-plan hashes and
# compares them to the committed artifact:
#
#   - UNCHANGED fingerprint  -> ok
#   - NEW query              -> ok (new operators fingerprint on arrival)
#   - REMOVED query          -> needs a `plan-change: <query>` line in SURVEY.md
#   - CHANGED fingerprint    -> needs a `plan-change: <query>` line in SURVEY.md
#
# On success the fresh artifact replaces the committed one (so the
# changelog line and the new hash land in the same commit). Usage:
#   scripts/planfp_gate.sh [committed.json] [sfDir]
# Defaults: PLANFINGERPRINT_r15.json, /root/testdata/sf0.001.
# Exit 0 = plans accounted for; exit 1 = unexplained plan change.
set -euo pipefail
cd "$(dirname "$0")/.."
ART=${1:-PLANFINGERPRINT_r15.json}
SF=${2:-/root/testdata/sf0.001}
NEW=/tmp/planfp_new.json
LOG=/tmp/planfp_gate.log

echo "== PlanFingerprint sweep at $SF -> $NEW (log: $LOG) =="
if ! sbt -batch "runMain graft.PlanFingerprint $SF $NEW" >"$LOG" 2>&1; then
  tail -n 40 "$LOG"
  echo "PLANFP SWEEP CRASHED (sbt exit != 0; full log: $LOG)"
  exit 1
fi

python3 - "$ART" "$NEW" <<'EOF'
import json, os, re, shutil, sys
art, new_path = sys.argv[1], sys.argv[2]
new = json.load(open(new_path))["fingerprints"]
old = {}
if os.path.exists(art):
    old = json.load(open(art))["fingerprints"]
survey = open("SURVEY.md").read()
named = set(re.findall(r"plan-change:\s*`?([A-Za-z0-9_]+)`?", survey))
bad = []
for q in sorted(set(old) | set(new)):
    if q not in old:
        continue  # new query: fingerprints on arrival
    if q not in new:
        status = "REMOVED"
    elif old[q]["fp"] != new[q]["fp"]:
        status = f"CHANGED {old[q]['fp'][:12]} -> {new[q]['fp'][:12]}"
    else:
        continue
    if q in named:
        print(f"planfp: {q} {status} (named in SURVEY changelog - ok)")
    else:
        bad.append(f"{q} {status}")
for b in bad:
    print(f"PLANFP GATE FAIL: {b} (no `plan-change: {b.split()[0]}` line in SURVEY.md)")
n_changed = sum(1 for q in old if q in new and old[q]["fp"] != new[q]["fp"])
n_new = len(set(new) - set(old))
print(f"planfp gate: {len(new)} queries, {n_new} new, {n_changed} changed, "
      f"{len(bad)} unexplained -> {'REJECT' if bad else 'OK'}")
if bad:
    sys.exit(1)
shutil.copyfile(new_path, art)
print(f"planfp gate: committed artifact refreshed -> {art}")
EOF
