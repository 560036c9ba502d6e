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
#   - LOST fp_exec coverage  -> gate FAILURE (r17, ADVICE r16 #2): an old
#     entry carrying any fp_exec* field whose regenerated twin lacks it is
#     a coverage regression, never a silent skip — previously a machine
#     without a local bench artifact would regenerate-and-commit an
#     artifact with every executed-plan fingerprint stripped.
#
# Round scoping (ADVICE r15): changelog lines are round-TAGGED —
# `plan-change(r16): query` — and only lines tagged with the CURRENT
# round (PLANFP_ROUND, default derived from the artifact filename's
# rNN) explain a change. Untagged legacy `plan-change: query` lines
# from rounds <= 15 are grandfathered ONLY when the artifact filename
# still says r15 or lower; from r16 on, an old changelog line cannot
# silently bless a future regression of the same query.
#
# Executed-plan coverage (r17, VERDICT r16 ask #1): the top-40 queries
# by committed bench cost run at sf0.001 (fp_exec), sf0.1
# (fp_exec@sf0.1) AND the synthetic sf1.0 decade (fp_exec@sf1.0) — a
# runtime-only AQE re-plan that appears only at 10x data is pinned
# here. The sf1.0 fixture is ScaleGen-synthesized on demand.
#
# On success the fresh artifact replaces the committed one (so the
# changelog line and the new hash land in the same commit). Usage:
#   scripts/planfp_gate.sh [committed.json] [sfDir]
# Defaults: PLANFINGERPRINT_r18.json, /root/testdata/sf0.001.
# Exit 0 = plans accounted for; exit 1 = unexplained plan change.
set -euo pipefail
cd "$(dirname "$0")/.."
ART=${1:-PLANFINGERPRINT_r18.json}
SF=${2:-/root/testdata/sf0.001}
ROUND=${PLANFP_ROUND:-$(basename "$ART" | grep -oE 'r[0-9]+' || echo rX)}
export PLANFP_ROUND_RESOLVED=$ROUND
NEW=/tmp/planfp_new.json
LOG=/tmp/planfp_gate.log
SF1DIR=${SCALE_SF1_DIR:-/tmp/graft_sf1}

export PLANFP_EXEC_TOP=${PLANFP_EXEC_TOP:-40}
# exec coverage is monotone: the sweep unions every key the committed
# artifact already executed (cost-map jitter widens coverage, never
# strips it)
if [ -f "$ART" ]; then
  export PLANFP_COMMITTED=$ART
else
  export PLANFP_COMMITTED=$(ls PLANFINGERPRINT_r*.json 2>/dev/null \
    | sort -V | tail -1 || true)
fi
if [ -z "${PLANFP_EXEC_EXTRA_SFS:-}" ]; then
  if [ ! -d "$SF1DIR/lineitem.parquet" ]; then
    echo "== ScaleGen: synthesizing sf1.0 at $SF1DIR (for fp_exec@sf1.0) =="
    SPARK_GRAFT_CPUS=32 sbt -batch \
      "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1DIR" 2>/dev/null \
      | grep scalegen || true
  fi
  export PLANFP_EXEC_EXTRA_SFS="sf0.1=/root/testdata/sf0.1,sf1.0=$SF1DIR"
fi

echo "== PlanFingerprint sweep at $SF -> $NEW (log: $LOG) =="
echo "   exec top $PLANFP_EXEC_TOP; extra sfs: $PLANFP_EXEC_EXTRA_SFS"
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
# current-round tagged lines only: plan-change(r17): query
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
    statuses = []
    if q not in new:
        statuses.append("REMOVED")
    else:
        if old[q]["fp"] != new[q]["fp"]:
            statuses.append(f"CHANGED {old[q]['fp'][:12]} -> {new[q]['fp'][:12]}")
        # r16: a runtime-only plan change (AQE re-plan at execution) is
        # invisible to the initial-plan hash but not to fp_exec*. r17
        # (ADVICE r16 #2): losing an fp_exec* field the old artifact had
        # is a COVERAGE regression and fails the gate outright — a
        # changelog line cannot bless it.
        for key in sorted(k for k in old[q] if k.startswith("fp_exec")):
            if key not in new[q]:
                bad.append(f"{q} EXEC-COVERAGE-LOST {key} (regenerate with "
                           "the bench artifact and extra-sf fixtures "
                           "present; a changelog line cannot bless this)")
            elif old[q][key] != new[q][key]:
                statuses.append(f"EXEC-CHANGED[{key}] "
                                f"{old[q][key][:12]} -> {new[q][key][:12]}")
    for status in statuses:
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
n_exec = sum(1 for q in new if "fp_exec" in new[q])
n_exec_extra = sum(1 for q in new for k in new[q] if k.startswith("fp_exec@"))
print(f"planfp gate: {len(new)} queries, {n_new} new, {n_changed} changed, "
      f"{n_exec} executed (+{n_exec_extra} extra-sf), "
      f"{len(bad)} unexplained -> {'REJECT' if bad else 'OK'}")
if bad:
    sys.exit(1)
shutil.copyfile(new_path, art)
print(f"planfp gate: committed artifact refreshed -> {art}")
EOF
