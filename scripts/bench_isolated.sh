#!/usr/bin/env bash
# Isolated re-bench (r14, VERDICT r13 ask #4): run the N most expensive
# queries of a full bench artifact EACH IN ITS OWN JVM (SPARK_GRAFT_ONLY
# to one key, Bench's own untimed-warm + min-of-3 protocol) and write
# BENCH_ISOLATED_<out>.json. This is the artifact that settles every
# future "regression or noise?" dispute in one command: a query whose
# full-suite number exceeds its isolated number by far was measured
# under shared-JVM/shared-VM load, not a plan change.
#
# Each JVM is launched directly (java -cp, the build.sbt JDK-17
# add-opens), not through sbt — no build-tool startup inside the
# measurement, and truly nothing survives between queries.
#
# Usage: scripts/bench_isolated.sh [fullBench.json|AUTO] [out.json] [topN]
# Defaults: AUTO (newest committed gate-pass sf-matched BENCH_rNN.json
# — r18, VERDICT r17 ask #8: no untracked-scratch default)
#           BENCH_ISOLATED_r18.json 20
set -euo pipefail
cd "$(dirname "$0")/.."
IN=${1:-AUTO}
OUT=${2:-BENCH_ISOLATED_r18.json}
TOPN=${3:-20}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
CPUS=${SPARK_GRAFT_CPUS:-8}

sbt -batch compile >/dev/null 2>&1

if [ "$IN" = "AUTO" ]; then
  IN=$(python3 - "$SF" <<'EOF'
import glob, json, os, re, sys
sf = os.path.basename(sys.argv[1].rstrip("/"))
for a in sorted(glob.glob("BENCH_r*.json"),
                key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
                reverse=True):
    try:
        j = json.load(open(a))
        p = j["parsed"] if isinstance(j.get("parsed"), dict) else j
        if p.get("gate") == "pass" \
                and os.path.basename(str(p.get("sf", "")).rstrip("/")) == sf:
            print(a); break
    except Exception:
        pass
EOF
)
  [ -n "$IN" ] || { echo "no committed gate-pass artifact for $SF" >&2; exit 1; }
  echo "bench_isolated: AUTO input -> $IN"
fi

KEYS=$(python3 - "$IN" "$TOPN" <<'EOF'
import json, sys
j = json.load(open(sys.argv[1]))
if isinstance(j.get("parsed"), dict):
    j = j["parsed"]
top = sorted(j["queries"].items(), key=lambda kv: -kv[1])[:int(sys.argv[2])]
print("\n".join(k for k, _ in top))
EOF
)

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# A failed java run (or one that prints no {"metric"} line) must land in
# the artifact as an explicit failure, never vanish silently — a dropped
# key would under-report coverage with exit 0 (ADVICE r14: set -e can't
# trip because grep sits mid-pipeline feeding head).
: > /tmp/bench_isolated_lines.txt
: > /tmp/bench_isolated_failed.txt
for k in $KEYS; do
  echo "== isolated bench: $k ==" >&2
  LINE=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$k SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_NO_ADJUDICATE=1 \
    java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench 2>/dev/null | grep '{"metric"' | head -1 || true)
  if [ -n "$LINE" ]; then
    echo "$LINE" >> /tmp/bench_isolated_lines.txt
  else
    echo "$k" >> /tmp/bench_isolated_failed.txt
    echo "== isolated bench: $k PRODUCED NO METRIC LINE ==" >&2
  fi
done

python3 - "$IN" "$OUT" "$SF" "$CPUS" <<'EOF'
import json, sys
full = json.load(open(sys.argv[1]))
if isinstance(full.get("parsed"), dict):
    full = full["parsed"]
rows = {}
for line in open("/tmp/bench_isolated_lines.txt"):
    j = json.loads(line)
    for q, t in j["queries"].items():
        rows[q] = {"isolated": t, "full_suite": full["queries"].get(q),
                   "ratio_full_over_isolated":
                       round(full["queries"].get(q, t) / max(t, 1e-9), 2)}
failed = [l.strip() for l in open("/tmp/bench_isolated_failed.txt")
          if l.strip()]
art = {"metric": "bench_isolated", "sf": sys.argv[3], "cpus": int(sys.argv[4]),
       "method": "one JVM per query, untimed warm + min of 3 timed runs",
       "source_artifact": sys.argv[1], "n_queries": len(rows),
       "n_failed": len(failed), "failed": failed,
       "queries": rows}
json.dump(art, open(sys.argv[2], "w"), indent=1)
for q, r in sorted(rows.items(), key=lambda kv: -kv[1]["isolated"]):
    print(f"{q}: isolated {r['isolated']}s, full {r['full_suite']}s "
          f"(x{r['ratio_full_over_isolated']})")
print(f"\n{len(rows)} queries ({len(failed)} failed: {failed}) "
      f"-> {sys.argv[2]}")
sys.exit(1 if failed else 0)
EOF
