#!/usr/bin/env bash
# sf0.1 value-oracle slice (r18, VERDICT r17 ask #7): the driver's
# DuckDB hash compare runs at sf0.01/sf0.001 only, so a SCALE-DEPENDENT
# divergence (a fixed-point truncation that only bites at bigger
# aggregates, an overflow, an order-by-luck pass) would be invisible.
# This runs the same Verify-dump + column-sorted value compare at
# sf0.1 for the ~TARGET cheapest-oracle queries (DuckDB must rebuild
# every oracle from raw parquet, so the expensive corpus oracles are
# excluded by a per-query time budget — the exclusions are LISTED in
# the artifact, never silent).
#
# Usage: scripts/check_sf01.sh [out.json] [nCandidates] [target]
# Defaults: CHECK_SF01_r18.json 80 50
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-CHECK_SF01_r18.json}
NCAND=${2:-80}
TARGET=${3:-50}
SF=/root/testdata/sf0.1
DUMP=/tmp/graft_check_sf01
CPUS=${SPARK_GRAFT_CPUS:-16}

# candidates: the cheapest oracled queries by the newest committed
# gate-pass full bench artifact (cheap Spark side correlates with cheap
# oracle side well enough for candidate selection; the real filter is
# the measured oracle time below)
KEYS=$(python3 - "$NCAND" <<'EOF'
import glob, json, re, sys
n = int(sys.argv[1])
costs = {}
for a in sorted(glob.glob("BENCH_r*.json"),
                key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
                reverse=True):
    try:
        j = json.load(open(a))
        p = j["parsed"] if isinstance(j.get("parsed"), dict) else j
        if p.get("gate") == "pass" and len(p.get("queries", {})) >= 400:
            costs = p["queries"]; break
    except Exception:
        pass
if not costs:
    sys.exit("no committed gate-pass full bench artifact for candidates")
print(",".join(k for k, _ in sorted(costs.items(), key=lambda kv: kv[1])[:n]))
EOF
)
echo "check_sf01: $(echo "$KEYS" | tr ',' '\n' | wc -l) candidates"

rm -rf "$DUMP"
LOG=$DUMP.log
if ! SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_ONLY=$KEYS \
    sbt -batch "runMain graft.Verify $SF $DUMP" >"$LOG" 2>&1; then
  tail -n 30 "$LOG"; echo "VERIFY CRASHED at sf0.1"; exit 1
fi
if grep -E '\[verify\].*failed' "$LOG"; then
  echo "VERIFY FAILURES at sf0.1 ^"; exit 1
fi

python3 - "$SF" "$DUMP" "$OUT" "$TARGET" <<'EOF'
import json, math, os, sys, time
import duckdb
sf_dir, out_dir, out_json, target = \
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
ORACLE_BUDGET_S = 2.0

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)

con = duckdb.connect()
for t in TABLES:
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

rows, failed, dropped = {}, [], []
qdirs = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
for name in qdirs:
    if name not in oracle:
        dropped.append({"key": name, "why": "rows-only (no oracle SQL)"})
        continue
    t0 = time.time()
    try:
        odf = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        failed.append({"key": name, "why": f"ORACLE-SQL-FAIL {e}"[:300]})
        continue
    dt = time.time() - t0
    if dt > ORACLE_BUDGET_S:
        dropped.append({"key": name,
                        "why": f"oracle {dt:.1f}s > {ORACLE_BUDGET_S}s budget"})
        continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet("
        f"'{os.path.join(out_dir, name)}/*.parquet')").fetch_arrow_table()
    scols, ocols = sorted(sdf.column_names), sorted(odf.column_names)
    if scols != ocols:
        failed.append({"key": name, "why": f"SCHEMA {scols} vs {ocols}"})
        continue
    srows = [tuple(norm(r[c]) for c in scols) for r in sdf.to_pylist()]
    orows = [tuple(norm(r[c]) for c in ocols) for r in odf.to_pylist()]
    if len(srows) != len(orows):
        failed.append({"key": name,
                       "why": f"ROWS {len(srows)} vs {len(orows)}"})
        continue
    bad = sum(1 for a, b in zip(srows, orows) if a != b)
    if bad:
        failed.append({"key": name, "why": f"VALUES {bad}/{len(srows)} differ"})
    else:
        rows[name] = {"rows": len(srows), "oracle_s": round(dt, 2)}

art = {"metric": "check_sf01", "sf": sf_dir,
       "protocol": "Verify dump at sf0.1 + DuckDB column-sorted value "
                   "compare (the driver's hash-compare semantics) for the "
                   "cheapest-oracle declared queries; per-oracle budget "
                   f"{ORACLE_BUDGET_S}s, exclusions listed",
       "n_compared": len(rows), "n_failed": len(failed),
       "n_dropped": len(dropped), "failed": failed, "dropped": dropped,
       "queries": rows}
json.dump(art, open(out_json, "w"), indent=1)
for k in sorted(rows):
    print(f"PASS {k}: {rows[k]['rows']} rows ({rows[k]['oracle_s']}s oracle)")
for f in failed:
    print(f"FAIL {f['key']}: {f['why']}")
for d in dropped:
    print(f"DROP {d['key']}: {d['why']}")
print(f"\n{len(rows)} compared value-exact at sf0.1, {len(failed)} failed, "
      f"{len(dropped)} dropped -> {out_json}")
sys.exit(1 if failed or len(rows) < target else 0)
EOF
