#!/usr/bin/env bash
# Scale-trend gate (r10, VERDICT r9 ask #3): run the most expensive
# DATA-PROPORTIONAL queries at sf0.01 AND sf0.1 in one artifact and
# assert time(sf0.1)/time(sf0.01) stays sub-linear-ish (< 15x for 10x
# the data). This catches a quadratic candidate blowup — the failure
# class neither COPYCHECK nor PlanAudit can see — the moment it
# appears, instead of at a 100x deployment.
#
# Query choice: the near-dup / pair-generation / graph families (the
# operators where an all-pairs regression is even possible) plus the
# heaviest join+window batch queries. Streaming queries are excluded
# (checkpoint/state-store floors, not data-proportional) as are the
# sink-roundtrip fixtures (staging-write bound).
#
# Usage: scripts/scale_gate.sh [out.json]   (default SCALE_r17.json)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-SCALE_r17.json}
QUERIES=${SCALE_GATE_QUERIES:-dup_span_detect,ngram_novelty_score,cross_source_contamination,market_basket_affinity,cooc_triangle_count,lsh_hyperplane_near_dup,minhash_near_dedup,semantic_dedup_cluster,kcore_graph_prune,label_propagation_knn,ship_latency_by_priority,markov_next_event_topk,curation_pipeline_e2e,chunk_dedup_reassemble,exact_dedup_hash,kl_divergence_source_unigram,cross_entropy_by_source,dedup_threshold_sweep,containment_near_dup,session_sequence_rules,percentile_rank_normalize,ks_two_sample_value,theil_sen_nation_trend,vocab_coverage_curve,split_leakage_audit,embedding_covariance_topk,embedding_pca_power_iter,quantile_sketch_merge,interval_overlap_months,weighted_percentile_value,kneser_ney_continuation,kcenter_farthest_seeds,spearman_rank_corr,mann_whitney_u_value,minmax_prune_simulation,delta_bitpack_estimate,dwell_time_by_transition,psi_value_drift,position_based_attribution,local_clustering_coefficient,stupid_backoff_logprob,char_entropy_by_source,golden_record_merge,minhash_candidate_quality,event_type_trigrams,cohort_ltv_curve,vocab_gini_by_source,curriculum_stage_plan,ips_policy_value,split_conformal_interval,coarsened_exact_matching_att,order_fill_curve,price_elasticity_brand,supplier_share_shift,brand_margin_rollup,rank_within_grouping_sets,map_hof_ops,blocklist_flag_rate,slo_error_budget_burn,half_sample_ci,semantic_tau_sweep,audience_overlap_matrix,negative_sampling_table,frequent_word_subsampling,term_burstiness_topk,top_bigram_mass,random_projection_jl,pq_subspace_recon_error,dup_chunk_fraction,softdedup_weighting,wilson_ci_flag_rate,proportional_quota_fill,winnowing_fingerprints,burrows_delta_sources,chao1_vocab_richness,quantile_normalize_doclen,snapshot_diff_audit,hll_intersection_estimate,dau_mau_stickiness,join_cardinality_estimate,gini_split_stump,welch_t_value,mase_seasonal_naive,importance_weight_ess,bcubed_cluster_eval,markov_stationary_dist,langid_calibration_ece,media_phash_near_dup,bh_fdr_ks_nations,delta_method_ratio_ci,l_diversity_audit,nelson_aalen_hazard,sprt_conversion_monitor,markov_entropy_rate,simpson_diversity_by_source,fellegi_sunter_weights,time_decay_revenue,kmv_distinct_sketch,logrank_test_arms,eb_shrinkage_rates,graph_modularity_labels,theil_inequality_decomp,gumbel_return_level,littles_law_backlog,mcnemar_langid_pair,armitage_trend_priority,kruskal_wallis_priority,rich_club_knn,mkn_discount_estimation,rho_loss_selection,seasonal_mann_kendall,markov_removal_attribution,matryoshka_dim_recall,rake_keyphrases,ab_mde_power_grid,jonckheere_trend_value,sharp_rdd_discount,did_revenue_segments,t_closeness_audit,quantile_treatment_effect,chapman_dedup_estimate,chatterjee_xi_corr,atkinson_inequality,yuen_trimmed_t,js_divergence_sources,odds_ratio_weekend,covariate_balance_smd,rmst_survival,kleinberg_burst_days,mattr_lexical_diversity,yule_k_richness,pettitt_changepoint,holt_winters_daily,friedman_test_priority,runs_test_daily,wasserstein_doclen_drift,cliff_delta_weekend,durbin_watson_ols,gesd_outlier_daily,token_bigram_cond_entropy,embedding_anisotropy,powerlaw_alpha_mle,sample_entropy_daily,hurst_rs_daily,flesch_kincaid_by_source,energy_distance_value,page_trend_test,renyi_entropy_spectrum,pacf_durbin_levinson,var_es_daily_revenue,mcc_langid,gamma_somers_priority_qty,weibull_latency_fit,qq_deciles_value,lz78_complexity_daily,poisson_dispersion_daily,vocab_rank_churn,cochran_q_weekday,bowker_symmetry_langid,embedding_clip_calibration,brown_forsythe_priority,ansari_bradley_value,neardup_transitivity_audit}
CPUS=${SPARK_GRAFT_CPUS:-8}
THRESHOLD=${SCALE_GATE_THRESHOLD:-15.0}

# One run, both artifacts (r14, VERDICT r13 ask #3): when BENCH_OUT is
# set (2nd positional arg), the sf0.1 full-suite bench_full.json this
# script produces IS copied there as the round's BENCH artifact — so
# SCALE_r{N}.json's t_sf0.1 column and BENCH_r{N}.json can never
# disagree; they are the same run by construction.
BENCH_OUT=${2:-}

# Load-immune artifact loop (r14, VERDICT r13 ask #1): the sf0.1 leg is
# validated by scripts/bench_gate.sh (sanity anchors ~2x isolated truth
# + no rising run-triples) and RE-RUN until it passes, instead of
# committing whatever a loaded VM produced. Hard retry cap so a genuine
# regression fails the script loudly rather than looping forever.
BENCH_GATE_RETRIES=${BENCH_GATE_RETRIES:-3}

# SCALE_GATE_QUERIES=ALL (r13, VERDICT r12 ask #6): sweep EVERY declared
# query — constant-state queries (streaming state floors, sink
# roundtrips, enum-bounded scalars) trivially pass the ratio test via
# the 0.15 s denominator floor, and the artifact alone then answers
# "is anything super-linear" with no curated-list archaeology. The
# sf0.1 full pass is ordered LAST so the bench_full.json it writes is
# the same full-suite sf0.1 artifact the round commits.
# Priors come from the newest COMMITTED gate-pass BENCH_rNN.json (r17,
# ADVICE r16 #4): the old snapshot took whatever bench_full.json sat in
# the working tree — possibly a gate-rejected or stale run — and applied
# no gate-pass check. BenchGate itself re-verifies gate=="pass" and the
# sf match, so a reject artifact can never seed the thresholds; Bench's
# in-process gate gets the same resolution via AUTO.
PRIOR=$(ls BENCH_r*.json 2>/dev/null | grep -E '^BENCH_r[0-9]+\.json$' \
  | sort -V | tail -1 || true)
echo "scale gate: prior artifact = ${PRIOR:-<none>}"

run_bench() { # $1 = sf dir name
  local sf=$1
  echo "== Bench at $sf (cpus=$CPUS): $QUERIES =="
  if [ "$QUERIES" = "ALL" ]; then ONLY=""; else ONLY=$QUERIES; fi
  # grep to a file first, THEN head: `head -1` inside the pipeline
  # closes the pipe while Bench is still printing its duplicate JSON
  # line, and pipefail turns that SIGPIPE into exit 141
  SPARK_GRAFT_SF_DIR=/root/testdata/$sf SPARK_GRAFT_ONLY=$ONLY \
    SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_PRIOR_BENCH=${PRIOR:-AUTO} \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '{"metric"' > /tmp/scale_gate_all_$sf.json
  head -1 /tmp/scale_gate_all_$sf.json > /tmp/scale_gate_$sf.json
}

run_bench sf0.01
attempt=1
while true; do
  run_bench sf0.1
  # the gate only applies to FULL-suite runs (anchors assume the full
  # artifact); targeted iteration runs skip it
  if [ "$QUERIES" != "ALL" ] || scripts/bench_gate.sh bench_full.json "$PRIOR"; then
    break
  fi
  if [ "$attempt" -ge "$BENCH_GATE_RETRIES" ]; then
    echo "bench gate: still failing after $attempt attempts — NOT a load" \
         "blip; investigate before committing" >&2
    exit 1
  fi
  attempt=$((attempt + 1))
  echo "bench gate: rejected run (attempt $attempt/$BENCH_GATE_RETRIES)," \
       "re-running the sf0.1 leg" >&2
done
if [ -n "$BENCH_OUT" ] && [ "$QUERIES" = "ALL" ]; then
  # One round, ONE quotable artifact (r16, VERDICT r15 ask #8): never
  # clobber an existing gate-pass artifact with a gate-reject run — the
  # reject lands beside it as *_rerun.json so the filesystem alone says
  # which number is quotable.
  python3 - bench_full.json "$BENCH_OUT" <<'PYEOF'
import json, shutil, sys
src, dst = sys.argv[1], sys.argv[2]
new = json.load(open(src))
try:
    old = json.load(open(dst))
except Exception:
    old = None
if new.get("gate") == "reject" and old is not None \
        and old.get("gate") == "pass":
    alt = dst.replace(".json", "_rerun.json")
    shutil.copyfile(src, alt)
    print(f"bench artifact: REFUSED to overwrite gate-pass {dst} with a "
          f"gate-reject run -> {alt}")
else:
    shutil.copyfile(src, dst)
    print(f"bench artifact (same run as the scale gate) -> {dst}")
PYEOF
fi

python3 - "$OUT" "$THRESHOLD" <<'EOF'
import json, sys
out, threshold = sys.argv[1], float(sys.argv[2])
lo = json.load(open('/tmp/scale_gate_sf0.01.json'))
hi = json.load(open('/tmp/scale_gate_sf0.1.json'))
# Denominator floor for the HEADLINE number (r17, VERDICT r16 ask #3):
# a sub-0.25 s sf0.01 time is dominated by session/codegen overhead, so
# its ratio is floor noise (r16's 8.32 "worst" sat on a 0.164 s
# denominator over a single WindowGroupLimit plan). Such queries still
# pass/fail the 15x gate (with the 0.15 s ratio floor), but they are
# banded as floor_noise and can never produce the suite's worst ratio.
HEADLINE_DENOM_FLOOR = 0.25
rows, failed = {}, []
for k, t_hi in hi['queries'].items():
    t_lo = lo['queries'][k]
    # floor tiny denominators: a 0.05 s sf0.01 time is session overhead,
    # not plan cost, and would turn a healthy 1 s sf0.1 run into a fake 20x
    ratio = t_hi / max(t_lo, 0.15)
    ok = ratio < threshold
    rows[k] = {"t_sf0.01": round(t_lo, 3), "t_sf0.1": round(t_hi, 3),
               "ratio": round(ratio, 2), "pass": ok,
               "band": "measured" if t_lo >= HEADLINE_DENOM_FLOOR
                       else "floor_noise"}
    if not ok:
        failed.append(k)
measured = {k: r for k, r in rows.items() if r["band"] == "measured"}
headline = max(measured.items(), key=lambda kv: kv[1]["ratio"]) \
    if measured else None
artifact = {"metric": "scale_trend", "data_ratio": 10,
            "threshold": threshold, "n_queries": len(rows),
            "n_failed": len(failed), "failed": failed,
            "headline_denominator_floor_sec": HEADLINE_DENOM_FLOOR,
            "n_floor_noise": len(rows) - len(measured),
            "headline_worst": (
                {"query": headline[0], **headline[1]} if headline else None),
            "queries": rows}
with open(out, "w") as f:
    json.dump(artifact, f, indent=1)
for k, r in sorted(rows.items(), key=lambda kv: -kv[1]["ratio"]):
    print(f"{'PASS' if r['pass'] else 'FAIL'} {k}: "
          f"{r['t_sf0.01']}s -> {r['t_sf0.1']}s (x{r['ratio']})"
          f"{' [floor-noise denom]' if r['band'] == 'floor_noise' else ''}")
if headline:
    print(f"\nheadline worst (denominator >= {HEADLINE_DENOM_FLOOR}s): "
          f"{headline[0]} x{headline[1]['ratio']}")
print(f"{len(rows)-len(failed)}/{len(rows)} pass -> {out}")
sys.exit(1 if failed else 0)
EOF
