package graft

/** Registry hygiene: the driver treats any query without an oracle entry
  * as a weaker rows-only check, so a typo'd oracle key would silently
  * downgrade a query's verification. Pin the exact rows-only set.
  */
class RegistrySpec extends SparkSpec {

  test("every oracle key names a query; rows-only is exactly the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle entries without a query: ${o -- q}")
    val rowsOnly = q -- o
    // EMPTY since r15 (VERDICT r14 ask #3): the last two sketch rows,
    // count_distinct_approx (D3) and hll_count_rollup (G7), graduated
    // to the percentile_approx_scale ε-verdict pattern — exact counts
    // hash-compared, estimates surfaced as within-bound booleans the
    // oracle asserts TRUE; the raw-estimate laws stay in HllSpec.
    val expected = Set.empty[String]
    // (percentile_approx_scale graduated r11: it emits ε-bound
    // verdicts, oracled as TRUE literals over DuckDB's exact counts)
    // watermark_late_drop graduated in r10: the append-mode sink is
    // oracled as the batch windowed agg over windows closed by the
    // final watermark (max event-ms - 30 min), value-exact via dsum.
    // The sketch keys above additionally carry cross-sf monotonicity
    // pins (HllSpec) since r10.
    // Graduated to structural (persisted-layout) oracles — the engine-
    // specific hash/model outputs become parquet INPUT data DuckDB
    // re-derives the pipeline from: ann_ivf_partition_pruned (r3),
    // lsh_hyperplane_near_dup + ann_pq_adc (r4), minhash_near_dedup +
    // simhash_dedup + minhash_udaf_signature + ann_kmeans_ivf (r5).
    // stateful_token_cache graduated in r5 via a linear RECURSIVE CTE
    // replaying the serveTokens state walk per client.
    assert(rowsOnly === expected,
      s"rows-only drift: extra=${rowsOnly -- expected} missing=${expected -- rowsOnly}")
  }

  test("approx_top_count exactness precondition: distinct items fit the sketch budget") {
    // the operator's full hash oracle is only sound because an
    // ItemsSketch is provably exact while tracked items exceed the
    // distinct count — a regenerated fixture with a high-cardinality
    // event_type must fail HERE (loudly), not as a wrong-but-plausible
    // oracle mismatch. Budget literals mirror ExtendedOps
    // approx_top_k(event_type, 10, 100).
    val distinct = Tables.events(spark, sf())
      .select("event_type").distinct().count()
    assert(distinct <= 10,
      s"$distinct distinct event types exceed the sketch's k=10 — " +
        "approx_top_count's exactness argument no longer holds")
    assert(distinct <= 100, "tracked-item budget (100) overflowed")
  }

  test("no DecimalType in any decimal-accumulating query's output schema") {
    // r12 decimal ban (VERDICT r11 ask #2): the driver's hash compare
    // reds any decimal128 output column even when both engines emit
    // value-identical, type-aligned decimal128 — so DECIMAL may exist
    // only INTERNALLY; the SELECT boundary must be int64 or strings.
    // Verify.hasDecimal enforces this over the whole suite every dump;
    // here the four formerly-red queries plus the heaviest decimal-
    // accumulating kin are pinned in-suite so the ban trips at sbt-test
    // time, before a dump ever runs.
    val watch = Seq(
      "embedding_covariance_topk", "incremental_stats_merge",
      "random_projection_jl", "pq_subspace_recon_error",
      "embedding_pca_power_iter", "embedding_dim_stats",
      "embedding_outlier_filter", "cuped_variance_reduction",
      "percentile_approx_scale", "twap_by_event_type",
      "jackknife_loo_nation", "seasonal_residual_outliers")
    for (k <- watch) {
      val schema = SparkEntry.queries(k)(spark, sf()).schema
      val dec = schema.filter(f => Verify.hasDecimal(f.dataType))
      assert(dec.isEmpty,
        s"$k emits decimal output column(s): ${dec.map(_.name).mkString(", ")}")
    }
  }

  test("no query key collides across operator groups") {
    val all = SparkEntry.groups.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query keys (map merge drops one): $dups")
    val allO = SparkEntry.groups.flatMap(_.oracleSql.keys)
    val dupsO = allO.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupsO.isEmpty, s"duplicate oracle keys: $dupsO")
  }
}
