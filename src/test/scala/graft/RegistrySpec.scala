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
    val expected = Set(
      "count_distinct_approx",     // HLL++ output is approximate
      "minhash_near_dedup",        // xxhash64 values are engine-specific
      "minhash_udaf_signature",    // ditto (Aggregator surface exhibit)
      "simhash_dedup",             // ditto
      "stateful_token_cache",      // recursive keyed state, not SQL-expressible
      "watermark_late_drop",       // append-mode emission timing
      "ann_kmeans_ivf",            // learned-model output
      "percentile_approx_scale",   // sketch output
      "hll_count_rollup")          // DataSketches estimates (BigQuery
                                   // HLL_COUNT analog); ε + merge law
                                   // pinned in HllSpec
    // ann_ivf_partition_pruned graduated to a structural oracle in round 3:
    // the serving layout + persisted centroids are inputs, DuckDB re-derives
    // the probe + exact cosine top-k (SemiStructuredOps.oracleSql).
    assert(rowsOnly === expected,
      s"rows-only drift: extra=${rowsOnly -- expected} missing=${expected -- rowsOnly}")
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
