package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter membership pre-filter (SURVEY §2.L surface; the C4
  * scale pattern): expose Spark's OWN runtime-filter machinery —
  * `BloomFilterAggregate` (a commutative OR-merge monoid: partial
  * per-mapper bitsets union across any partitioning) and
  * `BloomFilterMightContain` (codegen'd probe) — as registry functions,
  * keyed by xxhash64 exactly like `InjectRuntimeFilter` does.
  *
  * Why: at 100 TB the exact hash join of a daily batch against a
  * historical dedup index shuffles the index every run. A Bloom bitset
  * over the index keys is a few MB broadcast; rows whose key is
  * DEFINITELY absent (the common case for fresh crawl data) skip the
  * join entirely, and only possible members pay the exact confirmation
  * join. The bloom has NO false negatives, so the final verdicts are
  * bit-identical to the exact join — false positives merely take the
  * slow path and come back NULL. The filter is therefore invisible to
  * the DuckDB oracle: `bloom_prefilter_dedup` shares
  * `incremental_dedup_index`'s oracle verbatim.
  *
  * Determinism note: the bitset itself is deterministic (fixed xxhash64
  * seed, OR-merge is order-free) but engine-specific — which is why the
  * declared output carries only exact-join-derived columns; the
  * pre-filter selectivity and the no-false-negative law are pinned in
  * CorpusDedupSpec, not the oracle.
  */
object BloomDedup {
  /** Register `bloom_agg(key, estimatedItems, numBits)` and
    * `bloom_might_contain(bf, key)` (idempotent).
    */
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("bloom_agg", exprs =>
      new BloomFilterAggregate(new XxHash64(Seq(exprs.head)),
        exprs(1), exprs(2)).toAggregateExpression(), "built-in")
    fr.createOrReplaceTempFunction("bloom_might_contain", exprs =>
      BloomFilterMightContain(exprs.head, new XxHash64(Seq(exprs(1)))),
      "built-in")
  }
}
