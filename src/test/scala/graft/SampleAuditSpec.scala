package graft

import org.apache.spark.sql.functions._

/** Semantic pins for SampleAuditOps — weighting bias, order-statistic
  * identity, and checksum invariance laws.
  */
class SampleAuditSpec extends SparkSpec {

  test("weighted_reservoir_sample: length-weighting biases the sample long") {
    val rows = operators.SampleAuditOps.queries("weighted_reservoir_sample")(
      spark, sf()).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).distinct.length === 20, "without replacement")
    // keys are sorted desc with doc_id tiebreak
    val keys = rows.map(r => (-r.getLong(2), r.getLong(0)))
    assert(keys.sorted.sameElements(keys))
    // expected-weighting law: the sample's mean length exceeds the
    // corpus mean (P[include] grows with w)
    val corpusMean = Tables.documents(spark, sf())
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean ≤ corpus mean $corpusMean")
  }

  test("hill_tail_index: reads exactly the top order statistics") {
    val Array(r) = operators.SampleAuditOps.queries("hill_tail_index")(
      spark, sf()).collect()
    val top = Tables.orders(spark, sf())
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .orderBy(col("c").desc).limit(101).collect().map(_.getLong(0))
    assert(r.getLong(1) === top.min, "pivot is the 101st largest value")
    assert(r.getLong(0) === top.count(_ > top.min).toLong,
      "k_used counts strictly-above-pivot statistics")
    assert(r.getLong(2) > 0, "positive tail index on positive data")
    // γ̂ below ln(max/pivot): the mean of logs can't beat the max log
    val maxLr = math.log(top.max.toDouble / top.min.toDouble) * 1e6
    assert(r.getLong(2) <= maxLr.toLong + 1)
  }

  test("table_checksum_rollup: checksum is partitioning- and order-invariant") {
    val rows = operators.SampleAuditOps.queries("table_checksum_rollup")(
      spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("customer", "nation", "supplier"))
    val n = Map("nation" -> Tables.nation(spark, sf()).count(),
      "customer" -> Tables.customer(spark, sf()).count(),
      "supplier" -> Tables.supplier(spark, sf()).count())
    rows.foreach(r => assert(r.getLong(1) === n(r.getString(0))))
    // invariance: recompute the customer checksum over a repartitioned,
    // reshuffled copy — the commutative fold must not care
    val base = rows.find(_.getString(0) == "customer").get.getLong(2)
    val re = Tables.customer(spark, sf())
      .repartition(13, col("c_mktsegment"))
      .select(expr(
        "CAST(conv(substring(md5(concat_ws('|', CAST(c_custkey AS STRING), c_name, CAST(c_nationkey AS STRING), c_mktsegment, CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        .as("h"))
      .agg(sum("h")).collect()(0).getLong(0)
    assert(re === base, "checksum invariant under repartitioning")
  }
}
