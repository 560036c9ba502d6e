package graft

import org.apache.spark.sql.functions._

/** Semantic pins for ExperimentOps + RRF — fusion accounting, CUPED
  * bounds, and the budget-conservation law.
  */
class ExperimentSpec extends SparkSpec {

  test("rrf_rank_fusion: fuses exactly the two legs' candidates") {
    val rows = operators.RankingOps.queries("rrf_rank_fusion")(
      spark, sf()).collect()
    assert(rows.length >= 10 && rows.length <= 20,
      "union of two ≤10-candidate legs")
    rows.foreach { r =>
      val bm = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val de = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(bm.isDefined || de.isDefined)
      val expected = bm.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        de.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) === expected, s"doc ${r.getLong(0)} RRF replay")
    }
    // a doc ranked by BOTH legs must outscore one ranked 10th by a
    // single leg (the fusion property)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(3)).max > single.map(_.getLong(3)).min)
  }

  test("cuped_variance_reduction: reduction factor lives in [0, 1]") {
    val Array(r) = operators.ExperimentOps.queries(
      "cuped_variance_reduction")(spark, sf()).collect()
    assert(r.getLong(0) === Tables.events(spark, sf())
      .select("user_id").distinct().count(), "one covariate row per user")
    val vr = r.getLong(3)
    assert(vr >= 0L && vr <= 1000000L, s"1−ρ² out of range: $vr")
    assert(vr < 1000000L, "pre-period correlates at least a little")
  }

  test("neyman_allocation_plan: allocation conserves the budget exactly") {
    val rows = operators.ExperimentOps.queries("neyman_allocation_plan")(
      spark, sf()).collect()
    assert(rows.map(_.getLong(3)).sum === 1000L, "Σ alloc = budget")
    val totN = rows.map(_.getLong(1)).sum
    assert(totN === Tables.customer(spark, sf()).count())
    rows.foreach(r => assert(r.getLong(3) >= 0))
    // allocation follows the weights: the heaviest stratum gets the
    // largest share
    val byW = rows.maxBy(_.getLong(2))
    assert(byW.getLong(3) === rows.map(_.getLong(3)).max)
  }
}
