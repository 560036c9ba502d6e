package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the measuring instrument behind PLANAUDIT's measured
  * adjudications (r17, VERDICT r16 ask #4): if
  * `measuredSinglePartitionRows` silently read zeros (the df.count
  * separate-plan bug this round found), every bound would pass
  * vacuously — so the spec asserts the reader returns the TRUE row
  * count through a known single-partition funnel, and nothing on a
  * plan that has none.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("reads the true row count through a single-partition exchange") {
    val n = 1234
    // a partition-less window forces Exchange SinglePartition
    val df = (1 to n).toDF("x").repartition(4)
      .withColumn("r", row_number().over(Window.orderBy("x")))
      .groupBy(lit(1)).agg(sum("r"))
    df.queryExecution.toRdd.count()
    val (sp, cart) =
      PlanAudit.measuredSinglePartitionRows(df.queryExecution.executedPlan)
    assert(cart.isEmpty)
    assert(sp.nonEmpty, "the single-partition exchange must be found")
    assert(sp.max === n.toLong,
      s"metric must carry the true funnel width, got $sp")
  }

  test("a plan without single-partition exchanges measures empty") {
    val df = (1 to 100).toDF("x").repartition(4, col("x"))
      .groupBy("x").agg(count(lit(1)))
    df.queryExecution.toRdd.count()
    val (sp, _) =
      PlanAudit.measuredSinglePartitionRows(df.queryExecution.executedPlan)
    assert(sp.isEmpty, s"no SinglePartition exchange expected, got $sp")
  }
}
