package graft

import org.apache.spark.sql.functions._

/** Scalar UDF surface (SURVEY.md §2.L): demonstrates registration and
  * the reason it is banned from hot paths — a Scala UDF is
  * Catalyst-opaque, so predicates wrapped in one cannot push down to the
  * parquet scan, while the equivalent built-in predicate can.
  */
class UdfSpec extends SparkSpec {

  test("scalar UDF works but blocks predicate pushdown (built-in pushes)") {
    val li = Tables.lineitem(spark, sf())
    val bigQty = udf((q: Double) => q > 30.0)

    val viaUdf = li.filter(bigQty(col("l_quantity")))
    val viaBuiltin = li.filter(col("l_quantity") > 30.0)

    // identical semantics...
    assert(viaUdf.count() === viaBuiltin.count())

    // ...but only the built-in predicate reaches the scan
    def pushed(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed(viaBuiltin).contains("GreaterThan(l_quantity,30.0)"))
    assert(!pushed(viaUdf).contains("GreaterThan"))
  }
}
