package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One group of declared operators (SURVEY.md §2 rows). `queries` keys and
  * `oracleSql` keys must match; oracle entries are omitted for rows marked ✗
  * (covered by ScalaTest instead).
  */
trait OpGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** Determinism helpers shared by every declared query (SURVEY.md §5, §7
  * "hard parts"). The driver hash-compares our parquet output against DuckDB
  * row-by-row, so every query must (a) end in a total order over non-null
  * keys, and (b) never emit a double whose value depends on fp summation
  * order. Doubles are routed through DECIMAL(18,6) before SUM/AVG — decimal
  * addition is associative, so partial (map-side) aggregation over any
  * partitioning of 100 TB yields bit-identical results to DuckDB's
  * single-node sum.
  */
object Det {
  /** Order-insensitive money/measure sum: Σ decimal(18,6) → double, 6dp. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 6))).cast("double"), 6)

  /** Matching DuckDB SQL for [[dsum]]. */
  def dsumSql(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE), 6)"

  /** Order-insensitive average: exact decimal sum, IEEE double division. */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 6))).cast("double") / count(c), 6)

  /** Matching DuckDB SQL for [[davg]]. */
  def davgSql(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE) / count($e), 6)"

  /** Exact decimal sum kept as decimal — for deterministic ORDER BY / rank
    * comparisons on aggregated measures (fp sums can reorder ties).
    */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 6)))

  def decSumSql(e: String): String = s"sum(CAST(($e) AS DECIMAL(18,6)))"
}
