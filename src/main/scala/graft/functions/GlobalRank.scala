package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global / grouped row numbering — the two-phase rank.
  *
  * `Window.orderBy(k)` with no `partitionBy` moves EVERY row through one
  * task (Spark warns about exactly this); it is the canonical 100×-scale
  * killer. The same total numbering is computable in two distributed
  * passes:
  *
  *   1. range-partition the rows on (group ++ order) keys — ascending
  *      partition ids hold ascending, non-overlapping key ranges while
  *      the data stays spread over the cluster;
  *   2. `row_number` locally, partitioned by (physical slice, group) —
  *      every window task sees ~1/numPartitions of the data;
  *   3. per-(slice, group) row counts — an aggregate of at most
  *      numPartitions rows per group — become each slice's starting
  *      offset via a broadcast triangular join (deliberately NOT a
  *      single-partition window, so no stage anywhere funnels through
  *      one task);
  *   4. global rank = slice offset + local rank.
  *
  * The slice id (`spark_partition_id` after the range exchange) is
  * consumed by two plan branches (the local rank and the count
  * aggregate); both read the SAME shuffle output — Spark's
  * ReuseExchange/AQE stage reuse guarantees one physical exchange, so
  * the ids agree across branches.
  *
  * The numbering is deterministic whenever (group ++ order) totally
  * orders the rows; under ties the numbers within a tie group are
  * arbitrary (exactly as with a plain window) but the k-th smallest
  * VALUE is stable, which is what rank-picking consumers rely on.
  */
object GlobalRank {

  /** Appends a global (or per-`groupCols`) 1-based `row_number` column
    * named `rnCol` (LONG), ordered by `orderCols`, without ever planning
    * a partition-less window. `numPartitions` bounds the range exchange;
    * at cluster scale it should track the input size (AQE may coalesce).
    */
  def rowNumber(df: DataFrame, rnCol: String, groupCols: Seq[String],
      orderCols: Seq[String], numPartitions: Int = 32): DataFrame = {
    val keyCols: Seq[Column] = (groupCols ++ orderCols).map(col)
    val slice = "__gr_pid" +: groupCols
    val ranged = df.repartitionByRange(numPartitions, keyCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val local = ranged.withColumn("__gr_lrn",
      row_number().over(
        Window.partitionBy(slice.map(col): _*)
          .orderBy(orderCols.map(col): _*)).cast("long"))
    val cnts = local.groupBy(slice.map(col): _*)
      .agg(count(lit(1)).as("__gr_cnt"))
    // offset(slice) = Σ counts of the same group in LOWER slices; the
    // triangular join touches ≤ numPartitions² tiny rows per group.
    val lower = cnts.select(
      (col("__gr_pid").as("__gr_pid2") +:
        groupCols.map(c => col(c).as(s"__gr_g_$c"))) :+
        col("__gr_cnt").as("__gr_cnt2"): _*)
    val cond = groupCols
      .map(c => col(c) === col(s"__gr_g_$c"))
      .foldLeft(col("__gr_pid2") < col("__gr_pid"))(_ && _)
    val offs = cnts.join(broadcast(lower), cond, "left")
      .groupBy(slice.map(col): _*)
      .agg(coalesce(sum("__gr_cnt2"), lit(0L)).as("__gr_off"))
    local.join(broadcast(offs), slice, "inner")
      .withColumn(rnCol, col("__gr_off") + col("__gr_lrn"))
      .drop("__gr_pid", "__gr_lrn", "__gr_off")
  }
}
