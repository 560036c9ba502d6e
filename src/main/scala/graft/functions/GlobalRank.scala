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
  *   1. assign each row a SLICE id — a pure, deterministic function of
  *      its own key value (width bucketing between the per-group min and
  *      max of a numeric slice key that is monotone in the ordering).
  *      Slices are ordered, non-overlapping key ranges, so ranking is
  *      slice-local + offset;
  *   2. `row_number` locally, partitioned by (slice, group) — every
  *      window task sees ~1/numSlices of its group;
  *   3. per-(slice, group) row counts — an aggregate of at most
  *      numSlices rows per group — become each slice's starting offset
  *      via a broadcast triangular join (deliberately NOT a
  *      single-partition window, so no stage anywhere funnels the data
  *      through one task);
  *   4. global rank = slice offset + local rank.
  *
  * Why not `repartitionByRange` + `spark_partition_id`? Range exchanges
  * pick their boundaries by SAMPLING, seeded per physical exchange — and
  * the rank/count/join branches of this DAG each compile their own
  * exchange, so their partition ids are only consistent if exchange
  * reuse happens to fire. A value-derived slice is identical in every
  * branch by construction, on any cluster, in any plan.
  *
  * Width bucketing assumes the slice key is roughly uniform between its
  * group min/max (true for synthetic keys, ids, hashes). A skewed 100 TB
  * deployment swaps `sliceOn` for precomputed sample-quantile boundaries
  * — fitted offline and broadcast, exactly like the IVF coarse quantizer
  * (AnnIvf) — without touching the rank/offset machinery.
  *
  * The numbering is deterministic whenever (group ++ order) totally
  * orders the rows; under ties the numbers within a tie group are
  * arbitrary (exactly as with a plain window) but the k-th smallest
  * VALUE is stable, which is what rank-picking consumers rely on. Ties
  * never straddle slices: equal slice keys map to equal slices.
  */
object GlobalRank {

  /** Appends a global (or per-`groupCols`) 1-based `row_number` column
    * named `rnCol` (LONG), ordered by `orderCols`, without ever planning
    * a partition-less window or a sampled range exchange.
    *
    * `sliceOn` must be numeric and monotone non-decreasing in the
    * `orderCols` ordering; it defaults to the first order column.
    */
  def rowNumber(df: DataFrame, rnCol: String, groupCols: Seq[String],
      orderCols: Seq[String], numSlices: Int = 32,
      sliceOn: Option[Column] = None): DataFrame = {
    val base = sliceOn.getOrElse(col(orderCols.head)).cast("double")
    val slice = "__gr_pid" +: groupCols

    // per-group key span — a tiny aggregate, broadcast back
    val span = Seq(min(base).as("__gr_lo"), max(base).as("__gr_hi"))
    val stats =
      if (groupCols.isEmpty) df.agg(span.head, span.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(span.head, span.tail: _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), groupCols)
    // width bucket: pure monotone arithmetic on the row's own key value
    val width = col("__gr_hi") - col("__gr_lo")
    val sliced = joined.withColumn("__gr_pid",
      when(width === 0d, lit(0))
        .otherwise(least(lit(numSlices - 1),
          floor((base - col("__gr_lo")) / width * numSlices)))
        .cast("int"))
      .drop("__gr_lo", "__gr_hi")

    val local = sliced.withColumn("__gr_lrn",
      row_number().over(
        Window.partitionBy(slice.map(col): _*)
          .orderBy(orderCols.map(col): _*)).cast("long"))
    val cnts = local.groupBy(slice.map(col): _*)
      .agg(count(lit(1)).as("__gr_cnt"))
    // offset(slice) = Σ counts of the same group in LOWER slices; the
    // triangular join touches ≤ numSlices² tiny rows per group.
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

  /** Scale-safe running (prefix) SUM over the (group, order) ordering —
    * same slice machinery as [[rowNumber]], but the offset ladder carries
    * per-slice value totals instead of row counts. `sumCol` gets
    * Σ valueCol over all rows ordered ≤ the current row (inclusive).
    * Exact for integral values (long addition is associative); for
    * doubles route the value through DECIMAL first (Det.decSum logic).
    */
  def prefixSum(df: DataFrame, sumCol: String, valueCol: Column,
      groupCols: Seq[String], orderCols: Seq[String], numSlices: Int = 32,
      sliceOn: Option[Column] = None): DataFrame = {
    val base = sliceOn.getOrElse(col(orderCols.head)).cast("double")
    val slice = "__gr_pid" +: groupCols

    val span = Seq(min(base).as("__gr_lo"), max(base).as("__gr_hi"))
    val stats =
      if (groupCols.isEmpty) df.agg(span.head, span.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(span.head, span.tail: _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), groupCols)
    val width = col("__gr_hi") - col("__gr_lo")
    val sliced = joined.withColumn("__gr_pid",
      when(width === 0d, lit(0))
        .otherwise(least(lit(numSlices - 1),
          floor((base - col("__gr_lo")) / width * numSlices)))
        .cast("int"))
      .withColumn("__gr_v", valueCol)
      .drop("__gr_lo", "__gr_hi")

    val local = sliced.withColumn("__gr_run",
      sum(col("__gr_v")).over(
        Window.partitionBy(slice.map(col): _*)
          .orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = sliced.groupBy(slice.map(col): _*)
      .agg(sum(col("__gr_v")).as("__gr_tot"))
    val lower = totals.select(
      (col("__gr_pid").as("__gr_pid2") +:
        groupCols.map(c => col(c).as(s"__gr_g_$c"))) :+
        col("__gr_tot").as("__gr_tot2"): _*)
    val cond = groupCols
      .map(c => col(c) === col(s"__gr_g_$c"))
      .foldLeft(col("__gr_pid2") < col("__gr_pid"))(_ && _)
    val offs = totals.join(broadcast(lower), cond, "left")
      .groupBy(slice.map(col): _*)
      .agg(coalesce(sum("__gr_tot2"), lit(0L)).as("__gr_off"))
    local.join(broadcast(offs), slice, "inner")
      .withColumn(sumCol, col("__gr_off") + col("__gr_run"))
      .drop("__gr_pid", "__gr_run", "__gr_off", "__gr_v")
  }
}
