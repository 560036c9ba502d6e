package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship (round-10 widening, fourth session): the
  * MDM merge step every entity-resolution pipeline ends with — one
  * consolidated row per entity where each field follows its own
  * survivorship rule (latest-wins for status fields, min/max/sum for
  * measures). The reference's full-refresh upsert (`merge_upsert_cdc`
  * models its write side, `/root/reference/app.py:206-214` the dedup)
  * stops at row granularity; this is the FIELD-granular policy layer.
  *
  * Determinism & scale: the latest-order row is keep-first over the
  * total (o_orderdate, o_orderkey) DESC order per customer — one
  * customer-partitioned window (high-cardinality key, the
  * dedup_keep_first shape) — and every measure is an exact integer
  * aggregate of the same single pass; one shuffle on c_custkey.
  */
object SurvivorshipOps extends OpGroup {

  /** Fellegi–Sunter m-probability convention (agreement given match). */
  private val FsM = "0.9"

  /** Random-agreement (u) probability of one field as a double leaf:
    * Σ f(f−1) / (N(N−1)) from exact integer value frequencies.
    */
  private def uSql(num: String) =
    s"(CAST($num AS DOUBLE) / (CAST(n_tot AS DOUBLE) * (n_tot - 1)))"

  /** Per-pattern FS log2 match weight, 1e-6 fp: Σ_fields agree ?
    * log2(m/u) : log2((1−m)/(1−u)) — ONE shared string; the log2 is
    * spelled ln/ln 2 so both engines build the identical IEEE tree.
    */
  private val fsWeightSql =
    s"""CAST(FLOOR((
       |  CASE WHEN a_seg = 1 THEN ln($FsM / ${uSql("us_num")})
       |       ELSE ln((1.0 - $FsM) / (1.0 - ${uSql("us_num")})) END
       |+ CASE WHEN a_band = 1 THEN ln($FsM / ${uSql("ub_num")})
       |       ELSE ln((1.0 - $FsM) / (1.0 - ${uSql("ub_num")})) END
       |) / ln(2.0) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fellegi–Sunter agreement-pattern weights (r12, second session):
    // the record-linkage scoring table (Fellegi & Sunter 1969) over
    // nation-blocked customer pairs comparing (market segment,
    // balance band). The KEY scale property: pattern pair-counts are
    // NEVER enumerated — each count is an inclusion–exclusion identity
    // over per-block Σ C(c,2) aggregates (both-agree from the
    // (block × seg × band) counts, single-field agreement from the
    // (block × field) counts, total from block counts), so the
    // quadratic candidate space collapses to four map-side-combinable
    // count tables. u-probabilities are estimated from the global
    // field-value frequencies (Σ f(f−1) / N(N−1)); m is the 0.9
    // convention; the log2 weight is ONE shared IEEE leaf per pattern
    // over exact integers. Output: the 4-row pattern grid.
    "fellegi_sunter_weights" -> ((s, d) => {
      val c = Tables.customer(s, d).select(
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("band"))
      def pairs(df: DataFrame, name: String) =
        df.agg(sum(expr("c * (c - 1) DIV 2")).as(name))
      val pBoth = pairs(c.groupBy("nk", "seg", "band")
        .agg(count(lit(1)).as("c")), "p_both")
      val pSeg = pairs(c.groupBy("nk", "seg")
        .agg(count(lit(1)).as("c")), "p_seg")
      val pBand = pairs(c.groupBy("nk", "band")
        .agg(count(lit(1)).as("c")), "p_band")
      val pAll = pairs(c.groupBy("nk")
        .agg(count(lit(1)).as("c")), "p_all")
      val uSeg = c.groupBy("seg").agg(count(lit(1)).as("f"))
        .agg(sum(expr("f * (f - 1)")).as("us_num"))
      val uBand = c.groupBy("band").agg(count(lit(1)).as("f"))
        .agg(sum(expr("f * (f - 1)")).as("ub_num"))
      val nTot = c.agg(count(lit(1)).as("n_tot"))
      import s.implicits._
      val grid = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
        .toDF("a_seg", "a_band")
      grid.crossJoin(broadcast(pBoth)).crossJoin(broadcast(pSeg))
        .crossJoin(broadcast(pBand)).crossJoin(broadcast(pAll))
        .crossJoin(broadcast(uSeg)).crossJoin(broadcast(uBand))
        .crossJoin(broadcast(nTot))
        .withColumn("n_pairs", expr(
          """CASE WHEN a_seg = 1 AND a_band = 1 THEN p_both
            |     WHEN a_seg = 1 THEN p_seg - p_both
            |     WHEN a_band = 1 THEN p_band - p_both
            |     ELSE p_all - p_seg - p_band + p_both END"""
            .stripMargin.replace("\n", " ")))
        .withColumn("w_fp", expr(fsWeightSql))
        .select("a_seg", "a_band", "n_pairs", "w_fp")
        .orderBy("a_seg", "a_band")
    }),

    "golden_record_merge" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("od"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("od").desc, col("o_orderkey").desc)
      val latest = ords.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"),
          col("o_orderstatus").as("last_status"),
          col("o_orderpriority").as("last_priority"),
          col("od").as("last_order_date"))
      val agg = ords.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum("cents").as("total_cents"),
        max("cents").as("max_order_cents"),
        min("od").as("first_order_date"))
      agg.join(latest, "o_custkey")
        .select(col("o_custkey").as("c_custkey"), col("n_orders"),
          col("total_cents"), col("max_order_cents"),
          col("first_order_date"), col("last_order_date"),
          col("last_status"), col("last_priority"))
        .orderBy("c_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "fellegi_sunter_weights" ->
      s"""WITH c AS (
         |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band
         |  FROM customer),
         |pboth AS (
         |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS p_both FROM (
         |    SELECT count(*) AS c FROM c GROUP BY nk, seg, band)),
         |pseg AS (
         |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS p_seg FROM (
         |    SELECT count(*) AS c FROM c GROUP BY nk, seg)),
         |pband AS (
         |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS p_band FROM (
         |    SELECT count(*) AS c FROM c GROUP BY nk, band)),
         |pall AS (
         |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS p_all FROM (
         |    SELECT count(*) AS c FROM c GROUP BY nk)),
         |useg AS (
         |  SELECT CAST(sum(f * (f - 1)) AS BIGINT) AS us_num FROM (
         |    SELECT count(*) AS f FROM c GROUP BY seg)),
         |uband AS (
         |  SELECT CAST(sum(f * (f - 1)) AS BIGINT) AS ub_num FROM (
         |    SELECT count(*) AS f FROM c GROUP BY band)),
         |ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM c),
         |grid AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
         |           (0, 1), (1, 0), (1, 1)) AS t(a_seg, a_band)),
         |x AS (
         |  SELECT a_seg, a_band,
         |         CAST(CASE WHEN a_seg = 1 AND a_band = 1 THEN p_both
         |              WHEN a_seg = 1 THEN p_seg - p_both
         |              WHEN a_band = 1 THEN p_band - p_both
         |              ELSE p_all - p_seg - p_band + p_both END
         |           AS BIGINT) AS n_pairs,
         |         $fsWeightSql AS w_fp
         |  FROM grid CROSS JOIN pboth CROSS JOIN pseg CROSS JOIN pband
         |       CROSS JOIN pall CROSS JOIN useg CROSS JOIN uband
         |       CROSS JOIN ntot)
         |SELECT a_seg, a_band, n_pairs, w_fp FROM x
         |ORDER BY a_seg, a_band""".stripMargin,

    "golden_record_merge" ->
      """WITH ords AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderpriority,
        |         CAST(o_orderdate AS DATE) AS od,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |latest AS (
        |  SELECT o_custkey, o_orderstatus AS last_status,
        |         o_orderpriority AS last_priority, od AS last_order_date
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY od DESC, o_orderkey DESC) AS rn FROM ords)
        |  WHERE rn = 1),
        |agg AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(cents) AS BIGINT) AS total_cents,
        |         CAST(max(cents) AS BIGINT) AS max_order_cents,
        |         min(od) AS first_order_date
        |  FROM ords GROUP BY 1)
        |SELECT a.o_custkey AS c_custkey, a.n_orders, a.total_cents,
        |       a.max_order_cents, a.first_order_date,
        |       l.last_order_date, l.last_status, l.last_priority
        |FROM agg a JOIN latest l ON l.o_custkey = a.o_custkey
        |ORDER BY c_custkey""".stripMargin,
  )
}
