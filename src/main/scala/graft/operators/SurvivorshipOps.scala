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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
