package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling and validation operators (round-10 widening, second
  * session): exact-size weighted sampling without replacement (the
  * Efraimidis–Spirakis one-pass reservoir — THE distributed algorithm
  * for "give me 20 docs proportional to length"), the Hill tail-index
  * estimator (is this revenue/value distribution actually power-law,
  * and how heavy — the number that decides whether means are even
  * meaningful), and an order-independent table checksum (the
  * content-addressed fingerprint two engines/copies compare after a
  * migration — the reference's load step `/root/reference/
  * README.md:180-205` is exactly the hop such a checksum guards).
  *
  * Determinism & scale design:
  *   - E–S keys are CONTENT-DERIVED: u = (md5₃₂(doc)+0.5)/2³², key =
  *     ln(u)/w — one leaf double per row over exact ints (identical
  *     parse tree both engines), FLOOR 1e-9, then a TakeOrdered
  *     top-20. One map-side pass + a k-row reduction: the textbook
  *     distributed weighted sample (rand() would be neither
  *     verifiable nor layout-stable).
  *   - Hill reads only the top k+1 ORDER STATISTICS (TakeOrdered —
  *     never a global sort); the pivot broadcasts back; each
  *     ln(x_i/x_pivot) is a leaf over two exact ints. Ties at the
  *     boundary are value-ties, so the value multiset — and hence the
  *     estimate — is engine-independent.
  *   - The checksum is Σ md5₃₂(row-projection) — a commutative integer
  *     monoid, so it folds map-side on any partitioning and any row
  *     order (the property that makes it a CHECKSUM). Doubles enter
  *     only as exact cents; the projection is spelled once and shared
  *     with the oracle.
  */
object SampleAuditOps extends OpGroup {

  private def h32Spark(e: String) =
    s"CAST(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  private def h32Duck(e: String) =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** E–S key leaf: ln(u)/w in 1e-9 fixed point (u from the row hash). */
  private def esKeySpark =
    s"""CAST(FLOOR(ln((${h32Spark("CAST(doc_id AS STRING)")} + 0.5) / 4294967296.0)
       | / n_chars * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")
  private def esKeyDuck =
    s"""CAST(FLOOR(ln((${h32Duck("CAST(doc_id AS VARCHAR)")} + 0.5) / 4294967296.0)
       | / n_chars * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Weighted sample without replacement, k = 20, weight = n_chars:
    // the docs with the 20 LARGEST ln(u)/w keys (u^(1/w) order) — long
    // documents are proportionally likelier, yet the sample is exact
    // size and one-pass mergeable (each partition keeps its top 20).
    "weighted_reservoir_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .withColumn("es_key_fp", expr(esKeySpark))
        .orderBy(col("es_key_fp").desc, col("doc_id"))
        .limit(20)),

    // Hill estimator of the revenue tail index over the top k = 100
    // order statistics: γ̂ = (1/k)Σ ln(x_(i)/x_(k+1)); α̂ = 1/γ̂ is the
    // Pareto exponent — α ≤ 2 means variance is infinite and
    // mean-based dashboards lie.
    "hill_tail_index" -> ((s, d) => {
      val k = 100
      val cents = Tables.orders(s, d)
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val top = cents.orderBy(col("cents").desc).limit(k + 1)
      val pivot = top.agg(min("cents").as("x_pivot"))
      top.crossJoin(broadcast(pivot))
        .filter(col("cents") > col("x_pivot"))
        .select(expr(
          """CAST(FLOOR(ln(CAST(cents AS DOUBLE) / CAST(x_pivot AS DOUBLE))
            | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("lr_fp"), col("x_pivot"))
        .agg(count(lit(1)).as("k_used"), max("x_pivot").as("x_pivot_cents"),
          sum("lr_fp").as("lr_sum_fp"))
        .withColumn("hill_gamma_fp", expr("lr_sum_fp DIV (k_used * 1000)"))
        .select("k_used", "x_pivot_cents", "hill_gamma_fp")
    }),

    // Order-independent content checksum per table: Σ md5₃₂ of a fixed
    // column projection (doubles as exact cents) + row count — the
    // fingerprint a migration compares on both sides. Commutative sum
    // ⇒ identical on any partitioning, any row order, any engine.
    "table_checksum_rollup" -> ((s, d) => {
      def sums(df: DataFrame, name: String, proj: String) =
        df.select(expr(h32Spark(proj)).as("h"))
          .agg(count(lit(1)).as("n_rows"), sum("h").as("checksum"))
          .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
      sums(Tables.nation(s, d), "nation",
          "concat_ws('|', CAST(n_nationkey AS STRING), n_name, CAST(n_regionkey AS STRING))")
        .unionByName(sums(Tables.customer(s, d), "customer",
          "concat_ws('|', CAST(c_custkey AS STRING), c_name, CAST(c_nationkey AS STRING), c_mktsegment, CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING))"))
        .unionByName(sums(Tables.supplier(s, d), "supplier",
          "concat_ws('|', CAST(s_suppkey AS STRING), s_name, CAST(s_nationkey AS STRING))"))
        .orderBy("table_name")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "weighted_reservoir_sample" ->
      s"""SELECT doc_id, n_chars, $esKeyDuck AS es_key_fp
         |FROM documents
         |ORDER BY es_key_fp DESC, doc_id LIMIT 20""".stripMargin,

    "hill_tail_index" ->
      """WITH cents AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |top AS (SELECT cents FROM cents ORDER BY cents DESC LIMIT 101),
        |pv AS (SELECT min(cents) AS x_pivot FROM top),
        |lr AS (
        |  SELECT CAST(FLOOR(ln(CAST(cents AS DOUBLE) / CAST(x_pivot AS DOUBLE))
        |           * 1000000000.0) AS BIGINT) AS lr_fp, x_pivot
        |  FROM top CROSS JOIN pv WHERE cents > x_pivot)
        |SELECT CAST(count(*) AS BIGINT) AS k_used,
        |       max(x_pivot) AS x_pivot_cents,
        |       CAST(sum(lr_fp) // (count(*) * 1000) AS BIGINT)
        |         AS hill_gamma_fp
        |FROM lr""".stripMargin,

    "table_checksum_rollup" ->
      s"""SELECT 'nation' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(${h32Duck("CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' || CAST(n_regionkey AS VARCHAR)")}) AS BIGINT) AS checksum
         |FROM nation
         |UNION ALL
         |SELECT 'customer', CAST(count(*) AS BIGINT),
         |       CAST(sum(${h32Duck("CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' || CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR)")}) AS BIGINT)
         |FROM customer
         |UNION ALL
         |SELECT 'supplier', CAST(count(*) AS BIGINT),
         |       CAST(sum(${h32Duck("CAST(s_suppkey AS VARCHAR) || '|' || s_name || '|' || CAST(s_nationkey AS VARCHAR)")}) AS BIGINT)
         |FROM supplier
         |ORDER BY table_name""".stripMargin,
  )
}
