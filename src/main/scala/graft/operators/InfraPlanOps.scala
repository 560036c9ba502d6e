package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Infrastructure-planning + uncertainty operators (round-10 widening,
  * fourth session): the salt-factor plan for skewed join keys (the
  * ACTION `join_key_skew_profile` only measures), closed-form Bloom
  * filter sizing for the dedup-index tables (the m/k arithmetic behind
  * `bloom_prefilter_dedup`'s bitset), a deterministic half-sample
  * confidence interval for daily revenue (the hash-resampling CI a
  * pipeline publishes next to its point estimate), and the classic
  * per-brand margin rollup (gross → discounted → charged, the TPC-H
  * pricing ladder in exact cents).
  *
  * Determinism & scale design:
  *   - The salt plan reads per-key counts (one map-side aggregation),
  *     ranks the top-20 by the total (cnt DESC, key) order via
  *     TakeOrdered, and derives salt = ⌈cnt/target⌉ in pure integer
  *     math against broadcast totals — never empty output (the top-20
  *     always exists), hotness is an integer cross-multiplied flag.
  *   - Bloom sizing is one IEEE expression per (table, fpp) row over
  *     exact counts — ceil(−n·ln p/ln²2) — identical text both
  *     engines; the input is three single-row count aggregates.
  *   - The half-sample CI uses the md5-bit resampling idiom
  *     (ab_srm_check's content-derived hash): 64 deterministic
  *     half-samples with weight ∈ {0,2} (E[w] = 1), per-resample means
  *     as exact integer division, CI bounds RANK-defined over the
  *     64-value distribution via the two-phase numbering (audit-clean
  *     under the pinned distributed path).
  *   - The margin rollup rounds each pricing leaf to cents BEFORE
  *     summation (deterministic single IEEE products), then
  *     integer-sums per brand.
  */
object InfraPlanOps extends OpGroup {

  private val Resamples = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-20 heaviest join keys with their recommended salt factors.
    "salt_factor_planner" -> ((s, d) => {
      val cnts = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val tot = cnts.agg(sum("cnt").as("total"),
        count(lit(1)).as("n_keys"))
      cnts.crossJoin(broadcast(tot))
        .withColumn("target", expr("(total + n_keys - 1) DIV n_keys"))
        .withColumn("salt_factor", expr("(cnt + target - 1) DIV target"))
        .withColumn("is_hot", expr("cnt * n_keys * 10 > total * 12"))
        .select("user_id", "cnt", "target", "salt_factor", "is_hot")
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(20)
    }),

    // Bloom sizing m = ceil(-n ln p / ln^2 2), k = round(m/n ln 2) for
    // the three dedup-index-shaped tables at two target FPPs.
    "bloom_filter_sizing_plan" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("table_name", lit("lineitem"))
        .unionByName(Tables.orders(s, d)
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("table_name", lit("orders")))
        .unionByName(Tables.events(s, d)
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("table_name", lit("events")))
      val fpps = counts.sparkSession.range(0, 1) // anchor for literals
      counts.crossJoin(broadcast(
          fpps.select(explode(array(lit(10000L), lit(1000L))).as("fpp_ppm"))))
        .withColumn("m_bits", expr(
          """CAST(ceil(-(CAST(n_rows AS DOUBLE))
            | * ln(CAST(fpp_ppm AS DOUBLE) / 1000000.0)
            | / (ln(2.0) * ln(2.0))) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .withColumn("k_hashes", expr(
          "CAST(round(CAST(m_bits AS DOUBLE) / n_rows * ln(2.0)) AS BIGINT)"))
        .withColumn("bytes", expr("(m_bits + 7) DIV 8"))
        .select("table_name", "n_rows", "fpp_ppm", "m_bits", "k_hashes",
          "bytes")
        .orderBy("table_name", "fpp_ppm")
    }),

    // Deterministic half-sample CI for the daily-revenue mean: 64
    // md5-bit half-samples (w ∈ {0,2}), rank-defined 2.5%/97.5% bounds.
    "half_sample_ci" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
          .as("di"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      val expanded = daily.select(col("di"), col("x"),
          explode(expr(s"sequence(0, ${Resamples - 1})")).as("b"))
        .withColumn("w", expr(
          """2 * (CAST(conv(substring(md5(concat(CAST(di AS STRING), '_',
            |  CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2)"""
            .stripMargin.replace("\n", " ")))
      val means = expanded.groupBy("b")
        .agg(sum(expr("w * x")).as("wx"), sum("w").as("wsum"))
        .filter(col("wsum") > 0)
        .withColumn("mean_cents", expr("wx DIV wsum"))
        .select("b", "mean_cents")
      val ranked = graft.functions.GlobalRank
        .rowNumber(means, "rn", Nil, Seq("mean_cents", "b"))
      val stats = daily.agg(count(lit(1)).as("n_days"),
        sum("x").as("sx"))
      ranked.agg(count(lit(1)).as("n_resamples"),
          sum(when(col("rn") === 2, col("mean_cents"))).as("lo_cents"),
          sum(when(col("rn") === Resamples - 1, col("mean_cents")))
            .as("hi_cents"))
        .crossJoin(broadcast(stats))
        .withColumn("mean_cents", expr("sx DIV n_days"))
        .select("n_days", "n_resamples", "mean_cents", "lo_cents",
          "hi_cents")
    }),

    // Per-brand pricing ladder in exact cents: gross, discounted,
    // charged (discount then tax), leaf-rounded before summation.
    "brand_margin_rollup" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("gross_c"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
          .as("disc_c"),
        expr("""CAST(round(l_extendedprice * (1 - l_discount)
          | * (1 + l_tax) * 100) AS BIGINT)""".stripMargin
          .replace("\n", " ")).as("charge_c"))
      val part = Tables.part(s, d).select("p_partkey", "p_brand")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum("gross_c").as("gross_cents"),
          sum("disc_c").as("discounted_cents"),
          sum("charge_c").as("charged_cents"))
        .orderBy("p_brand")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "salt_factor_planner" ->
      """WITH cnts AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |               CAST(count(*) AS BIGINT) AS n_keys FROM cnts),
        |f AS (
        |  SELECT c.user_id, c.cnt,
        |         (t.total + t.n_keys - 1) // t.n_keys AS target,
        |         t.total, t.n_keys
        |  FROM cnts c CROSS JOIN tot t)
        |SELECT user_id, cnt, CAST(target AS BIGINT) AS target,
        |       CAST((cnt + target - 1) // target AS BIGINT) AS salt_factor,
        |       cnt * n_keys * 10 > total * 12 AS is_hot
        |FROM f ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,

    "bloom_filter_sizing_plan" ->
      """WITH counts AS (
        |  SELECT 'lineitem' AS table_name,
        |         CAST(count(*) AS BIGINT) AS n_rows FROM lineitem
        |  UNION ALL
        |  SELECT 'orders', CAST(count(*) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'events', CAST(count(*) AS BIGINT) FROM events),
        |fpps AS (SELECT unnest([10000, 1000]) AS fpp_ppm),
        |f AS (
        |  SELECT c.table_name, c.n_rows, CAST(p.fpp_ppm AS BIGINT) AS fpp_ppm,
        |         CAST(ceil(-(CAST(c.n_rows AS DOUBLE))
        |           * ln(CAST(p.fpp_ppm AS DOUBLE) / 1000000.0)
        |           / (ln(2.0) * ln(2.0))) AS BIGINT) AS m_bits
        |  FROM counts c CROSS JOIN fpps p)
        |SELECT table_name, n_rows, fpp_ppm, m_bits,
        |       CAST(round(CAST(m_bits AS DOUBLE) / n_rows * ln(2.0))
        |         AS BIGINT) AS k_hashes,
        |       CAST((m_bits + 7) // 8 AS BIGINT) AS bytes
        |FROM f ORDER BY table_name, fpp_ppm""".stripMargin,

    "half_sample_ci" ->
      s"""WITH daily AS (
         |  SELECT datediff('day', DATE '1970-01-01',
         |           CAST(o_orderdate AS DATE)) AS di,
         |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |expanded AS (
         |  SELECT d.di, d.x, t.b,
         |         2 * (CAST(concat('0x', substr(md5(concat(CAST(d.di AS VARCHAR),
         |             '_', CAST(t.b AS VARCHAR))), 1, 8)) AS BIGINT) % 2)
         |           AS w
         |  FROM daily d CROSS JOIN range(0, $Resamples) t(b)),
         |means AS (
         |  SELECT b, CAST(sum(w * x) // sum(w) AS BIGINT) AS mean_cents
         |  FROM expanded GROUP BY b HAVING sum(w) > 0),
         |ranked AS (
         |  SELECT mean_cents,
         |         row_number() OVER (ORDER BY mean_cents, b) AS rn
         |  FROM means),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |                 CAST(sum(x) AS BIGINT) AS sx FROM daily)
         |SELECT s.n_days,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ranked) AS n_resamples,
         |       CAST(s.sx // s.n_days AS BIGINT) AS mean_cents,
         |       (SELECT mean_cents FROM ranked WHERE rn = 2) AS lo_cents,
         |       (SELECT mean_cents FROM ranked WHERE rn = ${Resamples - 1})
         |         AS hi_cents
         |FROM stats s""".stripMargin,

    "brand_margin_rollup" ->
      """SELECT p.p_brand,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS gross_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |         AS BIGINT)) AS BIGINT) AS discounted_cents,
        |       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |         * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS charged_cents
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,
  )
}
