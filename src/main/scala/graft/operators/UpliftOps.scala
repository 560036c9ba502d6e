package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uplift/readout operators (round-10 widening, second session): the
  * sample-ratio-mismatch check (the FIRST thing a trustworthy A/B
  * readout verifies — a biased split invalidates everything after),
  * the decile lift table (does the pre-period activity score actually
  * rank users by future purchase propensity — the model-quality view
  * every targeting/churn model ships with), and inverse-√frequency
  * class weights (the loss re-balancing table a classifier trains
  * with). All moment-/enum-closed: one map-side pass each, arithmetic
  * on bounded state after.
  *
  * Determinism & scale design:
  *   - SRM buckets users by the md5 hash BIT (the content-derived
  *     assignment an experiment platform actually uses), then the χ²
  *     statistic over 2 cells is exact-integer cross-multiplied into
  *     1e-6 fixed point — (2·o−n)² · 1e6 DIV n, no doubles.
  *   - The lift table ranks users ONCE via the GlobalRank two-phase
  *     row number (one giant group — the documented trap) and derives
  *     deciles arithmetically from (rn, n); per-decile rates and the
  *     cumulative lift are exact integer ratios; cumulative sums run
  *     over the 10-row decile table via a broadcast self-join, not a
  *     window.
  *   - Class weights are |labels|-bounded: freq from one count, the
  *     1/√freq leaf FLOOR-fixed-pointed, normalization by a 1-row
  *     broadcast integer total.
  */
object UpliftOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sample-ratio mismatch: users hash 50/50 by the low md5 bit; the
    // χ² 1-dof statistic (2·o_arm − n)²/n in 1e-6 fixed point says
    // whether the observed split is consistent with the design.
    "ab_srm_check" -> ((s, d) => {
      val arms = Tables.events(s, d)
        .select(col("user_id")).distinct()
        .withColumn("arm", expr(
          "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        .groupBy("arm").agg(count(lit(1)).as("o"))
      val tot = arms.agg(sum("o").as("n"))
      arms.crossJoin(broadcast(tot))
        .withColumn("chi2_fp",
          expr("(2 * o - n) * (2 * o - n) * 1000000 DIV n"))
        .withColumn("share_fp", expr("o * 1000000 DIV n"))
        .select("arm", "o", "n", "share_fp", "chi2_fp")
        .orderBy("arm")
    }),

    // Decile lift: score users by FIRST-half activity value, outcome =
    // any purchase in the SECOND half; rank once, bucket into 10
    // deciles arithmetically, report per-decile outcome rate and
    // cumulative lift vs the base rate (1e-6 fixed point).
    "decile_lift_table" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
      val users = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("us") < col("mid"), col("v_fp")).otherwise(0L))
            .as("score"),
          max(when(col("us") >= col("mid") &&
            col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        users, "rn", Seq.empty, Seq("score", "user_id"))
      val cnt = users.agg(count(lit(1)).as("n"))
      val deciles = ranked.crossJoin(broadcast(cnt))
        // decile 1 = HIGHEST scores: invert the ascending rank
        .withColumn("decile", expr("(n - rn) * 10 DIV n + 1"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("converted").as("n_conv"))
      val base = deciles.agg(sum("n_users").as("nt"), sum("n_conv").as("ct"))
      val cum = deciles.as("a")
        .join(broadcast(deciles.select(col("decile").as("d2"),
          col("n_users").as("nu2"), col("n_conv").as("nc2"))),
          col("d2") <= col("decile"))
        .groupBy("decile", "n_users", "n_conv")
        .agg(sum("nu2").as("cum_users"), sum("nc2").as("cum_conv"))
      cum.crossJoin(broadcast(base))
        .select(col("decile"), col("n_users"), col("n_conv"),
          expr("n_conv * 1000000 DIV n_users").as("rate_fp"),
          expr("(cum_conv * nt) * 1000000 DIV (cum_users * ct)")
            .as("cum_lift_fp"))
        .orderBy("decile")
    }),

    // Inverse-√frequency class weights over embedding labels,
    // normalized to sum ≈ |labels| in 1e-6 fixed point.
    "class_balance_weights" -> ((s, d) => {
      val freq = Tables.embeddings(s, d)
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("freq"))
        .withColumn("inv_fp", expr(
          "CAST(FLOOR(1000000.0 / sqrt(CAST(freq AS DOUBLE))) AS BIGINT)"))
      val tot = freq.agg(count(lit(1)).as("k"), sum("inv_fp").as("si"))
      freq.crossJoin(broadcast(tot))
        .withColumn("weight_fp", expr("inv_fp * k * 1000000 DIV si"))
        .select("label", "freq", "inv_fp", "weight_fp")
        .orderBy("label")
    }),

    // Y30 (r14) — Cohen's d / Hedges' g effect size between click and
    // purchase event values: welch_t_value answers "is the gap real";
    // this answers "is it BIG" — the number that decides whether a
    // significant result matters (at 100 TB everything is significant;
    // only effect sizes rank findings). d = (μ₁−μ₂)/s_pooled with the
    // exact DECIMAL/HUGEINT (n, Σx, Σx²) moments per arm; Hedges' g
    // applies the small-sample factor 1 − 3/(4(n₁+n₂)−9). Each
    // statistic is ONE FLOOR'd shared-text IEEE leaf (sign via the
    // signed-floor convention). Scale: ONE map-side two-arm conditional
    // moment pass; output one row.
    "cohens_d_value" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select((col("event_type") === "click").as("a1"),
          expr("CAST(round(value * 100) AS BIGINT)").as("x"))
        .agg(
          sum(when(col("a1"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("a1"), col("x")).otherwise(0L)).as("s1"),
          sum(when(col("a1"), expr("CAST(x AS DECIMAL(38,0)) * x"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q1"),
          sum(when(!col("a1"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("a1"), col("x")).otherwise(0L)).as("s2"),
          sum(when(!col("a1"), expr("CAST(x AS DECIMAL(38,0)) * x"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("q2"))
        .withColumn("v1", expr(
          "CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1"))
        .withColumn("v2", expr(
          "CAST(n2 AS DECIMAL(38,0)) * q2 - CAST(s2 AS DECIMAL(38,0)) * s2"))
        .filter(col("n1") >= 2 && col("n2") >= 2 &&
          expr("v1 + v2 > 0") && expr("n1 + n2 > 2"))
        .select(col("n1"), col("n2"),
          expr(s"CAST(FLOOR(($dLeaf) * 1000000.0) AS BIGINT)").as("d_fp"),
          expr(s"""CAST(FLOOR(($dLeaf)
                 | * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
                 | * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("g_fp"))
    }),
  )

  /** Cohen's d as one shared-text IEEE leaf over the exact per-arm
    * moment integers: (μ₁−μ₂)/√(((v1/n1)+(v2/n2))/(n1+n2−2)) with
    * vᵢ = nᵢΣx² − (Σx)² (so vᵢ/nᵢ = (nᵢ−1)sᵢ²).
    */
  private val dLeaf: String =
    """(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
      | / sqrt((CAST(v1 AS DOUBLE) / n1 + CAST(v2 AS DOUBLE) / n2)
      |        / (CAST(n1 AS DOUBLE) + n2 - 2.0))"""
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "ab_srm_check" ->
      """WITH arms AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |           AS BIGINT) % 2 AS arm,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM arms)
        |SELECT arm, o, n,
        |       CAST(o * 1000000 // n AS BIGINT) AS share_fp,
        |       CAST((2 * o - n) * (2 * o - n) * 1000000 // n AS BIGINT)
        |         AS chi2_fp
        |FROM arms CROSS JOIN tot ORDER BY arm""".stripMargin,

    "decile_lift_table" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type,
        |         CAST(round(value * 1000) AS BIGINT) AS v_fp
        |  FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |users AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN us < mid THEN v_fp ELSE 0 END) AS BIGINT)
        |           AS score,
        |         CAST(max(CASE WHEN us >= mid AND event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS converted
        |  FROM ev CROSS JOIN mid GROUP BY user_id),
        |ranked AS (
        |  SELECT score, converted,
        |         row_number() OVER (ORDER BY score, user_id) AS rn,
        |         count(*) OVER () AS n
        |  FROM users),
        |deciles AS (
        |  SELECT (n - rn) * 10 // n + 1 AS decile,
        |         CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(converted) AS BIGINT) AS n_conv
        |  FROM ranked GROUP BY 1),
        |base AS (SELECT CAST(sum(n_users) AS BIGINT) AS nt,
        |                CAST(sum(n_conv) AS BIGINT) AS ct FROM deciles),
        |cum AS (
        |  SELECT a.decile, a.n_users, a.n_conv,
        |         CAST(sum(b.n_users) AS BIGINT) AS cum_users,
        |         CAST(sum(b.n_conv) AS BIGINT) AS cum_conv
        |  FROM deciles a JOIN deciles b ON b.decile <= a.decile
        |  GROUP BY a.decile, a.n_users, a.n_conv)
        |SELECT decile, n_users, n_conv,
        |       CAST(n_conv * 1000000 // n_users AS BIGINT) AS rate_fp,
        |       CAST((cum_conv * nt) * 1000000 // (cum_users * ct) AS BIGINT)
        |         AS cum_lift_fp
        |FROM cum CROSS JOIN base ORDER BY decile""".stripMargin,

    "class_balance_weights" ->
      """WITH freq AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM embeddings GROUP BY 1),
        |iv AS (
        |  SELECT label, freq,
        |         CAST(FLOOR(1000000.0 / sqrt(CAST(freq AS DOUBLE)))
        |           AS BIGINT) AS inv_fp
        |  FROM freq),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |               CAST(sum(inv_fp) AS BIGINT) AS si FROM iv)
        |SELECT label, freq, inv_fp,
        |       CAST(inv_fp * k * 1000000 // si AS BIGINT) AS weight_fp
        |FROM iv CROSS JOIN tot ORDER BY label""".stripMargin,

    "cohens_d_value" -> {
      val leaf =
        """(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
          | / sqrt((CAST(v1 AS DOUBLE) / n1 + CAST(v2 AS DOUBLE) / n2)
          |        / (CAST(n1 AS DOUBLE) + n2 - 2.0))"""
          .stripMargin.replace("\n", " ")
      s"""WITH m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'click'
         |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS s1,
         |    sum(CASE WHEN event_type = 'click'
         |      THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
         |        * CAST(round(value * 100) AS BIGINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS q1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS s2,
         |    sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
         |        * CAST(round(value * 100) AS BIGINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS q2
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |v AS (SELECT *,
         |        CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1
         |          AS v1,
         |        CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2
         |          AS v2
         |      FROM m)
         |SELECT n1, n2,
         |  CAST(FLOOR(($leaf) * 1000000.0) AS BIGINT) AS d_fp,
         |  CAST(FLOOR(($leaf) * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
         |    * 1000000.0) AS BIGINT) AS g_fp
         |FROM v
         |WHERE n1 >= 2 AND n2 >= 2 AND v1 + v2 > 0 AND n1 + n2 > 2"""
        .stripMargin
    },
  )
}
