package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Experimentation-analytics operators (round-10 widening, second
  * session): CUPED variance reduction (the pre-period covariate
  * adjustment every mature A/B platform applies before reading a
  * metric — it answers "how much experiment runtime does our history
  * buy us") and Neyman optimal allocation (how to split a fixed
  * sampling budget across strata ∝ N_h·σ_h — the survey-sampling
  * answer to "which segment deserves the labeling budget"). Both are
  * moment-closed-form: ONE map-side-combinable aggregate pass over the
  * data, then arithmetic on a handful of exact sums.
  *
  * Determinism & scale design:
  *   - All moments are exact integer sums (values as 1e-3/1e-2 fixed
  *     point, squares/products lifted to DECIMAL(38,0)/HUGEINT);
  *     θ, c, ρ², σ_h resolve in ONE shared leaf double expression per
  *     statistic, FLOOR-truncated — the identical parse tree evaluates
  *     on both engines (the doc_length_quality_corr recipe).
  *   - CUPED's pre/post boundary is the integer midpoint of the
  *     observed µs span (a 1-row broadcast), so the split is a pure
  *     function of the data — no clock, no config.
  *   - Neyman's largest-remainder rounding is EXACT integer
  *     arithmetic, and the remainder ranking is a ≤|strata|² broadcast
  *     self-join (no partition-less window — the skyline carry-in
  *     recipe). Σ alloc = budget holds as an identity, spec-pinned.
  */
object ExperimentOps extends OpGroup {

  private val Budget = 1000L

  /** Shared σ_h·N_h weight leaf (1e-6 fp): N·sqrt((n·Σx²−(Σx)²)/n²). */
  private val wLeafSql =
    """CAST(FLOOR(CAST(n_h AS DOUBLE)
      | * sqrt((CAST(n_h AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE)))
      | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CUPED: per-user pre-period covariate x and post-period metric y
    // (split at the integer midpoint of the event-time span), then the
    // closed-form adjustment θ_cuped = ȳ − c·(x̄−x̄) with c = cov/var(x)
    // and the variance-reduction factor 1 − ρ². One row out.
    "cuped_variance_reduction" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        expr("unix_micros(ts)").as("us"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val mid = ev.agg(expr("(min(us) + max(us)) DIV 2").as("mid"))
      val ux = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("us") < col("mid"), col("v_fp")).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), col("v_fp")).otherwise(0L)).as("y"))
      val m = ux.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
      m.select(col("n"),
        expr("""CAST(FLOOR(CAST(sy AS DOUBLE) / n * 1000.0) AS BIGINT)""")
          .as("theta_raw_fp"),
        expr("""CAST(FLOOR(
               |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |  * 1000000.0) AS BIGINT)""".stripMargin).as("c_fp"),
        expr("""CAST(FLOOR((1.0
               |  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               |     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
               |  * 1000000.0) AS BIGINT)""".stripMargin).as("var_reduction_fp"))
    }),

    // Neyman allocation: split a 1000-unit sampling budget across
    // market segments ∝ N_h·σ_h of the balance metric, with exact
    // largest-remainder rounding (ranked by a ≤25-cell self-join).
    "neyman_allocation_plan" -> ((s, d) => {
      val strata = Tables.customer(s, d)
        .select(col("c_mktsegment").as("segment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_h"),
          sum(col("cents").cast("decimal(38,0)")).as("sx"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sxx"))
        .withColumn("w_fp", expr(wLeafSql))
      val tot = strata.agg(sum("w_fp").as("wt"))
      val base = strata.crossJoin(broadcast(tot))
        .withColumn("alloc_base", expr(s"$Budget * w_fp DIV wt"))
        .withColumn("rem", expr(s"$Budget * w_fp % wt"))
      val leftover = base.agg((lit(Budget) - sum("alloc_base")).as("l"))
      val rk = base.select(col("segment").as("s2"), col("rem").as("rem2"))
      val ranked = base.join(broadcast(rk),
          col("rem2") > col("rem") ||
            (col("rem2") === col("rem") && col("s2") < col("segment")),
          "left")
        .groupBy("segment", "n_h", "w_fp", "alloc_base", "rem")
        .agg(count(col("s2")).as("n_ahead"))
      ranked.crossJoin(broadcast(leftover))
        .withColumn("alloc",
          col("alloc_base") + when(col("n_ahead") < col("l"), 1L).otherwise(0L))
        .select("segment", "n_h", "w_fp", "alloc")
        .orderBy("segment")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "cuped_variance_reduction" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 1000) AS BIGINT) AS v_fp
        |  FROM events),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |ux AS (
        |  SELECT user_id,
        |         CAST(sum(CASE WHEN us < mid THEN v_fp ELSE 0 END) AS BIGINT) AS x,
        |         CAST(sum(CASE WHEN us >= mid THEN v_fp ELSE 0 END) AS BIGINT) AS y
        |  FROM ev CROSS JOIN mid GROUP BY user_id),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM ux)
        |SELECT n,
        |       CAST(FLOOR(CAST(sy AS DOUBLE) / n * 1000.0) AS BIGINT)
        |         AS theta_raw_fp,
        |       CAST(FLOOR(
        |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * 1000000.0) AS BIGINT) AS c_fp,
        |       CAST(FLOOR((1.0
        |         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
        |           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        |         * 1000000.0) AS BIGINT) AS var_reduction_fp
        |FROM m""".stripMargin,

    "neyman_allocation_plan" ->
      s"""WITH strata AS (
         |  SELECT c_mktsegment AS segment,
         |         CAST(count(*) AS BIGINT) AS n_h,
         |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
         |           AS HUGEINT) AS sx,
         |         CAST(sum(CAST(CAST(round(c_acctbal * 100) AS BIGINT)
         |           AS HUGEINT) * CAST(round(c_acctbal * 100) AS BIGINT))
         |           AS HUGEINT) AS sxx
         |  FROM customer GROUP BY 1),
         |w AS (
         |  SELECT segment, n_h, $wLeafSql AS w_fp FROM strata),
         |tot AS (SELECT CAST(sum(w_fp) AS BIGINT) AS wt FROM w),
         |base AS (
         |  SELECT segment, n_h, w_fp,
         |         $Budget * w_fp // wt AS alloc_base,
         |         $Budget * w_fp % wt AS rem
         |  FROM w CROSS JOIN tot),
         |lo AS (SELECT $Budget - sum(alloc_base) AS l FROM base),
         |rk AS (
         |  SELECT a.segment, a.n_h, a.w_fp, a.alloc_base,
         |         CAST(count(b.segment) AS BIGINT) AS n_ahead
         |  FROM base a LEFT JOIN base b
         |    ON b.rem > a.rem OR (b.rem = a.rem AND b.segment < a.segment)
         |  GROUP BY a.segment, a.n_h, a.w_fp, a.alloc_base)
         |SELECT segment, n_h, w_fp,
         |       CAST(alloc_base
         |         + CASE WHEN n_ahead < l THEN 1 ELSE 0 END AS BIGINT)
         |         AS alloc
         |FROM rk CROSS JOIN lo ORDER BY segment""".stripMargin,
  )
}
