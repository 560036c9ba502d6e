package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  * Round-12 widening adds the two reads that make a fleet of parallel
  * tests trustworthy: `bh_fdr_ks_nations` (Benjamini–Hochberg step-up
  * control over 25 per-nation KS drift tests — the difference between
  * "one alert" and "25 uncorrected alarms") and `delta_method_ratio_ci`
  * (the delta-method SE of a ratio-of-means metric with the customer as
  * the randomization unit — the cluster-robust CI naive per-order
  * variance gets wrong).
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

  /** KS CDF gap at one support bucket, 1e-9 fp: |F_i − G_i| where F_i
    * is nation i's CDF and G_i the complement's, both from exact int64
    * cumulative counts. One shared string → identical IEEE tree.
    */
  private val ksGapSql =
    """CAST(FLOOR(abs(CAST(cum AS DOUBLE) / n_i
      | - CAST(gcum - cum AS DOUBLE) / (n_tot - n_i))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Smirnov asymptotic tail p ≈ min(1, 2·exp(−2·D²·n·m/(n+m))) in
    * 1e-9 fp, from the already-truncated d_fp (so both engines start
    * from the same D) and exact integer group sizes.
    */
  private val ksPSql =
    """CAST(LEAST(1000000000, CAST(FLOOR(2.0
      | * exp(-2.0 * (CAST(d_fp AS DOUBLE) / 1000000000.0)
      |       * (CAST(d_fp AS DOUBLE) / 1000000000.0)
      |       * (CAST(n_i AS DOUBLE) * (n_tot - n_i) / n_tot))
      | * 1000000000.0) AS BIGINT)) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  /** Delta-method ratio point estimate Σx/Σy in 1e-6 fp (cents/order). */
  private val ratioSql =
    """CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)
      | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Delta-method SE of the ratio-of-means estimator R̂ = x̄/ȳ, 1e-6 fp:
    * sqrt((s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²)) with sample (co)variances
    * from exact moment sums (variance numerators n·Σab−Σa·Σb are
    * DECIMAL(38,0)/HUGEINT-exact before the ONE double formula).
    */
  private val seSql =
    """CAST(FLOOR(sqrt(
      |  ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |   - 2.0 * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |   + (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
      |     * (CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE))
      |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
      |  * CAST(n AS DOUBLE)
      |  / (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Shared σ_h·N_h weight leaf (1e-6 fp): N·sqrt((n·Σx²−(Σx)²)/n²). */
  private val wLeafSql =
    """CAST(FLOOR(CAST(n_h AS DOUBLE)
      | * sqrt((CAST(n_h AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE)))
      | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Φ⁻¹(0.975) and Φ⁻¹(0.80) as Scala double literals (the gumbelC
    * interpolation recipe — neither engine's SQL has an inverse normal
    * CDF); the standard published values for α=0.05 two-sided / 80%
    * power.
    */
  private val ZAlphaHalf = 1.959963984540054
  private val ZBeta = 0.8416212335729143

  /** Woolf CI endpoint for the odds ratio, 1e-6 fp: exp(ln(ad/bc) ∓
    * 1.96·√(1/a+1/b+1/c+1/d)) as ONE FLOOR'd IEEE tree over the exact
    * 2×2 cells; NULL-armed on any empty cell.
    */
  private def orCiSql(sign: String): String =
    s"""CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
       | CAST(FLOOR(exp(
       |   ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
       |   $sign 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d))
       |   * 1000000.0) AS BIGINT)
       |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")

  /** Two-proportion MDE leaf (z_{α/2}+z_β)·√(2p̂(1−p̂)/n) in 1e-6 fp —
    * ONE FLOOR'd IEEE tree over the exact (n_purchases, n_events,
    * n_per_arm) integers, identical text both engines.
    */
  private val mdeSql =
    s"""CAST(FLOOR(($ZAlphaHalf + $ZBeta)
       | * sqrt(2.0 * (CAST(n_purchases AS DOUBLE) / n_events)
       |   * (1.0 - CAST(n_purchases AS DOUBLE) / n_events)
       |   / n_per_arm) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

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

    // BH/FDR over per-nation KS drift tests (r12): for each nation, the
    // two-sample KS distance between its order-value distribution
    // (1000-dollar-bucket quantized) and the corpus complement, the
    // Smirnov asymptotic tail p ≈ min(1, 2·exp(−2·D²·nm/(n+m))), then
    // Benjamini–Hochberg step-up at α = 1/20 (Benjamini & Hochberg
    // 1995) — the multiple-testing control a metrics platform runs
    // before alerting "nation X shifted" across 25 parallel tests.
    // Scale: one map-side (nation × bucket) count; everything after
    // runs on the ≤|nations|·|buckets| value-domain grid (the
    // per-nation CDF window is PARTITIONED by nation; the global CDF
    // is re-derived by summing the grid, not a partition-less window);
    // the BH rank is the ≤m² broadcast self-join (neyman recipe).
    // Step-up comparison p ≤ α·r/m is exact integer arithmetic on the
    // already-truncated p_fp, so rejection sets match bit-for-bit.
    "bh_fdr_ks_nations" -> ((s, d) => {
      val cnt = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
          "o_custkey")
        .groupBy(col("c_nationkey").as("nk"),
          expr("CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT)").as("b"))
        .agg(count(lit(1)).as("cb"))
      val nk  = cnt.groupBy("nk").agg(sum("cb").as("n_i"))
      val bs  = cnt.select("b").distinct()
      val tot = nk.agg(sum("n_i").as("n_tot"), count(lit(1)).as("m_tests"))
      val wCum = Window.partitionBy("nk").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val grid = nk.crossJoin(broadcast(bs))
        .join(cnt, Seq("nk", "b"), "left")
        .withColumn("c0", coalesce(col("cb"), lit(0L)))
        .withColumn("cum", sum("c0").over(wCum))
      val g = grid.groupBy("b").agg(sum("cum").as("gcum"))
      val per = grid.join(broadcast(g), "b").crossJoin(broadcast(tot))
        .withColumn("gap_fp", expr(ksGapSql))
        .groupBy("nk", "n_i", "n_tot", "m_tests")
        .agg(max("gap_fp").as("d_fp"))
        .withColumn("p_fp", expr(ksPSql))
      val rk = per.select(col("nk").as("nk2"), col("p_fp").as("p2"))
      val ranked = per.join(broadcast(rk),
          col("p2") < col("p_fp") ||
            (col("p2") === col("p_fp") && col("nk2") < col("nk")), "left")
        .groupBy("nk", "n_i", "d_fp", "p_fp", "m_tests")
        .agg((count(col("nk2")) + lit(1L)).as("bh_rank"))
      val kstar = ranked.agg(max(when(
          expr("p_fp * 20 * m_tests <= bh_rank * 1000000000"),
          col("bh_rank"))).as("k_star"))
      ranked.crossJoin(broadcast(kstar))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          "nk")
        .withColumn("rejected", expr(
          """CAST(CASE WHEN k_star IS NOT NULL AND bh_rank <= k_star
            | THEN 1 ELSE 0 END AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .select("nation", "n_i", "d_fp", "p_fp", "bh_rank", "rejected")
        .orderBy("nation")
    }),

    // Delta-method CI for a ratio-of-means metric (r12): revenue per
    // order by market segment, with the customer as the randomization
    // unit (the cluster-robust read every experiment platform needs —
    // naive per-order variance understates SE when orders cluster
    // within customers; Deng et al. 2017's ratio-metric recipe). Per
    // customer x = Σ order cents, y = order count; per segment the six
    // exact moments (n, Σx, Σy, Σx², Σy², Σxy — squares lifted to
    // DECIMAL(38,0)/HUGEINT) feed ONE shared IEEE formula for R and
    // its delta-method SE; the 95% bounds are integer arithmetic on
    // the truncated fps. Two map-side-combinable aggregate levels
    // (customer, then segment); the report is |segments|-bounded.
    "delta_method_ratio_ci" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), "o_custkey")
        .groupBy("segment", "o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"),
          count(lit(1)).as("y"))
      per.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .withColumn("ratio_fp", expr(ratioSql))
        .withColumn("se_fp", expr(seSql))
        .select(col("segment"), col("n"), col("sy").as("n_orders"),
          col("ratio_fp"), col("se_fp"),
          expr("ratio_fp - CAST(FLOOR(1.96 * se_fp) AS BIGINT)").as("lo_fp"),
          expr("ratio_fp + CAST(FLOOR(1.96 * se_fp) AS BIGINT)").as("hi_fp"))
        .orderBy("segment")
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

    // Weekend odds ratio with Woolf CI (r12, third session): does the
    // weekend change the odds an event is a purchase? OR = ad/bc over
    // the 2×2 (weekend × purchase) with the Woolf log-interval
    // ln OR ± 1.96·√(1/a+1/b+1/c+1/d) (Woolf 1955) — the
    // epidemiology-grade effect read the raw rate difference
    // understates/overstates at extreme base rates. Scale: ONE
    // map-side 4-cell conditional count (dow from the epoch-day
    // convention); OR is an exact DECIMAL(38,0)/HUGEINT rational; CI
    // endpoints are terminal FLOOR'd IEEE leaves over the exact cell
    // counts.
    "odds_ratio_weekend" -> ((s, d) => {
      Tables.events(s, d)
        .select(expr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5")
          .as("we"), (col("event_type") === "purchase").as("pur"))
        .agg(
          sum(when(col("we") && col("pur"), 1L).otherwise(0L)).as("a"),
          sum(when(col("we") && !col("pur"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("we") && col("pur"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("we") && !col("pur"), 1L).otherwise(0L)).as("d"))
        .withColumn("or_fp", expr(
          """CASE WHEN b > 0 AND c > 0 THEN
            | CAST(CAST(a AS DECIMAL(38,0)) * d * 1000000
            |   DIV (CAST(b AS DECIMAL(38,0)) * c) AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .withColumn("lo_fp", expr(orCiSql("-")))
        .withColumn("hi_fp", expr(orCiSql("+")))
        .select("a", "b", "c", "d", "or_fp", "lo_fp", "hi_fp")
    }),

    // Mantel–Haenszel pooled odds ratio (r13; Mantel & Haenszel 1959)
    // of weekend × purchase STRATIFIED BY CALENDAR MONTH (r16,
    // VERDICT r15 ask #3: the op ran on epoch-week fallback strata for
    // three rounds because the shipped fixture spans one month; the
    // deterministic [[Tables.eventsMultiMonth]] view now provides 3
    // true calendar months, so the stratum is the real year·12+month
    // key a production confounder adjustment uses) — the
    // confounder-adjusted companion to odds_ratio_weekend above:
    // if purchase propensity and weekend mix both drift over time,
    // the crude OR mixes the strata (Simpson's direction) while
    // OR_MH = Σaᵢdᵢ/nᵢ ÷ Σbᵢcᵢ/nᵢ weights each month by its
    // information.
    // Exactness: the per-stratum fractions truncate at 1e6 fixed
    // point BEFORE the integer sums (pinned convention, deterministic
    // on both engines); the final ratio is one DECIMAL(38,0)/HUGEINT
    // division. Scale: ONE map-side month×4-cell conditional count;
    // everything downstream is |months|-bounded.
    "mantel_haenszel_or" -> ((s, d) => {
      Tables.eventsMultiMonth(s, d)
        .select(expr("year(ts) * 12 + month(ts)").as("wk"),
          expr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5").as("we"),
          (col("event_type") === "purchase").as("pur"))
        .groupBy("wk")
        .agg(
          sum(when(col("we") && col("pur"), 1L).otherwise(0L)).as("a"),
          sum(when(col("we") && !col("pur"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("we") && col("pur"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("we") && !col("pur"), 1L).otherwise(0L)).as("dd"))
        .select(col("wk"),
          // DECIMAL(38,0) lift on the per-stratum products (ADVICE
          // r13): plain int64 a·d·1e6 wraps silently past ~9e18 (≈3e6
          // events per cell) while DuckDB BIGINT errors — the lift
          // makes both engines exact; DIV lands back on BIGINT
          expr("CAST(a AS DECIMAL(38,0)) * dd * 1000000" +
            " DIV (a + b + c + dd)").as("num_i"),
          expr("CAST(b AS DECIMAL(38,0)) * c * 1000000" +
            " DIV (a + b + c + dd)").as("den_i"))
        .agg(count(lit(1)).as("n_strata"),
          sum("num_i").as("mh_num_fp"), sum("den_i").as("mh_den_fp"))
        .withColumn("or_mh_fp", expr(
          """CASE WHEN mh_den_fp > 0 THEN
            |CAST(CAST(mh_num_fp AS DECIMAL(38,0)) * 1000000
            |  DIV mh_den_fp AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .select("n_strata", "mh_num_fp", "mh_den_fp", "or_mh_fp")
    }),

    // Cochran–Mantel–Haenszel χ² (r13; Cochran 1954, Mantel &
    // Haenszel 1959, no continuity correction) for the SAME
    // month-stratified weekend×purchase table as mantel_haenszel_or
    // (calendar-month strata via [[Tables.eventsMultiMonth]] since
    // r16 — see that op's note): that op sizes the pooled effect,
    // this one tests it —
    // χ² = (Σaᵢ − ΣE[aᵢ])²/ΣVar(aᵢ) with E = r1c1/n and
    // Var = r1·r2·c1·c2/(n²(n−1)) under the margins-fixed null.
    // Exactness: E and Var truncate at 1e6 fixed point PER STRATUM
    // before the integer sums (the or_mh pinned convention); the
    // quadratic form is one DECIMAL(38,0) product + one truncating
    // division. Strata need n ≥ 2 (Var undefined at n=1; pinned
    // filter on both engines). Scale: ONE map-side month×4-cell
    // conditional count; everything downstream |months|-bounded.
    "cmh_chi2_weekend" -> ((s, d) => {
      Tables.eventsMultiMonth(s, d)
        .select(expr("year(ts) * 12 + month(ts)").as("wk"),
          expr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5").as("we"),
          (col("event_type") === "purchase").as("pur"))
        .groupBy("wk")
        .agg(
          sum(when(col("we") && col("pur"), 1L).otherwise(0L)).as("a"),
          sum(when(col("we") && !col("pur"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("we") && col("pur"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("we") && !col("pur"), 1L).otherwise(0L)).as("dd"))
        .withColumn("n", expr("a + b + c + dd"))
        .filter(col("n") >= 2)
        .select(col("a"),
          expr("CAST(CAST(a + b AS DECIMAL(38,0)) * (a + c) * 1000000"
            + " DIV n AS BIGINT)").as("e_i"),
          expr("""CAST(CAST(a + b AS DECIMAL(38,0)) * (c + dd) * (a + c)
                 | * (b + dd) * 1000000
                 | DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("v_i"))
        .agg(count(lit(1)).as("n_strata"), sum("a").as("t_sum"),
          sum("e_i").as("e_fp"), sum("v_i").as("v_fp"))
        .withColumn("chi2_fp", expr(
          // t_sum·1e6 lifted BEFORE the subtraction (ADVICE r13): the
          // int64 product wraps past ~9e12 purchases, a 100 TB-plausible
          // count
          """CASE WHEN v_fp > 0 THEN
            |CAST((CAST(t_sum AS DECIMAL(38,0)) * 1000000 - e_fp)
            |  * (CAST(t_sum AS DECIMAL(38,0)) * 1000000 - e_fp)
            |  DIV v_fp AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .select("n_strata", "t_sum", "e_fp", "v_fp", "chi2_fp")
    }),

    // A/B power planning grid (r12, third session): the minimum
    // detectable effect on the purchase-event rate at α=0.05
    // (two-sided) / 80% power across candidate per-arm sizes —
    // MDE(n) = (z_{α/2}+z_β)·√(2p̂(1−p̂)/n) (the standard two-
    // proportion approximation every experiment sizing sheet runs),
    // read BEFORE launching so an underpowered test never ships.
    // Scale: the rate is ONE map-side conditional count over the
    // event stream; the 6-point n grid rides a broadcast cross join;
    // each MDE is ONE terminal FLOOR'd IEEE leaf over the exact
    // (n_purchases, n_events) pair with the normal quantiles
    // interpolated as Scala double literals (the gumbelC recipe — SQL
    // has no Φ⁻¹).
    "ab_mde_power_grid" -> ((s, d) => {
      val ev = Tables.events(s, d).agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      val grid = ev.sparkSession.range(0, 1).select(explode(expr(
        "array(1000L, 5000L, 10000L, 50000L, 100000L, 500000L)"))
        .as("n_per_arm"))
      ev.crossJoin(broadcast(grid))
        .withColumn("mde_abs_fp", expr(mdeSql))
        .withColumn("mde_rel_fp", expr(
          """CASE WHEN n_purchases > 0
            | THEN CAST(CAST(mde_abs_fp AS DECIMAL(38,0)) * n_events
            |   DIV n_purchases AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .select("n_per_arm", "n_events", "n_purchases", "mde_abs_fp",
          "mde_rel_fp")
        .orderBy("n_per_arm")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "bh_fdr_ks_nations" ->
      s"""WITH cnt AS (
         |  SELECT c_nationkey AS nk,
         |         CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS b,
         |         CAST(count(*) AS BIGINT) AS cb
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |nk AS (SELECT nk, CAST(sum(cb) AS BIGINT) AS n_i
         |       FROM cnt GROUP BY 1),
         |bs AS (SELECT DISTINCT b FROM cnt),
         |tot AS (SELECT CAST(sum(n_i) AS BIGINT) AS n_tot,
         |               CAST(count(*) AS BIGINT) AS m_tests FROM nk),
         |grid AS (
         |  SELECT nk.nk, nk.n_i, bs.b,
         |         CAST(sum(coalesce(cnt.cb, 0)) OVER
         |           (PARTITION BY nk.nk ORDER BY bs.b) AS BIGINT) AS cum
         |  FROM nk CROSS JOIN bs
         |  LEFT JOIN cnt ON cnt.nk = nk.nk AND cnt.b = bs.b),
         |g AS (SELECT b, CAST(sum(cum) AS BIGINT) AS gcum
         |      FROM grid GROUP BY 1),
         |gaps AS (
         |  SELECT grid.nk, grid.n_i, n_tot, m_tests, $ksGapSql AS gap_fp
         |  FROM grid JOIN g USING (b) CROSS JOIN tot),
         |per AS (
         |  SELECT nk, n_i, n_tot, m_tests,
         |         CAST(max(gap_fp) AS BIGINT) AS d_fp
         |  FROM gaps GROUP BY 1, 2, 3, 4),
         |pp AS (SELECT nk, n_i, m_tests, d_fp, $ksPSql AS p_fp FROM per),
         |ranked AS (
         |  SELECT a.nk, a.n_i, a.d_fp, a.p_fp, a.m_tests,
         |         CAST(count(b2.nk) + 1 AS BIGINT) AS bh_rank
         |  FROM pp a LEFT JOIN pp b2
         |    ON b2.p_fp < a.p_fp OR (b2.p_fp = a.p_fp AND b2.nk < a.nk)
         |  GROUP BY 1, 2, 3, 4, 5),
         |ks AS (SELECT max(CASE WHEN p_fp * 20 * m_tests
         |                         <= bh_rank * 1000000000
         |              THEN bh_rank END) AS k_star FROM ranked)
         |SELECT n_name AS nation, n_i, d_fp, p_fp, bh_rank,
         |       CAST(CASE WHEN k_star IS NOT NULL AND bh_rank <= k_star
         |            THEN 1 ELSE 0 END AS BIGINT) AS rejected
         |FROM ranked CROSS JOIN ks
         |JOIN nation ON n_nationkey = ranked.nk
         |ORDER BY nation""".stripMargin,

    "delta_method_ratio_ci" ->
      s"""WITH per AS (
         |  SELECT c_mktsegment AS segment, o_custkey,
         |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS x,
         |         CAST(count(*) AS BIGINT) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(y) AS BIGINT) AS sy,
         |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         |         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         |         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
         |  FROM per GROUP BY 1),
         |r AS (SELECT segment, n, sy, $ratioSql AS ratio_fp,
         |             $seSql AS se_fp FROM m)
         |SELECT segment, n, sy AS n_orders, ratio_fp, se_fp,
         |       CAST(ratio_fp - CAST(FLOOR(1.96 * se_fp) AS BIGINT)
         |         AS BIGINT) AS lo_fp,
         |       CAST(ratio_fp + CAST(FLOOR(1.96 * se_fp) AS BIGINT)
         |         AS BIGINT) AS hi_fp
         |FROM r ORDER BY segment""".stripMargin,

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

    "odds_ratio_weekend" ->
      s"""WITH cells AS (
         |  SELECT
         |    CAST(sum(CASE WHEN we AND pur THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(sum(CASE WHEN we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN NOT we AND pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN NOT we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we,
         |               event_type = 'purchase' AS pur
         |        FROM events))
         |SELECT a, b, c, d,
         |       CASE WHEN b > 0 AND c > 0 THEN
         |         CAST(CAST(a AS HUGEINT) * d * 1000000
         |           // (CAST(b AS HUGEINT) * c) AS BIGINT)
         |       ELSE NULL END AS or_fp,
         |       ${orCiSql("-")} AS lo_fp,
         |       ${orCiSql("+")} AS hi_fp
         |FROM cells""".stripMargin,

    // same truncate-then-sum stratum fractions, same final division;
    // calendar-month strata over the deterministic multi-month view
    // (r16 — Tables.eventsMultiMonthDuck)
    "mantel_haenszel_or" ->
      s"""WITH ev AS (${graft.Tables.eventsMultiMonthDuck}),
         |cells AS (
         |  SELECT year(ts) * 12 + month(ts) AS wk,
         |    CAST(sum(CASE WHEN we AND pur THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(sum(CASE WHEN we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN NOT we AND pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN NOT we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dd
         |  FROM (SELECT ts,
         |               (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we,
         |               event_type = 'purchase' AS pur
         |        FROM ev)
         |  GROUP BY 1),
        |terms AS (
        |  SELECT CAST(CAST(a AS HUGEINT) * dd * 1000000
        |           // (a + b + c + dd) AS BIGINT) AS num_i,
        |         CAST(CAST(b AS HUGEINT) * c * 1000000
        |           // (a + b + c + dd) AS BIGINT) AS den_i
        |  FROM cells),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |         CAST(sum(num_i) AS BIGINT) AS mh_num_fp,
        |         CAST(sum(den_i) AS BIGINT) AS mh_den_fp
        |  FROM terms)
        |SELECT n_strata, mh_num_fp, mh_den_fp,
        |  CASE WHEN mh_den_fp > 0 THEN
        |    CAST(CAST(mh_num_fp AS HUGEINT) * 1000000 // mh_den_fp
        |      AS BIGINT)
        |  ELSE NULL END AS or_mh_fp
        |FROM agg""".stripMargin,

    // same truncate-then-sum E/Var strata, same n >= 2 filter, same
    // quadratic-form division; calendar-month strata over the
    // deterministic multi-month view (r16)
    "cmh_chi2_weekend" ->
      s"""WITH ev AS (${graft.Tables.eventsMultiMonthDuck}),
         |cells AS (
         |  SELECT year(ts) * 12 + month(ts) AS wk,
         |    CAST(sum(CASE WHEN we AND pur THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(sum(CASE WHEN we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN NOT we AND pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN NOT we AND NOT pur THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dd
         |  FROM (SELECT ts,
         |               (epoch_us(ts) // 86400000000 + 4) % 7 >= 5 AS we,
         |               event_type = 'purchase' AS pur
         |        FROM ev)
         |  GROUP BY 1),
        |terms AS (
        |  SELECT a,
        |         CAST(CAST(a + b AS HUGEINT) * (a + c) * 1000000
        |           // (a + b + c + dd) AS BIGINT) AS e_i,
        |         CAST(CAST(a + b AS HUGEINT) * (c + dd) * (a + c)
        |           * (b + dd) * 1000000
        |           // (CAST(a + b + c + dd AS HUGEINT)
        |              * (a + b + c + dd) * (a + b + c + dd - 1))
        |           AS BIGINT) AS v_i
        |  FROM cells WHERE a + b + c + dd >= 2),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |         CAST(sum(a) AS BIGINT) AS t_sum,
        |         CAST(sum(e_i) AS BIGINT) AS e_fp,
        |         CAST(sum(v_i) AS BIGINT) AS v_fp
        |  FROM terms)
        |SELECT n_strata, t_sum, e_fp, v_fp,
        |  CASE WHEN v_fp > 0 THEN
        |    CAST((CAST(t_sum AS HUGEINT) * 1000000 - e_fp)
        |      * (CAST(t_sum AS HUGEINT) * 1000000 - e_fp)
        |      // v_fp AS BIGINT)
        |  ELSE NULL END AS chi2_fp
        |FROM agg""".stripMargin,

    "ab_mde_power_grid" ->
      s"""WITH ev AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_events,
         |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
         |              ELSE 0 END) AS BIGINT) AS n_purchases
         |  FROM events),
         |grid AS (SELECT CAST(unnest([1000, 5000, 10000, 50000, 100000,
         |                             500000]) AS BIGINT) AS n_per_arm),
         |m AS (
         |  SELECT g.n_per_arm, ev.n_events, ev.n_purchases,
         |         $mdeSql AS mde_abs_fp
         |  FROM ev CROSS JOIN grid g)
         |SELECT n_per_arm, n_events, n_purchases, mde_abs_fp,
         |       CASE WHEN n_purchases > 0
         |         THEN CAST(CAST(mde_abs_fp AS HUGEINT) * n_events
         |           // n_purchases AS BIGINT)
         |       ELSE NULL END AS mde_rel_fp
         |FROM m ORDER BY n_per_arm""".stripMargin,
  )
}
