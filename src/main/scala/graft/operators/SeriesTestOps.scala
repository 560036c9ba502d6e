package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 diagnostic-test widening: the remaining classical
  * distribution-free checks an analytics deployment runs on its daily
  * operational series and its value strata before trusting dashboards —
  * Cox–Stuart trend (the sign-test cousin of seasonal_mann_kendall),
  * Kendall's turning-point randomness test, Dixon's Q single-outlier
  * screen, and Bartlett's equal-variance test (the parametric
  * high-power sibling of brown_forsythe_priority).
  *
  * Exactness discipline (the house conventions, SURVEY §5):
  *   - daily series = ONE map-side events aggregate,
  *     localCheckpoint-pinned before rank fan-out (batch_chunks idiom);
  *   - all orderings are GlobalRank's measured two-phase numbering —
  *     never a partition-less window at scale;
  *   - counts/moments fold exactly (BIGINT / DECIMAL(38,0) lifts);
  *     each statistic ends in ONE shared-text IEEE leaf FLOOR'd at
  *     fixed point, so both engines compute bit-identical output;
  *   - Bartlett's ln leaves follow the atkinson recipe: per-group
  *     FLOOR'd 1e-9 ln values summed as integers (order-free), with
  *     the pooled variance truncated at 1e6 fixed point BEFORE its ln
  *     (the or_mh truncate-then-sum convention).
  */
object SeriesTestOps extends OpGroup {

  /** Daily event counts keyed by epoch day — the shared series. */
  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
        .as("di"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint()

  private val dailyDuck =
    """daily AS MATERIALIZED (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X63 — Cox–Stuart trend test (Cox & Stuart 1955): pair day i with
    // day i + ⌈n/2⌉ (middle observation dropped when n is odd) and
    // sign-test the pairs — the assumption-free "is volume trending"
    // read that works where OLS is outlier-dominated. Ties drop from
    // the effective count (the standard treatment, pinned both
    // engines); z = (n_pos − n_neg)/√n_eff is ONE FLOOR'd IEEE leaf.
    // Scale: ≤|days| rows after the map-side daily aggregate; the
    // pairing is a rank-shifted equi-join (mase pattern).
    "cox_stuart_trend" -> ((s, d) => {
      val dd = daily(s, d)
      val rn = graft.functions.GlobalRank
        .rowNumber(dd, "rn", Nil, Seq("di"))
      val n = dd.agg(count(lit(1)).as("n_days"))
      val right = rn.crossJoin(broadcast(n))
        .select((col("rn") - (col("n_days") - expr("n_days DIV 2")))
          .as("rn"), col("x").as("x2"))
      rn.select(col("rn"), col("x").as("x1"))
        .join(right, "rn")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("x2") > col("x1"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("x2") < col("x1"), 1L).otherwise(0L)).as("n_neg"))
        .crossJoin(broadcast(n))
        .select(col("n_days"), col("n_pairs"), col("n_pos"), col("n_neg"),
          expr("""CASE WHEN n_pos + n_neg > 0 THEN
                 | CAST(FLOOR((CAST(n_pos AS DOUBLE) - n_neg)
                 |   / sqrt(CAST(n_pos + n_neg AS DOUBLE)) * 1000000.0)
                 |   AS BIGINT)
                 |ELSE CAST(NULL AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("z_fp"))
    }),

    // X64 — turning-point randomness test (Kendall & Stuart): count
    // strict local extrema T among consecutive observed days; under
    // i.i.d. randomness E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 — the
    // quick "is this series serially structured at all" read run
    // before the heavier ACF/Ljung–Box machinery. Equal-neighbor ties
    // are NOT turning points (strict inequalities, pinned). Scale:
    // two rank-shifted equi-joins over the ≤|days| rollup.
    "turning_points_test" -> ((s, d) => {
      val rn = graft.functions.GlobalRank
        .rowNumber(daily(s, d), "rn", Nil, Seq("di"))
      val prev = rn.select((col("rn") + 1).as("rn"), col("x").as("xp"))
      val next = rn.select((col("rn") - 1).as("rn"), col("x").as("xn"))
      rn.join(prev, "rn").join(next, "rn")
        .agg(
          sum(when((col("x") > col("xp") && col("x") > col("xn")) ||
            (col("x") < col("xp") && col("x") < col("xn")), 1L)
            .otherwise(0L)).as("n_turning"),
          (count(lit(1)) + 2).as("n_days"))
        .filter(col("n_days") >= 4)
        .select(col("n_days"), col("n_turning"),
          expr("""CAST(FLOOR((CAST(n_turning AS DOUBLE)
                 |   - 2.0 * (n_days - 2) / 3.0)
                 | / sqrt((16.0 * n_days - 29.0) / 90.0) * 1000000.0)
                 | AS BIGINT)""".stripMargin.replace("\n", " ")).as("z_fp"))
    }),

    // X65 — Dixon's Q single-outlier screen (Dixon 1950): the
    // gap-to-range ratios at both ends of the daily-volume order
    // statistics — the two-line sanity read (is yesterday's spike ONE
    // bad day or the new regime) run before gesd's full sweep. Order
    // statistics are rank-defined over the (x, di) total order; both
    // ratios are exact 1e6 fixed-point rationals (counts ≤1e8 keep
    // the products 4 orders inside int64). Scale: rank via the
    // measured two-phase numbering; the pick is a 4-row conditional
    // aggregate.
    "dixon_q_outlier" -> ((s, d) => {
      val dd = daily(s, d)
      val rn = graft.functions.GlobalRank
        .rowNumber(dd, "rn", Nil, Seq("x", "di"))
      rn.crossJoin(broadcast(dd.agg(count(lit(1)).as("n_days"))))
        .agg(
          max(col("n_days")).as("n_days"),
          min(when(col("rn") === 1, col("x"))).as("x_min"),
          min(when(col("rn") === 2, col("x"))).as("x_min2"),
          min(when(col("rn") === col("n_days") - 1, col("x")))
            .as("x_max2"),
          min(when(col("rn") === col("n_days"), col("x"))).as("x_max"))
        .filter(col("n_days") >= 3)
        .select(col("n_days"), col("x_min"), col("x_min2"), col("x_max2"),
          col("x_max"),
          expr("""CASE WHEN x_max > x_min
                 | THEN (x_min2 - x_min) * 1000000 DIV (x_max - x_min)
                 |ELSE CAST(NULL AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("q_min_fp"),
          expr("""CASE WHEN x_max > x_min
                 | THEN (x_max - x_max2) * 1000000 DIV (x_max - x_min)
                 |ELSE CAST(NULL AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("q_max_fp"))
    }),

    // X66 — Bartlett's equal-variance test (Bartlett 1937) across the
    // five order priorities on order value — the high-power parametric
    // sibling of brown_forsythe_priority (run together: BF robust to
    // tails, Bartlett sharp under normality; disagreement itself is
    // the finding). Exact per-group moments (n, S, Q in cents,
    // DECIMAL-lifted); v = n·Q − S² so s² = v/(n(n−1)); the pooled
    // (n−1)s² terms truncate at 1e6 BEFORE the sum (or_mh convention);
    // the two ln leaves FLOOR at 1e-9 (atkinson recipe); the Bartlett
    // correction C folds as exact 1e9-scaled integer harmonics.
    // Groups with n < 2 or zero variance are excluded on BOTH engines
    // (pinned). Scale: ONE map-side moment pass; everything downstream
    // is |priorities|-bounded scalar stitching.
    "bartlett_test_priority" -> ((s, d) => {
      val g0 = Tables.orders(s, d)
        .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
          .as("sc"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
        .groupBy("sc")
        .agg(count(lit(1)).as("n_g"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"))
        .withColumn("v", expr(
          "CAST(n_g AS DECIMAL(38,0)) * qx - sx * sx"))
        .filter(col("n_g") >= 2 && expr("v > 0"))
        .withColumn("lnv_fp", expr(
          """CAST(FLOOR(ln(CAST(v AS DOUBLE)
            | / (CAST(n_g AS DOUBLE) * (n_g - 1))) * 1000000000.0)
            | AS BIGINT)""".stripMargin.replace("\n", " ")))
        // (n−1)s² = v/n at 1e6 fixed point, truncated (deterministic).
        // Remainder-subtraction, NOT DIV: Spark DIV returns BIGINT even
        // on DECIMAL operands, and v·1e6/n ≈ 2.7e22 at sf0.001 already
        // overflows it (the r12s5 Sz²/n lesson)
        .withColumn("w_fp", expr(
          "CAST((v * 1000000 - (v * 1000000) % n_g) / n_g" +
            " AS DECIMAL(38,0))"))
      val m = g0.agg(count(lit(1)).as("k"), sum("n_g").as("n_tot"),
          sum("w_fp").as("sw_fp"),
          sum(expr("CAST(n_g - 1 AS DECIMAL(38,0)) * lnv_fp"))
            .as("sum_lnv"),
          sum(expr("1000000000 DIV (n_g - 1)")).as("sum_h"))
        .filter(col("k") >= 2 && col("n_tot") > col("k"))
        .withColumn("lnp_fp", expr(
          """CAST(FLOOR(ln(CAST(sw_fp AS DOUBLE)
            | / (1000000.0 * (n_tot - k))) * 1000000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .withColumn("t_fp", expr(
          "CAST(n_tot - k AS DECIMAL(38,0)) * lnp_fp - sum_lnv"))
        .withColumn("c_fp", expr(
          """1000000000 + (sum_h - 1000000000 DIV (n_tot - k))
            | DIV (3 * (k - 1))""".stripMargin.replace("\n", " ")))
        .select(col("k"), col("n_tot"), col("lnp_fp"), col("c_fp"),
          expr("""CASE WHEN t_fp >= 0
                 | THEN CAST(t_fp * 1000000 DIV c_fp AS BIGINT)
                 | ELSE -CAST((-t_fp) * 1000000 DIV c_fp AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("chi2_fp"))
      g0.select("sc", "n_g", "lnv_fp")
        .crossJoin(broadcast(m))
        .orderBy("sc")
    }),

    // X68 — Wilcoxon signed-rank on day-over-day volume changes
    // (Wilcoxon 1945): is the median daily CHANGE zero, rank-robustly —
    // the one-sample location sibling of mann_whitney (two-sample) and
    // cox_stuart (signs only: Wilcoxon also weighs magnitudes). Zero
    // diffs drop (standard); |d| ranks are DOUBLED midranks over the
    // |d| value support (the ansari doubling — integers, never .5),
    // derived from one two-phase prefix sum; the tie-corrected z is
    // ONE FLOOR'd IEEE leaf over the exact (n, W2⁺, Σ(t³−t)) integers.
    // Scale: diffs via the rank-shifted equi-join; support-bounded
    // downstream.
    "wilcoxon_signed_rank_daily" -> ((s, d) => {
      val rn = graft.functions.GlobalRank
        .rowNumber(daily(s, d), "rn", Nil, Seq("di"))
      val prev = rn.select((col("rn") + 1).as("rn"), col("x").as("xp"))
      val sup = rn.join(prev, "rn")
        .select((col("x") - col("xp")).as("dv"))
        .filter(col("dv") =!= 0)
        .groupBy(abs(col("dv")).as("ad"))
        .agg(count(lit(1)).as("c"),
          sum(when(col("dv") > 0, 1L).otherwise(0L)).as("cpos"))
      val cum = graft.functions.GlobalRank
        .prefixSum(sup, "cum", col("c"), Nil, Seq("ad"))
      cum.agg(sum("c").as("n_diffs"),
          sum(expr("cpos * (2 * (cum - c) + c + 1)")).as("w2_plus"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).as("tt"))
        .select(col("n_diffs"), col("w2_plus"),
          col("tt").cast("long").as("tie_term"),
          expr("""CASE WHEN 2.0 * n_diffs * (n_diffs + 1)
                 |   * (2 * n_diffs + 1) - CAST(tt AS DOUBLE) > 0 THEN
                 | CAST(FLOOR((CAST(w2_plus AS DOUBLE)
                 |     - CAST(n_diffs AS DOUBLE) * (n_diffs + 1) / 2.0)
                 |   / sqrt((2.0 * n_diffs * (n_diffs + 1)
                 |       * (2 * n_diffs + 1) - CAST(tt AS DOUBLE)) / 12.0)
                 |   * 1000000.0) AS BIGINT)
                 |ELSE CAST(NULL AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("z_fp"))
    }),

    // X69 — Page–Hinkley drift alarm (Page 1954): PH_t = M_t − min_{s≤t}
    // M_s over the mean-centered cumulative sum — the sequential
    // upward-drift detector (cusum_drift_alarm watches a z-scored
    // level; PH watches the CUMULATIVE excursion, the shape that fires
    // on slow drifts too small for any single-day z). Exact: M_t is
    // n-scaled to clear the mean (M_t = n·Σ_{s≤t}x_s − t·S — integers,
    // envelope n²·x̄ ≲ 1e16 for a 1e4-day calendar), the prefix-min is
    // an array scan, and the reported statistic is the exact 1e6
    // fixed-point PH_max/n. Past the envelope Spark's non-ANSI BIGINT
    // would wrap silently while DuckDB throws (divergent failure
    // modes) — so each m leaf carries the durbin_watson/cooks loud
    // guard: x ≥ 1 per day makes 0 ≤ prefix_t ≤ S, hence |M_t| ≤ n·S
    // and PH_t ≤ 2·n·S; a CASE in the VALUE path (unprunable) sends
    // 2·n·S ≥ 9.2e18 to raise_error/error on BOTH engines (ADVICE
    // r14). Scale: the O(n²) array pass runs on the CALENDAR-BOUNDED
    // daily rollup (pettitt/sample_entropy precedent); the streaming
    // formulation (one running min) is the production path at
    // unbounded horizons.
    "page_hinkley_drift" -> ((s, d) => {
      val arr = daily(s, d)
        .agg(expr("sort_array(collect_list(named_struct('di', di, 'x', x)))")
          .as("a"))
        .withColumn("n", size(col("a")).cast("long"))
        .filter(col("n") >= 2)
        .withColumn("s_tot", expr(
          "aggregate(a, CAST(0 AS BIGINT), (acc, e) -> acc + e.x)"))
        .withColumn("m", expr(
          """transform(sequence(1, CAST(n AS INT)), t ->
            |  CASE WHEN CAST(n AS DECIMAL(38,0)) * s_tot * 2
            |      < 9200000000000000000 THEN
            |    n * aggregate(slice(a, 1, t), CAST(0 AS BIGINT),
            |      (acc, e) -> acc + e.x) - t * s_tot
            |  ELSE CAST(raise_error('page_hinkley_drift: 2*n*S >= 9.2e18
            | exceeds the BIGINT envelope') AS BIGINT) END)"""
            .stripMargin.replace("\n", " ")))
      val ex = arr.select(col("n").as("n_days"), explode(expr(
          """transform(sequence(1, CAST(n AS INT)), t ->
            |  named_struct('day', CAST(a[t - 1].di AS BIGINT),
            |    'ph', m[t - 1] - array_min(slice(m, 1, t))))"""
            .stripMargin.replace("\n", " "))).as("p"))
        .select(col("n_days"), col("p.day").as("day"), col("p.ph").as("ph"))
      val mx = ex.agg(max("ph").as("ph_max"))
      ex.crossJoin(broadcast(mx))
        .filter(col("ph") === col("ph_max"))
        .groupBy("n_days", "ph_max")
        .agg(min("day").as("alarm_day"))
        .select(col("n_days"), col("ph_max"), col("alarm_day"),
          expr("""CAST(CAST(ph_max AS DECIMAL(38,0)) * 1000000
                 | DIV n_days AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("ph_fp"))
    }),

    // X70 — Lo–MacKinlay variance ratio at q = 7 (1988): the variance
    // of overlapping 7-slot sums over 7× the 1-slot variance — VR ≈ 1
    // under a random walk, > 1 under momentum, < 1 under mean
    // reversion; the aggregation-consistency read run on the daily
    // volume before trusting weekly rollups to have the same noise
    // character as daily ones. Windows are 7 consecutive OBSERVED days
    // (rank-adjacency, the DW gap convention). Exact per-window sums
    // via the two-phase prefix sum + a rank-shifted join; both
    // variance numerators fold in DECIMAL(38,0); VR is ONE FLOOR'd
    // shared-text IEEE leaf over the six exact integers. Scale:
    // ≤|days| rows after the map-side daily aggregate.
    "variance_ratio_weekly" -> ((s, d) => {
      val dd = daily(s, d)
      val rn = graft.functions.GlobalRank
        .rowNumber(dd, "rn", Nil, Seq("di"))
      val pre = graft.functions.GlobalRank
        .prefixSum(rn, "pre", col("x"), Nil, Seq("di"))
      // the first full window (t = 7) subtracts the EMPTY prefix: a
      // virtual rank-0 row with pre = 0 keeps it (n−6 windows total,
      // matching the textbook overlapping count)
      val lag7 = pre.select((col("rn") + 7).as("rn"),
          col("pre").as("pre7"))
        .unionByName(s.range(0, 1)
          .select(lit(7L).as("rn"), lit(0L).as("pre7")))
      val w = pre.join(lag7, "rn")
        .select((col("pre") - col("pre7")).as("w"))
      val mw = w.agg(count(lit(1)).as("nw"),
        sum("w").as("sw"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("qw"))
      dd.agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"))
        .crossJoin(broadcast(mw))
        .withColumn("v1", expr(
          "CAST(n_days AS DECIMAL(38,0)) * qx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .withColumn("vw", expr(
          "CAST(nw AS DECIMAL(38,0)) * qw - CAST(sw AS DECIMAL(38,0)) * sw"))
        .filter(col("n_days") >= 9 && col("nw") >= 2 && expr("v1 > 0"))
        .select(col("n_days"), col("nw").as("n_windows"),
          expr("""CAST(FLOOR((CAST(vw AS DOUBLE)
                 |   / (CAST(nw AS DOUBLE) * (nw - 1)))
                 | / (7.0 * CAST(v1 AS DOUBLE)
                 |   / (CAST(n_days AS DOUBLE) * (n_days - 1)))
                 | * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("vr_fp"))
    }),

    // X71 — von Neumann ratio (von Neumann 1941): mean square
    // successive difference over variance, η = (Σd²/(n−1)) /
    // (Σ(x−x̄)²/n) on the daily volume series — the one-number
    // serial-independence read (η ≈ 2 ⇒ white noise, η < 2 ⇒ positive
    // autocorrelation / trend, η > 2 ⇒ oscillation) that costs two
    // integer folds where the ACF costs a lag sweep. PURE integer end
    // to end: d² and the variance numerator vn = n·Σx² − (Σx)² fold
    // in DECIMAL(38,0)/HUGEINT, and the 1e6 fixed-point ratio is one
    // exact integer floor-division — no IEEE leaf at all. Scale: the
    // successor lookup is a rank-shifted equi-join over the ≤|days|
    // rollup (turning_points pattern); envelope: x ≤ 1e8/day ×
    // n ≤ 1e4 days keeps sd2·n²·1e6 ≤ 1e34 inside DECIMAL(38,0).
    "von_neumann_ratio_daily" -> ((s, d) => {
      val dd = daily(s, d)
      val rn = graft.functions.GlobalRank
        .rowNumber(dd, "rn", Nil, Seq("di"))
      val nxt = rn.select((col("rn") - 1).as("rn"), col("x").as("xn"))
      val diffs = rn.join(nxt, "rn")
        .agg(sum(expr("CAST(x - xn AS DECIMAL(38,0)) * (x - xn)"))
          .as("sd2"))
      dd.agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("qx"))
        .crossJoin(broadcast(diffs))
        .withColumn("vn", expr(
          "CAST(n_days AS DECIMAL(38,0)) * qx - CAST(sx AS DECIMAL(38,0)) * sx"))
        .filter(col("n_days") >= 3 && expr("vn > 0"))
        .select(col("n_days"),
          expr("""CAST(sd2 * n_days * n_days * 1000000
                 | DIV ((n_days - 1) * vn) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("eta_fp"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "cox_stuart_trend" ->
      s"""WITH $dailyDuck,
         |rn AS (SELECT di, x,
         |         CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS rn
         |       FROM daily),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         |pairs AS (
         |  SELECT a.x AS x1, b.x AS x2
         |  FROM rn a CROSS JOIN nn
         |  JOIN rn b ON b.rn = a.rn + (nn.n_days - nn.n_days // 2)),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(CASE WHEN x2 > x1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos,
         |    CAST(sum(CASE WHEN x2 < x1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_neg
         |  FROM pairs)
         |SELECT n_days, n_pairs, n_pos, n_neg,
         |  CASE WHEN n_pos + n_neg > 0 THEN
         |    CAST(FLOOR((CAST(n_pos AS DOUBLE) - n_neg)
         |      / sqrt(CAST(n_pos + n_neg AS DOUBLE)) * 1000000.0)
         |      AS BIGINT)
         |  ELSE NULL END AS z_fp
         |FROM agg CROSS JOIN nn""".stripMargin,

    "turning_points_test" ->
      s"""WITH $dailyDuck,
         |rn AS (SELECT di, x,
         |         CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS rn
         |       FROM daily),
         |t AS (
         |  SELECT c.x, p.x AS xp, n.x AS xn
         |  FROM rn c JOIN rn p ON p.rn = c.rn - 1
         |            JOIN rn n ON n.rn = c.rn + 1),
         |agg AS (
         |  SELECT CAST(sum(CASE WHEN (x > xp AND x > xn)
         |                         OR (x < xp AND x < xn)
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
         |         CAST(count(*) + 2 AS BIGINT) AS n_days
         |  FROM t)
         |SELECT n_days, n_turning,
         |  CAST(FLOOR((CAST(n_turning AS DOUBLE)
         |      - 2.0 * (n_days - 2) / 3.0)
         |    / sqrt((16.0 * n_days - 29.0) / 90.0) * 1000000.0)
         |    AS BIGINT) AS z_fp
         |FROM agg WHERE n_days >= 4""".stripMargin,

    "dixon_q_outlier" ->
      s"""WITH $dailyDuck,
         |rn AS (SELECT x,
         |         CAST(row_number() OVER (ORDER BY x, di) AS BIGINT)
         |           AS rn
         |       FROM daily),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
         |pick AS (
         |  SELECT max(nn.n_days) AS n_days,
         |    min(CASE WHEN rn = 1 THEN x END) AS x_min,
         |    min(CASE WHEN rn = 2 THEN x END) AS x_min2,
         |    min(CASE WHEN rn = nn.n_days - 1 THEN x END) AS x_max2,
         |    min(CASE WHEN rn = nn.n_days THEN x END) AS x_max
         |  FROM rn CROSS JOIN nn)
         |SELECT n_days, x_min, x_min2, x_max2, x_max,
         |  CASE WHEN x_max > x_min
         |    THEN (x_min2 - x_min) * 1000000 // (x_max - x_min)
         |  ELSE NULL END AS q_min_fp,
         |  CASE WHEN x_max > x_min
         |    THEN (x_max - x_max2) * 1000000 // (x_max - x_min)
         |  ELSE NULL END AS q_max_fp
         |FROM pick WHERE n_days >= 3""".stripMargin,

    "bartlett_test_priority" ->
      """WITH g0 AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
        |         CAST(count(*) AS BIGINT) AS n_g,
        |         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |           AS HUGEINT)) AS sx,
        |         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |           AS HUGEINT)
        |           * CAST(round(o_totalprice * 100) AS BIGINT)) AS qx
        |  FROM orders GROUP BY 1),
        |g AS (
        |  SELECT sc, n_g,
        |         CAST(n_g AS HUGEINT) * qx - sx * sx AS v
        |  FROM g0),
        |gk AS (
        |  SELECT sc, n_g, v,
        |    CAST(FLOOR(ln(CAST(v AS DOUBLE)
        |      / (CAST(n_g AS DOUBLE) * (n_g - 1))) * 1000000000.0)
        |      AS BIGINT) AS lnv_fp,
        |    v * 1000000 // n_g AS w_fp
        |  FROM g WHERE n_g >= 2 AND v > 0),
        |m0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(n_g) AS BIGINT) AS n_tot,
        |         sum(w_fp) AS sw_fp,
        |         sum(CAST(n_g - 1 AS HUGEINT) * lnv_fp) AS sum_lnv,
        |         CAST(sum(1000000000 // (n_g - 1)) AS BIGINT) AS sum_h
        |  FROM gk),
        |m1 AS (
        |  SELECT *,
        |    CAST(FLOOR(ln(CAST(sw_fp AS DOUBLE)
        |      / (1000000.0 * (n_tot - k))) * 1000000000.0) AS BIGINT)
        |      AS lnp_fp
        |  FROM m0 WHERE k >= 2 AND n_tot > k),
        |m AS (
        |  SELECT k, n_tot, lnp_fp,
        |    CAST(n_tot - k AS HUGEINT) * lnp_fp - sum_lnv AS t_fp,
        |    1000000000 + (sum_h - 1000000000 // (n_tot - k))
        |      // (3 * (k - 1)) AS c_fp
        |  FROM m1)
        |SELECT gk.sc, gk.n_g, gk.lnv_fp, m.k, m.n_tot, m.lnp_fp,
        |  CAST(m.c_fp AS BIGINT) AS c_fp,
        |  CASE WHEN m.t_fp >= 0
        |    THEN CAST(m.t_fp * 1000000 // m.c_fp AS BIGINT)
        |    ELSE -CAST((-m.t_fp) * 1000000 // m.c_fp AS BIGINT) END
        |    AS chi2_fp
        |FROM gk CROSS JOIN m ORDER BY gk.sc""".stripMargin,

    "wilcoxon_signed_rank_daily" ->
      s"""WITH $dailyDuck,
         |rn AS (SELECT di, x,
         |         CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS rn
         |       FROM daily),
         |dif AS (
         |  SELECT b.x - a.x AS dv
         |  FROM rn a JOIN rn b ON b.rn = a.rn + 1
         |  WHERE b.x <> a.x),
         |sup AS (
         |  SELECT abs(dv) AS ad, CAST(count(*) AS BIGINT) AS c,
         |         CAST(sum(CASE WHEN dv > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS cpos
         |  FROM dif GROUP BY 1),
         |cum AS (
         |  SELECT *, CAST(sum(c) OVER (ORDER BY ad ROWS UNBOUNDED
         |    PRECEDING) AS BIGINT) AS cum
         |  FROM sup),
         |agg AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS n_diffs,
         |         CAST(sum(cpos * (2 * (cum - c) + c + 1)) AS BIGINT)
         |           AS w2_plus,
         |         CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS BIGINT)
         |           AS tt
         |  FROM cum)
         |SELECT n_diffs, w2_plus, tt AS tie_term,
         |  CASE WHEN 2.0 * n_diffs * (n_diffs + 1) * (2 * n_diffs + 1)
         |            - CAST(tt AS DOUBLE) > 0 THEN
         |    CAST(FLOOR((CAST(w2_plus AS DOUBLE)
         |        - CAST(n_diffs AS DOUBLE) * (n_diffs + 1) / 2.0)
         |      / sqrt((2.0 * n_diffs * (n_diffs + 1) * (2 * n_diffs + 1)
         |          - CAST(tt AS DOUBLE)) / 12.0) * 1000000.0) AS BIGINT)
         |  ELSE NULL END AS z_fp
         |FROM agg""".stripMargin,

    "page_hinkley_drift" ->
      s"""WITH $dailyDuck,
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(x) AS BIGINT) AS s_tot FROM daily),
         |mm AS (
         |  SELECT d.di, nn.n,
         |    CASE WHEN 2 * CAST(nn.n AS HUGEINT) * nn.s_tot
         |        < 9200000000000000000 THEN
         |      nn.n * CAST(sum(d.x) OVER (ORDER BY d.di
         |        ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |        - CAST(row_number() OVER (ORDER BY d.di) AS BIGINT)
         |          * nn.s_tot
         |    ELSE CAST(error('page_hinkley_drift: 2*n*S >= 9.2e18 '
         |      || 'exceeds the BIGINT envelope') AS BIGINT) END AS m
         |  FROM daily d CROSS JOIN nn),
         |ph AS (
         |  SELECT di AS day, n,
         |         m - min(m) OVER (ORDER BY di ROWS UNBOUNDED PRECEDING)
         |           AS ph
         |  FROM mm),
         |mx AS (SELECT max(ph) AS ph_max FROM ph)
         |SELECT max(ph.n) AS n_days, CAST(mx.ph_max AS BIGINT) AS ph_max,
         |       CAST(min(ph.day) AS BIGINT) AS alarm_day,
         |       CAST(CAST(mx.ph_max AS HUGEINT) * 1000000 // max(ph.n)
         |         AS BIGINT) AS ph_fp
         |FROM ph JOIN mx ON ph.ph = mx.ph_max
         |WHERE ph.n >= 2
         |GROUP BY mx.ph_max""".stripMargin,

    "variance_ratio_weekly" ->
      s"""WITH $dailyDuck,
         |pre AS (
         |  SELECT di, x,
         |    CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS rn,
         |    CAST(sum(x) OVER (ORDER BY di ROWS UNBOUNDED PRECEDING)
         |      AS BIGINT) AS pre
         |  FROM daily),
         |w AS (
         |  SELECT a.pre - COALESCE(b.pre, 0) AS w
         |  FROM pre a LEFT JOIN pre b ON b.rn = a.rn - 7
         |  WHERE a.rn >= 7),
         |mw AS (SELECT CAST(count(*) AS BIGINT) AS nw,
         |              CAST(sum(w) AS BIGINT) AS sw,
         |              sum(CAST(w AS HUGEINT) * w) AS qw FROM w),
         |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |              CAST(sum(x) AS BIGINT) AS sx,
         |              sum(CAST(x AS HUGEINT) * x) AS qx FROM daily),
         |v AS (
         |  SELECT n_days, sx, qx, nw, sw, qw,
         |    CAST(n_days AS HUGEINT) * qx - CAST(sx AS HUGEINT) * sx
         |      AS v1,
         |    CAST(nw AS HUGEINT) * qw - CAST(sw AS HUGEINT) * sw AS vw
         |  FROM m1 CROSS JOIN mw)
         |SELECT n_days, nw AS n_windows,
         |  CAST(FLOOR((CAST(vw AS DOUBLE)
         |      / (CAST(nw AS DOUBLE) * (nw - 1)))
         |    / (7.0 * CAST(v1 AS DOUBLE)
         |      / (CAST(n_days AS DOUBLE) * (n_days - 1)))
         |    * 1000000.0) AS BIGINT) AS vr_fp
         |FROM v WHERE n_days >= 9 AND nw >= 2 AND v1 > 0""".stripMargin,

    "von_neumann_ratio_daily" ->
      s"""WITH $dailyDuck,
         |rn AS (SELECT di, x,
         |         CAST(row_number() OVER (ORDER BY di) AS BIGINT) AS rn
         |       FROM daily),
         |d2 AS (
         |  SELECT sum(CAST(b.x - a.x AS HUGEINT) * (b.x - a.x)) AS sd2
         |  FROM rn a JOIN rn b ON b.rn = a.rn + 1),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
         |             CAST(sum(x) AS BIGINT) AS sx,
         |             sum(CAST(x AS HUGEINT) * x) AS qx FROM daily),
         |v AS (SELECT n_days, sd2,
         |        CAST(n_days AS HUGEINT) * qx
         |          - CAST(sx AS HUGEINT) * sx AS vn
         |      FROM m CROSS JOIN d2)
         |SELECT n_days,
         |  CAST(sd2 * n_days * n_days * 1000000
         |    // ((n_days - 1) * vn) AS BIGINT) AS eta_fp
         |FROM v WHERE n_days >= 3 AND vn > 0""".stripMargin,
  )
}
