package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier and resampling-inference operators (round-10
  * widening, second session): the 2D skyline (the classic "best
  * price-for-size" dominance query every catalog/marketplace serves)
  * and the leave-one-group-out jackknife (the cluster-robust standard
  * error an A/B readout quotes when observations within a nation/
  * cohort correlate). The reference's catalog tables
  * (`/root/reference/terraform/schemas/` price/size attributes)
  * are the natural skyline inputs.
  *
  * Determinism & scale design:
  *   - The skyline avoids BOTH the quadratic dominance self-join and a
  *     partition-less window: points first collapse to the DISTINCT
  *     price domain (map-side max-size per price), then the running
  *     "best size so far" is a TWO-PHASE prefix max — in-bucket window
  *     over price-bucket shards + a broadcast bucket-level non-equi
  *     join for the carry-in (the GlobalRank slicing idea, spelled
  *     with joins so no degenerate window task can exist). Strictness
  *     (ties neither dominate) is preserved exactly: a point survives
  *     iff its size beats every STRICTLY cheaper price's best.
  *   - The jackknife is closed-form over group sums: each
  *     leave-one-out mean is (S−s_g)/(n−n_g) in exact 1e-6 fixed
  *     point, so the whole estimator needs ONE group-sum pass (G tiny
  *     rows), and the variance folds deviations² through
  *     DECIMAL(38,0)/HUGEINT. No resampling pass over the data ever
  *     happens — the reason the jackknife (not the bootstrap) is the
  *     distributed-friendly interval.
  */
object ParetoStatOps extends OpGroup {

  /** Bucket width for the skyline's two-phase prefix max: price-cents
    * DIV 1e5 shards the distinct-price domain into ~dollar-hundred
    * buckets; the bucket-stats table (≤ price-range/1e5 rows) is the
    * only thing the non-equi carry-in join broadcasts.
    */
  private val SkyBucket = 100000L

  /** Theil-T within-group leaf (x/μ_g)·ln(x/μ_g) in 1e-9 fp, spelled
    * in pure doubles over exact ints (x·n_g/s_g) so no integer product
    * can overflow at any corpus size. One shared string.
    */
  private val theilLeafSql =
    """CAST(FLOOR(CAST(x AS DOUBLE) * n_g / s_g
      | * ln(CAST(x AS DOUBLE) * n_g / s_g)
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Theil between-group term (s_g/s)·ln(μ_g/μ) in 1e-9 fp. */
  private val theilBetweenSql =
    """CAST(FLOOR(CAST(s_g AS DOUBLE) / s_tot
      | * ln(CAST(s_g AS DOUBLE) * n_tot / (CAST(s_tot AS DOUBLE) * n_g))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Atkinson(ε=1) leaf: 1 − geomean/mean in 1e-6 fp, ONE shared IEEE
    * tree over the exact (lsum, n_g, sx) integers — the log-sum is
    * FLOOR'd per customer at 1e-9 then integer-summed, so the only
    * floating work is this terminal expression.
    */
  private val atkinsonSql =
    """CAST(1000000 - FLOOR(
      |  exp(CAST(lsum AS DOUBLE) / n_g / 1000000000.0)
      |  * n_g / CAST(sx AS DOUBLE) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Atkinson inequality index (r12, third session; Atkinson 1970,
    // ε=1): A = 1 − geomean/mean of customer revenue per nation — the
    // welfare-theoretic inequality read with an explicit aversion
    // parameter, completing the Gini/Theil family (at ε=1 it is the
    // exp-of-Theil-L transform, so it ALSO decomposes in logs).
    // Scale: per-customer ln leaves FLOOR'd at 1e-9 then
    // integer-summed (order-free); the report is |nations|-bounded;
    // AM ≥ GM guarantees A ∈ [0, 1) up to the leaf floor (which only
    // lowers the geomean, never above the mean).
    "atkinson_inequality" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation")), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
        .filter(col("x") > 0)
      cust.withColumn("lx",
          expr("CAST(FLOOR(ln(CAST(x AS DOUBLE)) * 1000000000.0) AS BIGINT)"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_g"), sum("x").as("sx"),
          sum("lx").as("lsum"))
        .withColumn("atkinson_fp", expr(atkinsonSql))
        .select("nation", "n_g", "sx", "lsum", "atkinson_fp")
        .orderBy("nation")
    }),

    // Theil-T inequality decomposition of customer revenue by nation
    // (r12, second session): T = Σ_g (S_g/S)·T_g + Σ_g (S_g/S)·ln(μ_g/μ)
    // — the inequality measure that decomposes ADDITIVELY into
    // within-nation and between-nation components (Theil 1967), the
    // question gini_revenue_inequality can't answer ("is the
    // concentration inside markets or across them?"). Scale: two
    // combinable aggregate levels (customer, nation); within leaves
    // FLOOR'd at the customer then integer-summed (the tiny negative
    // truncation residue is clamped identically on both engines);
    // the report is |nations|-bounded.
    "theil_inequality_decomp" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation")), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      val g = cust.groupBy("nation")
        .agg(count(lit(1)).as("n_g"), sum("x").as("s_g"))
      val leaves = cust.join(broadcast(g), "nation")
        .withColumn("leaf", expr(theilLeafSql))
        .groupBy("nation", "n_g", "s_g").agg(sum("leaf").as("sl"))
        .withColumn("t_within_fp", expr("greatest(sl, 0L) DIV n_g"))
      val tot = g.agg(sum("n_g").as("n_tot"), sum("s_g").as("s_tot"))
      leaves.crossJoin(broadcast(tot))
        .withColumn("w_within_fp", expr(
          """CAST(CAST(s_g AS DECIMAL(38,0)) * t_within_fp DIV s_tot
            | AS BIGINT)""".stripMargin.replace("\n", " ")))
        .withColumn("between_fp", expr(theilBetweenSql))
        .select(col("nation"), col("n_g").as("n_cust"),
          col("s_g").as("cents"), col("t_within_fp"), col("w_within_fp"),
          col("between_fp"))
        .orderBy("nation")
    }),

    // X67 (r14) — Lorenz asymmetry coefficient per nation (Damgaard &
    // Weiner 2000): S = F(μ) + L(μ) — the share of customers below the
    // mean plus the share of revenue they hold. Gini says HOW unequal;
    // LAC says WHERE the inequality lives (S < 1: driven by many small
    // customers; S > 1: by few giants) — the read that decides whether
    // a concentration risk is a long tail or a whale. Exactness: fully
    // integer — "below mean" is the denominator-cleared n·x < Σx
    // DECIMAL compare (no division), both shares are 1e6 fixed-point
    // truncating divisions; no IEEE anywhere. Convention pinned: the
    // step-function Lorenz definition (no interpolation term; ties at
    // the mean count as not-below) on BOTH engines. Scale: the same
    // two combinable aggregate levels as theil_inequality_decomp;
    // the report is |nations|-bounded.
    "lorenz_asymmetry_nation" -> ((s, d) => {
      val cust = Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation")), "o_custkey")
        .groupBy("nation", "o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      val g = cust.groupBy("nation")
        .agg(count(lit(1)).as("n_cust"), sum("x").as("total_cents"))
      cust.join(broadcast(g), "nation")
        .withColumn("below", expr(
          "CAST(n_cust AS DECIMAL(38,0)) * x < CAST(total_cents AS DECIMAL(38,0))"))
        .groupBy("nation", "n_cust", "total_cents")
        .agg(sum(when(col("below"), 1L).otherwise(0L)).as("m_below"),
          sum(when(col("below"), col("x")).otherwise(0L)).as("lm_cents"))
        .filter(col("total_cents") > 0)
        .select(col("nation"), col("n_cust"), col("total_cents"),
          col("m_below"), col("lm_cents"),
          expr("""m_below * 1000000 DIV n_cust
                 | + CAST(CAST(lm_cents AS DECIMAL(38,0)) * 1000000
                 |     DIV total_cents AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("lac_fp"))
        .orderBy("nation")
    }),

    // 2D skyline: parts minimizing retail price while maximizing size.
    // A part is ON the frontier iff no other part is both ≤ price and
    // ≥ size with one strict. Equal (price, size) ties all survive.
    "skyline_2d_pareto" -> ((s, d) => {
      val pts = Tables.part(s, d).select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
        col("p_size").cast("long").as("size"))
      val dom = pts.groupBy("price_cents").agg(max("size").as("smax"))
        .withColumn("pb", expr(s"price_cents DIV $SkyBucket"))
      val w = Window.partitionBy("pb").orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val inb = dom.withColumn("run_in_prev", max("smax").over(w))
      val bstats = dom.groupBy("pb").agg(max("smax").as("bmx"))
      val prior = bstats.as("a")
        .join(broadcast(bstats.as("b")), col("b.pb") < col("a.pb"), "left")
        .groupBy(col("a.pb").as("pb")).agg(max(col("b.bmx")).as("prior_mx"))
      val sky = inb.join(broadcast(prior), "pb")
        .withColumn("best_before",
          greatest(coalesce(col("run_in_prev"), lit(Long.MinValue)),
            coalesce(col("prior_mx"), lit(Long.MinValue))))
        .filter(col("smax") > col("best_before"))
        .select(col("price_cents").as("sk_price"), col("smax"))
      pts.join(broadcast(sky),
          col("price_cents") === col("sk_price") &&
            col("size") === col("smax"))
        .select(col("p_partkey"), col("price_cents"), col("size"))
        .orderBy("price_cents", "p_partkey")
    }),

    // Leave-one-nation-out jackknife of the mean customer balance:
    // per-nation LOO means in exact fixed point plus the jackknife
    // standard error of the grand mean as a constant column — the
    // cluster-robust uncertainty a per-geo rollout decision reads.
    "jackknife_loo_nation" -> ((s, d) => {
      val g = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nation"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_g"), sum("cents").as("s_g"))
      val tot = g.agg(count(lit(1)).as("gg"), sum("n_g").as("n"),
        sum("s_g").as("ss"))
      val loo = g.crossJoin(broadcast(tot))
        .withColumn("loo_mean_fp", expr("(ss - s_g) * 1000000 DIV (n - n_g)"))
      val jk = loo.agg(count(lit(1)).as("gg2"),
          sum(col("loo_mean_fp").cast("decimal(38,0)")).as("st"),
          sum(expr("CAST(loo_mean_fp AS DECIMAL(38,0)) * loo_mean_fp"))
            .as("stt"))
        // (G−1)/G · Σ(θ_g − θ̄)² = (G−1)/G · (Σθ² − (Σθ)²/G); kept as
        // the exact integer (G−1)·(G·Σθ² − (Σθ)²) DIV (G²·1e12),
        // reported in cents² — fp² units overflow int64 once the LOO
        // spread passes ~3e9 fp (≈ $30), which small fixtures hit
        .select(expr(
          """CAST((gg2 - 1) * (gg2 * stt - st * st)
            | DIV (CAST(gg2 AS DECIMAL(38,0)) * gg2 * gg2 * 1000000000000)
            | AS BIGINT)""".stripMargin).as("jk_var_cents2"))
      loo.crossJoin(broadcast(jk))
        .select("nation", "n_g", "loo_mean_fp", "jk_var_cents2")
        .orderBy("nation")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "atkinson_inequality" ->
      s"""WITH cust AS (
         |  SELECT c_nationkey AS nation, o_custkey,
         |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS x
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |lv AS (
         |  SELECT nation, x,
         |         CAST(FLOOR(ln(CAST(x AS DOUBLE)) * 1000000000.0)
         |           AS BIGINT) AS lx
         |  FROM cust WHERE x > 0),
         |g AS (
         |  SELECT CAST(nation AS BIGINT) AS nation,
         |         CAST(count(*) AS BIGINT) AS n_g,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(lx) AS BIGINT) AS lsum
         |  FROM lv GROUP BY 1)
         |SELECT nation, n_g, sx, lsum, $atkinsonSql AS atkinson_fp
         |FROM g ORDER BY nation""".stripMargin,

    "theil_inequality_decomp" ->
      s"""WITH cust AS (
         |  SELECT c_nationkey AS nation, o_custkey,
         |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS x
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
         |             CAST(sum(x) AS BIGINT) AS s_g
         |      FROM cust GROUP BY 1),
         |lv AS (
         |  SELECT cust.nation, n_g, s_g,
         |         CAST(sum($theilLeafSql) AS BIGINT) AS sl
         |  FROM cust JOIN g USING (nation) GROUP BY 1, 2, 3),
         |tw AS (SELECT *, greatest(sl, 0) // n_g AS t_within_fp FROM lv),
         |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_tot,
         |               CAST(sum(s_g) AS BIGINT) AS s_tot FROM g)
         |SELECT CAST(nation AS BIGINT) AS nation, n_g AS n_cust,
         |       s_g AS cents, CAST(t_within_fp AS BIGINT) AS t_within_fp,
         |       CAST(CAST(s_g AS HUGEINT) * t_within_fp // s_tot
         |         AS BIGINT) AS w_within_fp,
         |       $theilBetweenSql AS between_fp
         |FROM tw CROSS JOIN tot ORDER BY nation""".stripMargin,

    "lorenz_asymmetry_nation" ->
      """WITH cust AS (
        |  SELECT c_nationkey AS nation, o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
        |             CAST(sum(x) AS BIGINT) AS total_cents
        |      FROM cust GROUP BY 1),
        |b AS (
        |  SELECT cust.nation, n_cust, total_cents,
        |    CAST(sum(CASE WHEN CAST(n_cust AS HUGEINT) * x
        |                       < CAST(total_cents AS HUGEINT)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS m_below,
        |    CAST(sum(CASE WHEN CAST(n_cust AS HUGEINT) * x
        |                       < CAST(total_cents AS HUGEINT)
        |             THEN x ELSE 0 END) AS BIGINT) AS lm_cents
        |  FROM cust JOIN g USING (nation) GROUP BY 1, 2, 3)
        |SELECT CAST(nation AS BIGINT) AS nation, n_cust, total_cents,
        |       m_below, lm_cents,
        |       m_below * 1000000 // n_cust
        |         + CAST(CAST(lm_cents AS HUGEINT) * 1000000
        |             // total_cents AS BIGINT) AS lac_fp
        |FROM b WHERE total_cents > 0 ORDER BY nation""".stripMargin,

    "skyline_2d_pareto" ->
      """WITH pts AS (
        |  SELECT p_partkey,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |         CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |dom AS (SELECT price_cents, max(size) AS smax
        |        FROM pts GROUP BY price_cents),
        |r AS (
        |  SELECT price_cents, smax,
        |         max(smax) OVER (ORDER BY price_cents
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS best_before
        |  FROM dom),
        |sky AS (SELECT price_cents, smax FROM r
        |        WHERE best_before IS NULL OR smax > best_before)
        |SELECT p.p_partkey, p.price_cents, p.size
        |FROM pts p JOIN sky ON sky.price_cents = p.price_cents
        |               AND sky.smax = p.size
        |ORDER BY p.price_cents, p.p_partkey""".stripMargin,

    "jackknife_loo_nation" ->
      """WITH g AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(count(*) AS BIGINT) AS n_g,
        |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |           AS s_g
        |  FROM customer GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS gg,
        |               CAST(sum(n_g) AS BIGINT) AS n,
        |               CAST(sum(s_g) AS BIGINT) AS ss FROM g),
        |loo AS (
        |  -- trunc-div CASE: Spark's DIV truncates toward zero while //
        |  -- floors, and a negative-balance nation slice could flip signs
        |  SELECT nation, n_g,
        |         CASE WHEN (ss - s_g) < 0
        |              THEN -((-(ss - s_g)) * 1000000 // (n - n_g))
        |              ELSE (ss - s_g) * 1000000 // (n - n_g) END
        |           AS loo_mean_fp
        |  FROM g CROSS JOIN tot),
        |jk AS (
        |  SELECT CAST((count(*) - 1)
        |           * (count(*) * sum(CAST(loo_mean_fp AS HUGEINT) * loo_mean_fp)
        |              - sum(CAST(loo_mean_fp AS HUGEINT))
        |                * sum(CAST(loo_mean_fp AS HUGEINT)))
        |           // (CAST(count(*) AS HUGEINT) * count(*) * count(*)
        |              * 1000000000000)
        |           AS BIGINT) AS jk_var_cents2
        |  FROM loo)
        |SELECT nation, n_g, loo_mean_fp, jk_var_cents2
        |FROM loo CROSS JOIN jk ORDER BY nation""".stripMargin,
  )
}
