package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-governance and lifecycle operators (round-10 widening): the
  * release-management layer around a training-data pipeline —
  * re-identification risk audits before publishing a dataset, balanced
  * shard planning for the writer fleet, user-lifecycle survival curves,
  * and sequential behavior rules. The reference's pipeline ends by
  * publishing partitioned datasets to a warehouse
  * (`/root/reference/app.py:206-214` type-routed writes;
  * `/root/reference/terraform/main.tf:76-96` the published tables) —
  * these are the audits and plans a responsible publisher runs at that
  * boundary.
  *
  * Determinism & scale design:
  *   - All ratios are exact 1e-6 integer divisions; all log-domain
  *     values are FLOOR-fixed-pointed at the leaf over exact int64
  *     inputs then integer-summed (order-free at any layout).
  *   - Prefix sums (shard cut-points, survival at-risk ladders) route
  *     through [[graft.functions.GlobalRank.prefixSum]] — the sliced
  *     two-phase scheme — never a partition-less window.
  *   - Group state is domain-bounded: anonymity classes by the QI
  *     domain, shard stats by the shard count, survival rows by the
  *     duration-hour domain, rules by the event-type enum².
  */
object GovernanceOps extends OpGroup {

  /** 30-minute session gap (µs) — the sessionize_gap_batch convention. */
  private val GapUs = 1800000000L

  /** Kaplan–Meier per-death-time hazard log-term in 1e-6 fixed point;
    * NULL-armed separately for the terminal all-die row (survival 0).
    */
  private val kmTermSql =
    """CASE WHEN d > 0 AND d < n_risk
      | THEN CAST(FLOOR(ln(CAST(n_risk - d AS DOUBLE) / n_risk)
      |   * 1000000.0) AS BIGINT) ELSE 0 END"""
      .stripMargin.replace("\n", " ")

  /** Survival level exp(logS/1e6)·1e6, FLOOR'd, from an ALREADY
    * truncated integer log-cumulative — the breslowSql discipline, so
    * both engines exponentiate the same exact int.
    */
  private def expFpSql(x: String) =
    s"CAST(FLOOR(exp(CAST(($x) AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT)"

  /** Nelson–Aalen per-death-time hazard increment d/n in 1e-9 fp. */
  private val naTermSql =
    """CAST(FLOOR(CAST(d AS DOUBLE) / n_risk * 1000000000.0)
      | AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Breslow survival exp(−H) in 1e-6 fp from the already-truncated
    * cumulative hazard (so both engines exponentiate the same int).
    */
  private val breslowSql =
    """CAST(FLOOR(exp(-CAST(h_cum AS DOUBLE) / 1000000000.0)
      | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Log-rank per-death-time expected arm-1 deaths d·r1/r, 1e-6 fp. */
  private val lrETermSql =
    """CASE WHEN d0 + d1 > 0
      | THEN CAST(FLOOR(CAST(d0 + d1 AS DOUBLE) * r1 / rt
      |   * 1000000.0) AS BIGINT) ELSE 0 END"""
      .stripMargin.replace("\n", " ")

  /** Log-rank per-death-time hypergeometric variance term, 1e-6 fp:
    * d·(r1/r)·(1−r1/r)·(r−d)/(r−1), zero-armed at r ≤ 1.
    */
  private val lrVTermSql =
    """CASE WHEN d0 + d1 > 0 AND rt > 1
      | THEN CAST(FLOOR(CAST(d0 + d1 AS DOUBLE) * r1 / rt
      |   * (1.0 - CAST(r1 AS DOUBLE) / rt)
      |   * (rt - (d0 + d1)) / (rt - 1) * 1000000.0) AS BIGINT)
      | ELSE 0 END""".stripMargin.replace("\n", " ")

  /** χ² = (O1 − E1)²/V from the exact O1 and truncated E1/V fps. */
  private val lrChi2Sql =
    """CAST(FLOOR((CAST(o1 AS DOUBLE) - e1 / 1000000.0)
      | * (CAST(o1 AS DOUBLE) - e1 / 1000000.0)
      | / (v1 / 1000000.0) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  /** Entropy term −p·ln p at one (QI-group, sensitive-value) cell,
    * 1e-9 fp, from exact counts: (cs/n)·ln(n/cs). One shared string.
    */
  private val entTermSql =
    """CAST(FLOOR(CAST(cs AS DOUBLE) / n * ln(CAST(n AS DOUBLE) / cs)
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** l-diversity floor, and ln(LMin)·1e9 as the Scala-computed integer
    * both engines compare the floor'd entropy against (interpolated as
    * a literal so the threshold is one shared constant).
    */
  private val LMin = 3L
  private val HMinFp: Long = math.floor(math.log(LMin.toDouble) * 1e9).toLong

  /** t-closeness ceiling (total variation ≤ 0.2), 1e-6 fp. */
  private val TMaxFp = 200000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // l-diversity audit (r12): the step AFTER k-anonymity — a QI class
    // can be large (k-safe) yet publish everyone's sensitive attribute
    // if all members share one value. QI = (nation, balance band);
    // sensitive = market segment. Per class: distinct-l and entropy
    // l-diversity (Machanavajjhala et al. 2007), flagged at l < 3 and
    // H < ln 3. Scale: one map-side (QI × sensitive) cell count (state
    // = the QI×sensitive domain), class totals broadcast back, entropy
    // terms FLOOR'd at the leaf then integer-summed (order-free); the
    // report is QI-domain-bounded.
    "l_diversity_audit" -> ((s, d) => {
      val cell = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk"),
          expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("band"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("cs"))
      val grp = cell.groupBy("nk", "band")
        .agg(sum("cs").as("n"), count(lit(1)).as("l_distinct"))
      cell.join(broadcast(grp), Seq("nk", "band"))
        .withColumn("term_fp", expr(entTermSql))
        .groupBy("nk", "band", "n", "l_distinct")
        .agg(sum("term_fp").as("h_fp"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          "nk")
        .withColumn("l_ok", expr(
          s"CAST(CASE WHEN l_distinct >= $LMin THEN 1 ELSE 0 END AS BIGINT)"))
        .withColumn("entropy_ok", expr(
          s"CAST(CASE WHEN h_fp >= $HMinFp THEN 1 ELSE 0 END AS BIGINT)"))
        .select("nation", "band", "n", "l_distinct", "h_fp", "l_ok",
          "entropy_ok")
        .orderBy("nation", "band")
    }),

    // t-closeness audit (r12, third session; Li et al. 2007): the
    // third leg of the privacy triad — k_anonymity bounds class SIZE,
    // l_diversity bounds sensitive-value VARIETY, t-closeness bounds
    // how far a class's sensitive DISTRIBUTION drifts from the
    // global one (a class can be large and diverse yet still leak
    // "this class skews AUTOMOBILE"). Nominal sensitive attribute ⇒
    // the distance is total variation: t_g = ½ Σ_v |p_g(v) − p(v)|,
    // kept EXACT by clearing denominators — Σ_v |N·cs_g(v) − n_g·c(v)|
    // over the FULL segment domain (zero cells contribute their
    // global mass — the chi2 full-grid discipline), then ONE fp
    // division by 2·n_g·N. Products lift to DECIMAL(38,0)/HUGEINT.
    // State is QI-domain × |segments| bounded; the corpus pass is the
    // same one map-side cell count l_diversity runs.
    "t_closeness_audit" -> ((s, d) => {
      val cell = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk"),
          expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("band"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("cs"))
      val grp = cell.groupBy("nk", "band").agg(sum("cs").as("n"))
      val segTot = cell.groupBy("seg").agg(sum("cs").as("cv"))
      val nTot = cell.agg(sum("cs").as("nn"))
      val grid = grp.crossJoin(broadcast(segTot))
        .join(cell, Seq("nk", "band", "seg"), "left")
        .withColumn("cs", coalesce(col("cs"), lit(0L)))
        .crossJoin(broadcast(nTot))
        .withColumn("dev", expr(
          """abs(CAST(nn AS DECIMAL(38,0)) * cs
            | - CAST(n AS DECIMAL(38,0)) * cv)"""
            .stripMargin.replace("\n", " ")))
      grid.groupBy("nk", "band", "n", "nn")
        .agg(sum("dev").as("devsum"))
        .withColumn("t_fp", expr(
          """CAST(devsum * 1000000
            | DIV (2 * CAST(n AS DECIMAL(38,0)) * nn) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .withColumn("t_ok", expr(
          s"CAST(CASE WHEN t_fp <= $TMaxFp THEN 1 ELSE 0 END AS BIGINT)"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          "nk")
        .select("nation", "band", "n", "t_fp", "t_ok")
        .orderBy("nation", "band")
    }),

    // Z1 — k-anonymity audit over quasi-identifiers (nation, market
    // segment, account-balance band): the re-identification risk report
    // run before any dataset leaves the pipeline. One map-side
    // equivalence-class count (state = the QI domain), one 4-bucket
    // rollup; classes of size < 5 are the publishable-risk surface.
    "k_anonymity_audit" -> ((s, d) => {
      val qi = Tables.customer(s, d).select(col("c_nationkey"),
        col("c_mktsegment"),
        expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("bal_band"))
      val cls = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(count(lit(1)).as("k"))
      cls.withColumn("k_bucket", expr(
          """CASE WHEN k = 1 THEN '1' WHEN k <= 4 THEN '2-4'
            |     WHEN k <= 9 THEN '5-9' ELSE '10+' END"""
            .stripMargin.replace("\n", " ")))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n_classes"), sum("k").as("n_rows"))
        .withColumn("at_risk", expr("k_bucket IN ('1', '2-4')"))
        .orderBy("k_bucket")
    }),

    // Z2 — balanced shard planner: cut the doc_id-ordered corpus into 8
    // contiguous shards of ~equal BYTES by the exclusive running char
    // count — the shard-writer plan that keeps one output file from
    // being 100× another. The prefix sum is GlobalRank's two-phase
    // scheme; the shard id is a pure function of (exclusive-cum, total)
    // so every row routes identically on any layout; per-shard stats
    // are shard-cardinality-sized.
    "shard_balance_planner" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val tot = docs.agg(sum("n_chars").as("total"))
      graft.functions.GlobalRank
        .prefixSum(docs, "cum", col("n_chars"), Nil, Seq("doc_id"))
        .crossJoin(broadcast(tot))
        .withColumn("shard_id",
          expr("CAST((cum - n_chars) * 8 DIV total AS BIGINT)"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("shard_chars"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
          max("total").as("total"))
        .withColumn("share_fp", expr("shard_chars * 1000000 DIV total"))
        .drop("total")
        .orderBy("shard_id")
    }),

    // Z3 — Kaplan–Meier survival of user lifetime (first → last event,
    // hours), right-censored at 24 hours of trailing inactivity: the
    // user-lifecycle curve behind every retention forecast. The event
    // stream collapses to per-user (first, last) map-side; per-hour
    // death/censor counts are the ONLY shuffled state (duration-domain-
    // bounded); the at-risk ladder and the log-survival product are two
    // GlobalRank prefix sums over that support; each hazard ln() is
    // FLOOR-fixed-pointed at the leaf. The terminal all-die row (S=0)
    // emits NULL — ln(0) has no fixed-point form and both engines arm
    // the same CASE.
    "kaplan_meier_survival" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        .groupBy("user_id")
        .agg(min("us").as("first_us"), max("us").as("last_us"))
      val mx = u.agg(max("last_us").as("max_us"))
      val uu = u.crossJoin(broadcast(mx))
        .select(expr("(last_us - first_us) DIV 3600000000").as("t_hours"),
          expr("max_us - last_us > 86400000000").as("churned"))
      val perT = uu.groupBy("t_hours").agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("cns"))
      val n = uu.agg(count(lit(1)).as("n_users"))
      val risk = graft.functions.GlobalRank
        .prefixSum(perT, "cum_all", col("d") + col("cns"), Nil, Seq("t_hours"))
        .crossJoin(broadcast(n))
        .withColumn("n_risk", expr("n_users - (cum_all - d - cns)"))
        .withColumn("term", expr(kmTermSql))
      graft.functions.GlobalRank
        .prefixSum(risk, "log_s0", col("term"), Nil, Seq("t_hours"))
        .filter(col("d") > 0)
        .select(col("t_hours"), col("n_risk"), col("d").as("n_deaths"),
          expr("CASE WHEN d = n_risk THEN NULL ELSE log_s0 END")
            .as("log_s_fp"))
        .orderBy("t_hours")
    }),

    // Restricted mean survival time (r12, fourth session; Royston &
    // Parmar 2013): the single-number summary of the Z3 curve —
    // expected user lifetime truncated at τ = the rank-defined P75
    // death time (the horizon where the median-obsessed reads stop
    // but a retention budget still accrues). RMST(τ) = ∫₀^τ S(t)dt is
    // computed WITHOUT an interval lead: each KM step's survival drop
    // removes (τ − t_i) hours of area, so RMST·1e6 = τ·1e6 −
    // Σ_{t_i<τ} drop_i·(τ−t_i) — a pure per-row integer sum over the
    // duration-domain-bounded step table (no partition-less window,
    // no successor join). Survival levels come from the SAME truncated
    // log-cumulative the KM query emits: s_prev = exp-floor(logS −
    // term), s_cur = exp-floor(logS) (the breslowSql discipline — exp
    // runs on already-truncated integers, so both engines agree
    // bit-for-bit); τ is the smallest death time with cum-deaths ≥
    // ⌈3D/4⌉, from the same prefix-sum pass. Envelope: drop ≤ 1e6,
    // (τ−t) is calendar-bounded ⇒ the sum stays far inside int64.
    "rmst_survival" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        .groupBy("user_id")
        .agg(min("us").as("first_us"), max("us").as("last_us"))
      val mx = u.agg(max("last_us").as("max_us"))
      val uu = u.crossJoin(broadcast(mx))
        .select(expr("(last_us - first_us) DIV 3600000000").as("t_hours"),
          expr("max_us - last_us > 86400000000").as("churned"))
      val perT = uu.groupBy("t_hours").agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("cns"))
      val n = uu.agg(count(lit(1)).as("n_users"))
      val risk = graft.functions.GlobalRank
        .prefixSum(perT, "cum_all", col("d") + col("cns"), Nil,
          Seq("t_hours"))
        .crossJoin(broadcast(n))
        .withColumn("n_risk", expr("n_users - (cum_all - d - cns)"))
        .withColumn("term", expr(kmTermSql))
      val sv = graft.functions.GlobalRank
        .prefixSum(risk, "log_s0", col("term"), Nil, Seq("t_hours"))
        .filter(col("d") > 0)
        .withColumn("s_prev_fp", expr(expFpSql("log_s0 - term")))
        .withColumn("s_cur_fp",
          expr(s"CASE WHEN d = n_risk THEN 0 ELSE ${expFpSql("log_s0")} END"))
        .withColumn("drop_fp", col("s_prev_fp") - col("s_cur_fp"))
      val cum = graft.functions.GlobalRank
        .prefixSum(sv, "cum_d", col("d"), Nil, Seq("t_hours"))
      val dt = sv.agg(sum("d").as("d_total"))
      val tau = cum.crossJoin(broadcast(dt))
        .filter(expr("cum_d * 4 >= d_total * 3"))
        .agg(min("t_hours").as("tau_hours"))
      cum.crossJoin(broadcast(tau)).crossJoin(broadcast(dt))
        .withColumn("loss_fp", expr(
          "CASE WHEN t_hours < tau_hours THEN drop_fp * (tau_hours - t_hours) ELSE 0 END"))
        .groupBy("tau_hours", "d_total")
        .agg(count(lit(1)).as("n_steps"), sum("loss_fp").as("lf"))
        .select(col("tau_hours"), col("d_total"), col("n_steps"),
          expr("tau_hours * 1000000 - lf").as("rmst_fp"))
    }),

    // Nelson–Aalen cumulative hazard (r12, second session): the
    // non-parametric H(t) = Σ d/n companion to kaplan_meier_survival
    // over the SAME user-lifetime ladder (Aalen 1978) — the estimator
    // of choice when hazards, not survival curves, drive the decision
    // (and Breslow's S̃ = exp(−H) cross-checks KM). Identical scale
    // shape to Z3: per-user (first, last) map-side, duration-domain-
    // bounded per-hour counts, two GlobalRank prefix sums; the hazard
    // leaf d/n is FLOOR'd then integer-summed, and exp runs on the
    // truncated cumulative so both engines agree bit-for-bit.
    "nelson_aalen_hazard" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        .groupBy("user_id")
        .agg(min("us").as("first_us"), max("us").as("last_us"))
      val mx = u.agg(max("last_us").as("max_us"))
      val uu = u.crossJoin(broadcast(mx))
        .select(expr("(last_us - first_us) DIV 3600000000").as("t_hours"),
          expr("max_us - last_us > 86400000000").as("churned"))
      val perT = uu.groupBy("t_hours").agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("cns"))
      val n = uu.agg(count(lit(1)).as("n_users"))
      val risk = graft.functions.GlobalRank
        .prefixSum(perT, "cum_all", col("d") + col("cns"), Nil,
          Seq("t_hours"))
        .crossJoin(broadcast(n))
        .withColumn("n_risk", expr("n_users - (cum_all - d - cns)"))
        .withColumn("term", expr(naTermSql))
      graft.functions.GlobalRank
        .prefixSum(risk, "h_cum", col("term"), Nil, Seq("t_hours"))
        .filter(col("d") > 0)
        .select(col("t_hours"), col("n_risk"), col("d").as("n_deaths"),
          col("h_cum").as("h_cum_fp"), expr(breslowSql).as("s_breslow_fp"))
        .orderBy("t_hours")
    }),

    // Log-rank test between hash-split user cohorts (r12, second
    // session): the Mantel–Cox two-sample comparison of the
    // kaplan_meier/nelson_aalen lifetime curves — O₁ vs E₁ deaths with
    // the hypergeometric variance at each death time (Mantel 1966),
    // the test every retention experiment reads before claiming "arm B
    // churns slower". Arms are the md5-bit split (ab_srm_check's
    // convention — an A/A test here, so χ² should be unremarkable,
    // which the spec pins). Same duration-domain ladder as Z3: the
    // only corpus pass is the per-user (first, last) aggregate; the
    // support carries 4 conditional counts, two GlobalRank prefix
    // sums build both at-risk ladders, E/V leaves are FLOOR'd IEEE
    // over exact integers, and the report is ONE row.
    "logrank_test_arms" -> ((s, d) => {
      val u = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        .groupBy("user_id")
        .agg(min("us").as("first_us"), max("us").as("last_us"))
        .withColumn("arm", expr(
          """CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8),
            | 16, 10) AS BIGINT) % 2""".stripMargin.replace("\n", " ")))
      val mx = u.agg(max("last_us").as("max_us"))
      val uu = u.crossJoin(broadcast(mx))
        .select(expr("(last_us - first_us) DIV 3600000000").as("t_hours"),
          expr("max_us - last_us > 86400000000").as("churned"), col("arm"))
      val perT = uu.groupBy("t_hours").agg(
        sum(when(col("arm") === 0 && col("churned"), 1L).otherwise(0L))
          .as("d0"),
        sum(when(col("arm") === 0 && !col("churned"), 1L).otherwise(0L))
          .as("c0"),
        sum(when(col("arm") === 1 && col("churned"), 1L).otherwise(0L))
          .as("d1"),
        sum(when(col("arm") === 1 && !col("churned"), 1L).otherwise(0L))
          .as("c1"))
      val ns = uu.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
      val lad0 = graft.functions.GlobalRank
        .prefixSum(perT, "cum0", col("d0") + col("c0"), Nil, Seq("t_hours"))
      val lad = graft.functions.GlobalRank
        .prefixSum(lad0, "cum1", col("d1") + col("c1"), Nil, Seq("t_hours"))
        .crossJoin(broadcast(ns))
        .withColumn("r0", expr("n0 - (cum0 - d0 - c0)"))
        .withColumn("r1", expr("n1 - (cum1 - d1 - c1)"))
        .withColumn("rt", expr("r0 + r1"))
      lad.agg(sum("d1").as("o1"), sum(expr(lrETermSql)).as("e1"),
          sum(expr(lrVTermSql)).as("v1"),
          max("n0").as("n0"), max("n1").as("n1"))
        .select(col("n0"), col("n1"), col("o1"),
          col("e1").as("e1_fp"), col("v1").as("v1_fp"),
          expr(lrChi2Sql).as("chi2_fp"))
    }),

    // Z5 — the EVENTS-domain consumer composite (Q5's twin over the
    // behavioral stream): sessionize (30-min gap) → engagement gate
    // (≥3 events) → in-session ordered funnel (view → click →
    // purchase, V2's chained conditional-min shape but WITHIN session)
    // → per-entry-type scorecard (sessions, gated, converted, exact
    // conversion rate + mean gated duration). ONE query, every stage
    // reusing the standalone operator's plan shape; the only
    // corpus-bytes exchange is the sessionize window's user shuffle —
    // the gate, funnel, and scorecard all ride the same partitioning,
    // and the output is entry-type-cardinality rows.
    "engagement_pipeline_e2e" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull.or(col("us") - col("prev_us") > GapUs),
            1L).otherwise(0L))
        .withColumn("session_idx", sum("new_sess")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      val w = Window.partitionBy("user_id", "session_idx")
      val wOrd = w.orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val staged = sess
        .withColumn("entry_type", first("event_type").over(wOrd))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("us"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click"
          && col("us") > col("t1"), col("us"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase"
          && col("us") > col("t2"), col("us"))).over(w))
      val perSess = staged.groupBy("user_id", "session_idx")
        .agg(min("entry_type").as("entry_type"),
          count(lit(1)).as("n_events"),
          (max("us") - min("us")).as("dur_us"),
          max(col("t3").isNotNull.cast("long")).as("converted"))
      perSess.groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") >= 3, 1L).otherwise(0L)).as("n_gated"),
          sum(when(col("n_events") >= 3 && col("converted") === 1L, 1L)
            .otherwise(0L)).as("n_converted"),
          sum(when(col("n_events") >= 3, col("dur_us")).otherwise(0L))
            .as("gated_dur_us"))
        .select(col("entry_type"), col("n_sessions"), col("n_gated"),
          col("n_converted"),
          expr("""CASE WHEN n_gated = 0 THEN NULL
                  ELSE n_converted * 1000000 DIV n_gated END""")
            .as("conv_fp"),
          expr("""CASE WHEN n_gated = 0 THEN NULL
                  ELSE gated_dur_us DIV n_gated END""")
            .as("mean_gated_dur_us"))
        .orderBy("entry_type")
    }),

    // Z4 — sequential pattern rules A→B inside 30-minute sessions:
    // "sessions that view later purchase" association mining with
    // order. Sessions derive from the sessionize_gap_batch gap logic;
    // each session collapses to its DISTINCT event types ordered by
    // first occurrence (≤ |enum| entries), pairs by per-session ARRAY
    // EXPANSION (≤ C(|enum|,2) — never events²); support/confidence
    // are exact 1e-6 divisions against broadcast denominators.
    "session_sequence_rules" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val flagged = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull.or(col("us") - col("prev_us") > GapUs),
            1L).otherwise(0L))
        .withColumn("session_idx", sum("new_sess")
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      val stypes = flagged
        .groupBy("user_id", "session_idx", "event_type")
        .agg(min("us").as("first_us"))
      val nSess = stypes.select("user_id", "session_idx").distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val anteS = stypes.groupBy("event_type")
        .agg(count(lit(1)).as("ante_sessions"))
        .withColumnRenamed("event_type", "antecedent")
      val pairs = stypes
        .groupBy("user_id", "session_idx")
        .agg(sort_array(collect_list(
          struct(col("first_us"), col("event_type")))).as("a"))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          """flatten(transform(sequence(0, size(a) - 2), i ->
            |  transform(sequence(i + 1, size(a) - 1), j ->
            |    named_struct('antecedent', a[i].event_type,
            |                 'consequent', a[j].event_type))))"""
            .stripMargin.replace("\n", " "))).as("p"))
        .select(col("p.antecedent").as("antecedent"),
          col("p.consequent").as("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(count(lit(1)).as("pair_sessions"))
      pairs.join(broadcast(anteS), Seq("antecedent"))
        .crossJoin(broadcast(nSess))
        .select(col("antecedent"), col("consequent"), col("pair_sessions"),
          expr("pair_sessions * 1000000 DIV n_sessions").as("support_fp"),
          expr("pair_sessions * 1000000 DIV ante_sessions")
            .as("confidence_fp"))
        .orderBy(col("pair_sessions").desc, col("antecedent"),
          col("consequent"))
        .limit(15)
    }),

    // Z16 (r15) — Laplace-count-release MECHANISM EXHIBIT (Dwork,
    // McSherry, Nissim & Smith 2006): per-source document counts with
    // Laplace(1/ε)-distributed perturbation at ε ∈ {0.1, 1} (count
    // sensitivity = 1 ⇒ scale b = 1/ε).
    //
    // ⚠ NOT DIFFERENTIALLY PRIVATE AS RELEASED (ADVICE r15): the
    // perturbation is a deterministic PUBLIC function of (source,
    // eps_label) via md5 with no secret seed, so anyone can recompute
    // noise_fp and subtract it from released_fp to recover the exact
    // count — effective ε = ∞. The determinism is deliberate and is
    // the point of the exhibit: it makes the MECHANISM (inverse-CDF
    // Laplace sampling, fixed-point release, the 99.5% tail-bound
    // verdict) bit-replayable on both engines, which a secret-seeded
    // release could never be. A real publish boundary MUST swap the
    // md5 uniform for one keyed by a secret per-release seed (losing
    // cross-engine bit-parity for this one leaf and with it the DuckDB
    // value oracle — the exact trade this exhibit declines). SURVEY §2
    // row Z16 carries the same warning.
    //
    // The deterministic uniform (the mixture_weighted_resample
    // discipline) is: u = (h+½)/2²⁴
    // from the first 6 md5 nibbles of 'dp|source|eps', then
    // x = −b·sgn(u−½)·ln(1−2|u−½|), with 1−2|u−½| the exact rational
    // (2²⁴−|2h+1−2²⁴|)/2²⁴ so the single ln leaf sees identical
    // doubles. released_fp = n·1e6 + noise_fp is pure integer once
    // the leaf lands. within_995 pins the Laplace tail bound
    // |x| ≤ b·ln 200 (P = 0.5%) — the utility contract a consumer
    // checks. Scale: ONE map-side count; the release grid is
    // |sources|×2 rows.
    "dp_laplace_count_release" -> ((s, d) => {
      val n = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_true"))
      val grid = n.sparkSession.range(0, 1).selectExpr(
        """stack(2, 'eps_0.1', CAST(10 AS BIGINT),
          |         'eps_1.0', CAST(1 AS BIGINT))
          | AS (eps_label, b)""".stripMargin.replace("\n", " "))
      n.crossJoin(broadcast(grid))
        .withColumn("h", expr(
          """CAST(conv(substring(md5(concat('dp|', source, '|',
            | eps_label)), 1, 6), 16, 10) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .withColumn("x2", expr("2 * h + 1 - 16777216"))
        .withColumn("a", abs(col("x2")))
        .withColumn("noise_fp", expr(
          """CAST(FLOOR(-CAST(b AS DOUBLE)
            | * (CASE WHEN x2 >= 0 THEN 1.0 ELSE -1.0 END)
            | * ln((16777216.0 - a) / 16777216.0)
            | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")))
        .select(col("source"), col("eps_label"), col("b"), col("n_true"),
          col("noise_fp"),
          expr("n_true * 1000000 + noise_fp").as("released_fp"),
          expr("""abs(noise_fp) <= CAST(FLOOR(CAST(b AS DOUBLE)
                 | * ln(200.0) * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("within_995"))
        .orderBy("source", "eps_label")
    }),

    // Z17 (r15, widened r16) — right-to-erasure audit: the GDPR
    // Art. 17 check a publisher runs after a delete batch — every key
    // in the CDC delete set (the incremental-maintenance families'
    // shared rules: doc_id % 10 = 7, vec_id % 10 = 7, and the media
    // rule (doc_id DIV 25) % 10 = 7 over the doc_id % 25 = 0 media
    // sample) must be ABSENT from every maintained serving layout,
    // not just the primary table. Audits all SIX maintained layouts
    // (r16 added the last two rebuild-only ones): the MinHash
    // signature layout, the BM25 postings and doc-length sidecar, the
    // IVF/PQ serving rows, the media pHash signature layout, and the
    // kNN-graph edge layout (probed at BOTH endpoints — a stale edge
    // pointing AT a deleted vector is still a leak). Each row reads
    // (layout, n_deleted_keys, n_residual, clean) and every clean
    // must be TRUE; a single residual row is a compliance leak the
    // erasure pipeline missed. Scale: each probe is a broadcast
    // semi-join of the batch-sized delete key set against a layout
    // scan (key-partitioned layouts ⇒ partition-pruned reads); output
    // is 6 rows.
    "right_to_erasure_audit" -> ((s, d) => {
      val delDocs = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 7).select("doc_id")
      val delVecs = Tables.embeddings(s, d)
        .filter(col("vec_id") % 10 === 7).select("vec_id")
      val delMedia = Tables.documents(s, d)
        .filter(col("doc_id") % 25 === 0 &&
          expr("(doc_id DIV 25) % 10") === 7)
        .select("doc_id")
      def row(name: String, layout: DataFrame, keyCol: String,
          del: DataFrame): DataFrame = {
        val delK = del.withColumnRenamed(del.columns.head, keyCol)
        del.agg(count(lit(1)).as("n_deleted_keys"))
          .crossJoin(broadcast(
            layout.join(broadcast(delK), Seq(keyCol), "left_semi")
              .agg(count(lit(1)).as("n_residual"))))
          .select(lit(name).as("layout"), col("n_deleted_keys"),
            col("n_residual"), (col("n_residual") === 0).as("clean"))
      }
      row("1_minhash_signatures",
          s.read.parquet(IncrementalMaintainOps.incLayout(s, d)),
          "doc_id", delDocs)
        .unionByName(row("2_bm25_postings",
          s.read.parquet(IncrementalBm25Ops.incIndex(s, d)),
          "doc_id", delDocs))
        .unionByName(row("3_bm25_doclen",
          s.read.parquet(s"${IncrementalBm25Ops.incIndex(s, d)}.dl"),
          "doc_id", delDocs))
        .unionByName(row("4_ivf_serving",
          s.read.parquet(IncrementalIvfOps.incServing(s, d))
            .select("vec_id"), "vec_id", delVecs))
        .unionByName(row("5_phash_signatures",
          s.read.parquet(IncrementalPhashOps.incLayout(s, d)),
          "doc_id", delMedia))
        .unionByName(row("6_knn_edges",
          s.read.parquet(IncrementalKnnOps.incEdges(s, d))
            .select(explode(array(col("src"), col("dst"))).as("vec_id")),
          "vec_id", delVecs))
        .orderBy("layout")
    }),
  )

  // `def`: the erasure oracle embeds session-materialized layout paths
  def oracleSql: Map[String, String] = Map(
    "t_closeness_audit" ->
      s"""WITH cell AS (
         |  SELECT c_nationkey AS nk,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
         |         c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cs
         |  FROM customer GROUP BY 1, 2, 3),
         |grp AS (SELECT nk, band, CAST(sum(cs) AS BIGINT) AS n
         |        FROM cell GROUP BY 1, 2),
         |segtot AS (SELECT seg, CAST(sum(cs) AS BIGINT) AS cv
         |           FROM cell GROUP BY 1),
         |ntot AS (SELECT CAST(sum(cs) AS BIGINT) AS nn FROM cell),
         |grid AS (
         |  SELECT g.nk, g.band, g.n, t.nn,
         |         abs(CAST(t.nn AS HUGEINT) * COALESCE(c.cs, 0)
         |           - CAST(g.n AS HUGEINT) * s.cv) AS dev
         |  FROM grp g CROSS JOIN segtot s CROSS JOIN ntot t
         |  LEFT JOIN cell c ON c.nk = g.nk AND c.band = g.band
         |                  AND c.seg = s.seg),
         |tv AS (
         |  SELECT nk, band, n,
         |         CAST(sum(dev) * 1000000
         |           // (2 * CAST(n AS HUGEINT) * nn) AS BIGINT) AS t_fp
         |  FROM grid GROUP BY 1, 2, 3, nn)
         |SELECT n_name AS nation, band, n, t_fp,
         |       CAST(CASE WHEN t_fp <= $TMaxFp THEN 1 ELSE 0 END
         |         AS BIGINT) AS t_ok
         |FROM tv JOIN nation ON n_nationkey = tv.nk
         |ORDER BY nation, band""".stripMargin,

    "l_diversity_audit" ->
      s"""WITH cell AS (
         |  SELECT c_nationkey AS nk,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS band,
         |         c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cs
         |  FROM customer GROUP BY 1, 2, 3),
         |grp AS (SELECT nk, band, CAST(sum(cs) AS BIGINT) AS n,
         |               CAST(count(*) AS BIGINT) AS l_distinct
         |        FROM cell GROUP BY 1, 2),
         |h AS (
         |  SELECT cell.nk, cell.band, n, l_distinct,
         |         CAST(sum($entTermSql) AS BIGINT) AS h_fp
         |  FROM cell JOIN grp USING (nk, band)
         |  GROUP BY 1, 2, 3, 4)
         |SELECT n_name AS nation, band, n, l_distinct, h_fp,
         |       CAST(CASE WHEN l_distinct >= $LMin THEN 1 ELSE 0 END
         |         AS BIGINT) AS l_ok,
         |       CAST(CASE WHEN h_fp >= $HMinFp THEN 1 ELSE 0 END
         |         AS BIGINT) AS entropy_ok
         |FROM h JOIN nation ON n_nationkey = h.nk
         |ORDER BY nation, band""".stripMargin,

    "k_anonymity_audit" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |         count(*) AS k
        |  FROM customer GROUP BY 1, 2, 3),
        |buck AS (
        |  SELECT CASE WHEN k = 1 THEN '1' WHEN k <= 4 THEN '2-4'
        |              WHEN k <= 9 THEN '5-9' ELSE '10+' END AS k_bucket,
        |         k
        |  FROM cls)
        |SELECT k_bucket, CAST(count(*) AS BIGINT) AS n_classes,
        |       CAST(sum(k) AS BIGINT) AS n_rows,
        |       k_bucket IN ('1', '2-4') AS at_risk
        |FROM buck GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,

    "shard_balance_planner" ->
      """WITH cum AS (
        |  SELECT doc_id, n_chars,
        |         sum(n_chars) OVER (ORDER BY doc_id) AS cum
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents),
        |sh AS (
        |  SELECT CAST((cum - n_chars) * 8 // total AS BIGINT) AS shard_id,
        |         doc_id, n_chars, total
        |  FROM cum CROSS JOIN tot)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS shard_chars,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |       CAST(CAST(sum(n_chars) AS BIGINT) * 1000000 // max(total)
        |         AS BIGINT) AS share_fp
        |FROM sh GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    "kaplan_meier_survival" ->
      s"""WITH u AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us,
         |         max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |mx AS (SELECT max(last_us) AS max_us FROM u),
         |uu AS (
         |  SELECT (last_us - first_us) // 3600000000 AS t_hours,
         |         max_us - last_us > 86400000000 AS churned
         |  FROM u CROSS JOIN mx),
         |pert AS (
         |  SELECT t_hours,
         |         sum(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
         |         sum(CASE WHEN churned THEN 0 ELSE 1 END) AS cns
         |  FROM uu GROUP BY t_hours),
         |n AS (SELECT count(*) AS n_users FROM uu),
         |cum AS (
         |  SELECT t_hours, d, cns,
         |         sum(d + cns) OVER (ORDER BY t_hours) AS cum_all
         |  FROM pert),
         |risk AS (
         |  SELECT t_hours, d, cns, n_users - (cum_all - d - cns) AS n_risk
         |  FROM cum CROSS JOIN n),
         |terms AS (SELECT *, $kmTermSql AS term FROM risk),
         |logs AS (
         |  SELECT *, sum(term) OVER (ORDER BY t_hours) AS log_s0 FROM terms)
         |SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk,
         |       CAST(d AS BIGINT) AS n_deaths,
         |       CAST(CASE WHEN d = n_risk THEN NULL ELSE log_s0 END
         |         AS BIGINT) AS log_s_fp
         |FROM logs WHERE d > 0 ORDER BY t_hours""".stripMargin,

    "rmst_survival" ->
      s"""WITH u AS MATERIALIZED (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us,
         |         max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |mx AS (SELECT max(last_us) AS max_us FROM u),
         |uu AS MATERIALIZED (
         |  SELECT (last_us - first_us) // 3600000000 AS t_hours,
         |         max_us - last_us > 86400000000 AS churned
         |  FROM u CROSS JOIN mx),
         |pert AS (
         |  SELECT t_hours,
         |         sum(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
         |         sum(CASE WHEN churned THEN 0 ELSE 1 END) AS cns
         |  FROM uu GROUP BY t_hours),
         |n AS (SELECT count(*) AS n_users FROM uu),
         |cum0 AS (
         |  SELECT t_hours, d, cns,
         |         sum(d + cns) OVER (ORDER BY t_hours) AS cum_all
         |  FROM pert),
         |risk AS MATERIALIZED (
         |  SELECT t_hours, d, cns, n_users - (cum_all - d - cns) AS n_risk
         |  FROM cum0 CROSS JOIN n),
         |terms AS (SELECT *, $kmTermSql AS term FROM risk),
         |logs AS MATERIALIZED (
         |  SELECT *, sum(term) OVER (ORDER BY t_hours) AS log_s0
         |  FROM terms),
         |sv AS MATERIALIZED (
         |  SELECT t_hours, d, n_risk,
         |         ${expFpSql("log_s0 - term")} AS s_prev_fp,
         |         CASE WHEN d = n_risk THEN 0
         |              ELSE ${expFpSql("log_s0")} END AS s_cur_fp
         |  FROM logs WHERE d > 0),
         |cum AS MATERIALIZED (
         |  SELECT *, s_prev_fp - s_cur_fp AS drop_fp,
         |         sum(d) OVER (ORDER BY t_hours) AS cum_d
         |  FROM sv),
         |dt AS (SELECT sum(d) AS d_total FROM sv),
         |tau AS (
         |  SELECT min(t_hours) AS tau_hours
         |  FROM cum CROSS JOIN dt WHERE cum_d * 4 >= d_total * 3)
         |SELECT tau_hours, CAST(d_total AS BIGINT) AS d_total,
         |       CAST(count(*) AS BIGINT) AS n_steps,
         |       CAST(tau_hours * 1000000
         |         - sum(CASE WHEN t_hours < tau_hours
         |                    THEN drop_fp * (tau_hours - t_hours)
         |                    ELSE 0 END) AS BIGINT) AS rmst_fp
         |FROM cum CROSS JOIN tau CROSS JOIN dt
         |GROUP BY tau_hours, d_total""".stripMargin,

    "nelson_aalen_hazard" ->
      s"""WITH u AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us,
         |         max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |mx AS (SELECT max(last_us) AS max_us FROM u),
         |uu AS (
         |  SELECT (last_us - first_us) // 3600000000 AS t_hours,
         |         max_us - last_us > 86400000000 AS churned
         |  FROM u CROSS JOIN mx),
         |pert AS (
         |  SELECT t_hours,
         |         sum(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
         |         sum(CASE WHEN churned THEN 0 ELSE 1 END) AS cns
         |  FROM uu GROUP BY t_hours),
         |n AS (SELECT count(*) AS n_users FROM uu),
         |cum AS (
         |  SELECT t_hours, d, cns,
         |         sum(d + cns) OVER (ORDER BY t_hours) AS cum_all
         |  FROM pert),
         |risk AS (
         |  SELECT t_hours, d, cns, n_users - (cum_all - d - cns) AS n_risk
         |  FROM cum CROSS JOIN n),
         |terms AS (SELECT *, $naTermSql AS term FROM risk),
         |hs AS (
         |  SELECT *, sum(term) OVER (ORDER BY t_hours) AS h_cum
         |  FROM terms)
         |SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk,
         |       CAST(d AS BIGINT) AS n_deaths,
         |       CAST(h_cum AS BIGINT) AS h_cum_fp,
         |       $breslowSql AS s_breslow_fp
         |FROM hs WHERE d > 0 ORDER BY t_hours""".stripMargin,

    "logrank_test_arms" ->
      s"""WITH u AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us,
         |         max(epoch_us(ts)) AS last_us
         |  FROM events GROUP BY user_id),
         |ua AS (
         |  SELECT *, CAST(concat('0x',
         |           substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
         |           AS BIGINT) % 2 AS arm
         |  FROM u),
         |mx AS (SELECT max(last_us) AS max_us FROM u),
         |uu AS (
         |  SELECT (last_us - first_us) // 3600000000 AS t_hours,
         |         max_us - last_us > 86400000000 AS churned, arm
         |  FROM ua CROSS JOIN mx),
         |pert AS (
         |  SELECT t_hours,
         |    sum(CASE WHEN arm = 0 AND churned THEN 1 ELSE 0 END) AS d0,
         |    sum(CASE WHEN arm = 0 AND NOT churned THEN 1 ELSE 0 END) AS c0,
         |    sum(CASE WHEN arm = 1 AND churned THEN 1 ELSE 0 END) AS d1,
         |    sum(CASE WHEN arm = 1 AND NOT churned THEN 1 ELSE 0 END) AS c1
         |  FROM uu GROUP BY t_hours),
         |ns AS (
         |  SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         |         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
         |  FROM uu),
         |lad AS (
         |  SELECT *,
         |         sum(d0 + c0) OVER (ORDER BY t_hours) AS cum0,
         |         sum(d1 + c1) OVER (ORDER BY t_hours) AS cum1
         |  FROM pert),
         |r AS (
         |  SELECT *, n0 - (cum0 - d0 - c0) AS r0,
         |         n1 - (cum1 - d1 - c1) AS r1,
         |         n0 - (cum0 - d0 - c0) + n1 - (cum1 - d1 - c1) AS rt
         |  FROM lad CROSS JOIN ns),
         |agg AS (
         |  SELECT CAST(max(n0) AS BIGINT) AS n0,
         |         CAST(max(n1) AS BIGINT) AS n1,
         |         CAST(sum(d1) AS BIGINT) AS o1,
         |         CAST(sum($lrETermSql) AS BIGINT) AS e1,
         |         CAST(sum($lrVTermSql) AS BIGINT) AS v1
         |  FROM r)
         |SELECT n0, n1, o1, e1 AS e1_fp, v1 AS v1_fp,
         |       $lrChi2Sql AS chi2_fp
         |FROM agg""".stripMargin,

    "engagement_pipeline_e2e" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN lag(us) OVER w IS NULL
         |                OR us - lag(us) OVER w > $GapUs
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, event_id, event_type, us,
         |         sum(new_sess) OVER (PARTITION BY user_id
         |           ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
         |           AS session_idx
         |  FROM flagged),
         |st0 AS (
         |  SELECT *,
         |    first_value(event_type) OVER (PARTITION BY user_id, session_idx
         |      ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      UNBOUNDED FOLLOWING) AS entry_type,
         |    min(CASE WHEN event_type = 'view' THEN us END) OVER ws AS t1
         |  FROM sess WINDOW ws AS (PARTITION BY user_id, session_idx)),
         |st1 AS (
         |  SELECT *, min(CASE WHEN event_type = 'click' AND us > t1
         |                     THEN us END)
         |    OVER (PARTITION BY user_id, session_idx) AS t2
         |  FROM st0),
         |st2 AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2
         |                     THEN us END)
         |    OVER (PARTITION BY user_id, session_idx) AS t3
         |  FROM st1),
         |persess AS (
         |  SELECT user_id, session_idx, min(entry_type) AS entry_type,
         |         count(*) AS n_events, max(us) - min(us) AS dur_us,
         |         max(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
         |           AS converted
         |  FROM st2 GROUP BY user_id, session_idx)
         |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(CASE WHEN n_events >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_gated,
         |  CAST(sum(CASE WHEN n_events >= 3 AND converted = 1
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
         |  CAST(CASE WHEN sum(CASE WHEN n_events >= 3 THEN 1 ELSE 0 END) = 0
         |       THEN NULL
         |       ELSE sum(CASE WHEN n_events >= 3 AND converted = 1
         |                THEN 1 ELSE 0 END) * 1000000
         |            // sum(CASE WHEN n_events >= 3 THEN 1 ELSE 0 END) END
         |    AS BIGINT) AS conv_fp,
         |  CAST(CASE WHEN sum(CASE WHEN n_events >= 3 THEN 1 ELSE 0 END) = 0
         |       THEN NULL
         |       ELSE sum(CASE WHEN n_events >= 3 THEN dur_us ELSE 0 END)
         |            // sum(CASE WHEN n_events >= 3 THEN 1 ELSE 0 END) END
         |    AS BIGINT) AS mean_gated_dur_us
         |FROM persess GROUP BY entry_type ORDER BY entry_type""".stripMargin,

    "session_sequence_rules" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, event_type, us,
         |         CASE WHEN lag(us) OVER w IS NULL
         |                OR us - lag(us) OVER w > $GapUs
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, event_type, us,
         |         sum(new_sess) OVER (PARTITION BY user_id
         |           ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
         |           AS session_idx
         |  FROM flagged),
         |stypes AS (
         |  SELECT user_id, session_idx, event_type, min(us) AS first_us
         |  FROM sess GROUP BY user_id, session_idx, event_type),
         |nsess AS (
         |  SELECT count(*) AS n_sessions FROM
         |    (SELECT DISTINCT user_id, session_idx FROM stypes)),
         |antes AS (
         |  SELECT event_type AS antecedent, count(*) AS ante_sessions
         |  FROM stypes GROUP BY event_type),
         |pairs AS (
         |  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         |         count(*) AS pair_sessions
         |  FROM stypes a JOIN stypes b
         |    ON a.user_id = b.user_id AND a.session_idx = b.session_idx
         |   AND (a.first_us < b.first_us
         |        OR (a.first_us = b.first_us
         |            AND a.event_type < b.event_type))
         |  GROUP BY 1, 2)
         |SELECT antecedent, consequent,
         |       CAST(pair_sessions AS BIGINT) AS pair_sessions,
         |       CAST(pair_sessions * 1000000 // n_sessions AS BIGINT)
         |         AS support_fp,
         |       CAST(pair_sessions * 1000000 // ante_sessions AS BIGINT)
         |         AS confidence_fp
         |FROM pairs JOIN antes USING (antecedent) CROSS JOIN nsess
         |ORDER BY pair_sessions DESC, antecedent, consequent
         |LIMIT 15""".stripMargin,

    "dp_laplace_count_release" ->
      """WITH n AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_true
        |  FROM documents GROUP BY 1),
        |grid(eps_label, b) AS (
        |  VALUES ('eps_0.1', CAST(10 AS BIGINT)),
        |         ('eps_1.0', CAST(1 AS BIGINT))),
        |g AS (
        |  SELECT source, eps_label, b, n_true,
        |         CAST(concat('0x', substr(md5('dp|' || source || '|' ||
        |           eps_label), 1, 6)) AS BIGINT) AS h
        |  FROM n CROSS JOIN grid),
        |leaf AS (
        |  SELECT source, eps_label, b, n_true,
        |         2 * h + 1 - 16777216 AS x2,
        |         abs(2 * h + 1 - 16777216) AS a
        |  FROM g),
        |rel AS (
        |  SELECT source, eps_label, b, n_true,
        |         CAST(FLOOR(-CAST(b AS DOUBLE)
        |           * (CASE WHEN x2 >= 0 THEN 1.0 ELSE -1.0 END)
        |           * ln((16777216.0 - a) / 16777216.0)
        |           * 1000000.0) AS BIGINT) AS noise_fp
        |  FROM leaf)
        |SELECT source, eps_label, b, n_true, noise_fp,
        |       n_true * 1000000 + noise_fp AS released_fp,
        |       abs(noise_fp) <= CAST(FLOOR(CAST(b AS DOUBLE)
        |         * ln(200.0) * 1000000.0) AS BIGINT) AS within_995
        |FROM rel ORDER BY source, eps_label""".stripMargin,
  ) ++ erasureOracle

  /** `def`-built so the lastPath of every audited layout is resolved
    * AFTER the queries have materialized them (the Layout contract).
    */
  private def erasureOracle: Map[String, String] = Map(
    "right_to_erasure_audit" ->
      s"""WITH deld AS (
         |  SELECT doc_id FROM documents WHERE doc_id % 10 = 7),
         |delv AS (
         |  SELECT vec_id FROM embeddings WHERE vec_id % 10 = 7),
         |delm AS (
         |  SELECT doc_id FROM documents
         |  WHERE doc_id % 25 = 0 AND (doc_id // 25) % 10 = 7),
         |rows_ AS (
         |  SELECT '1_minhash_signatures' AS layout,
         |    (SELECT CAST(count(*) AS BIGINT) FROM deld) AS n_deleted_keys,
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM read_parquet(
         |       '${IncrementalMaintainOps.incCache.lastPath}/*.parquet') l
         |     JOIN deld k ON l.doc_id = k.doc_id) AS n_residual
         |  UNION ALL
         |  SELECT '2_bm25_postings',
         |    (SELECT CAST(count(*) AS BIGINT) FROM deld),
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM read_parquet(
         |       '${IncrementalBm25Ops.incCache.lastPath}/*.parquet') l
         |     JOIN deld k ON l.doc_id = k.doc_id)
         |  UNION ALL
         |  SELECT '3_bm25_doclen',
         |    (SELECT CAST(count(*) AS BIGINT) FROM deld),
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM read_parquet(
         |       '${IncrementalBm25Ops.incCache.lastPath}.dl/*.parquet') l
         |     JOIN deld k ON l.doc_id = k.doc_id)
         |  UNION ALL
         |  SELECT '4_ivf_serving',
         |    (SELECT CAST(count(*) AS BIGINT) FROM delv),
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM read_parquet(
         |       '${IncrementalIvfOps.incCache.lastPath}/cell=*/*.parquet',
         |       hive_partitioning=1) l
         |     JOIN delv k ON l.vec_id = k.vec_id)
         |  UNION ALL
         |  SELECT '5_phash_signatures',
         |    (SELECT CAST(count(*) AS BIGINT) FROM delm),
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM read_parquet(
         |       '${IncrementalPhashOps.incCache.lastPath}/*.parquet') l
         |     JOIN delm k ON l.doc_id = k.doc_id)
         |  UNION ALL
         |  SELECT '6_knn_edges',
         |    (SELECT CAST(count(*) AS BIGINT) FROM delv),
         |    (SELECT CAST(count(*) AS BIGINT)
         |     FROM (SELECT src AS vec_id
         |           FROM read_parquet(
         |             '${IncrementalKnnOps.incCache.lastPath}/*.parquet')
         |           UNION ALL
         |           SELECT dst
         |           FROM read_parquet(
         |             '${IncrementalKnnOps.incCache.lastPath}/*.parquet')) l
         |     JOIN delv k ON l.vec_id = k.vec_id))
         |SELECT layout, n_deleted_keys, n_residual,
         |       n_residual = 0 AS clean
         |FROM rows_ ORDER BY layout""".stripMargin,
  )
}
