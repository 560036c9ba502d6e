package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics operators: sessionization, funnel conversion,
  * cohort retention — the product-analytics surface a warehouse serves
  * over an append-only event stream.
  *
  * Scale design:
  *   - Everything partitions by `user_id`: sessionize and funnel are
  *     ONE shuffle each (Spark reuses the (user_id, ts) sort across
  *     consecutive window specs over the same partitioning), cohort is
  *     a per-user min + a distinct — all partial-aggregatable.
  *   - Time math is exact integer MICROSECONDS (`unix_micros` /
  *     `epoch_us`): both engines floor identically, where second-level
  *     `unix_timestamp`/`epoch()` would round differently (SURVEY §12).
  *   - No per-user collect, no driver loop: session numbering is a
  *     running sum over a boundary flag, the textbook gap-sessionize
  *     that holds at any user count.
  */
object EventAnalyticsOps extends OpGroup {

  /** Power iterations for the stationary distribution — far past
    * convergence for a 5-state chain (spectral gap ≫ 0), small enough
    * that the oracle's unrolled CTE chain stays readable.
    */
  private val MarkovIters = 20

  /** Session gap: 30 min, in µs. */
  private val GapUs = 1800000000L

  /** Per-transition entropy leaf −p·ln p = (c/tot)·ln(tot/c), 1e-9 fp,
    * over the exact (count, row-total) integers. One shared string.
    */
  private val hTermSql =
    """CAST(FLOOR(CAST(c AS DOUBLE) / tot * ln(CAST(tot AS DOUBLE) / c)
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Shared oracle CTE chain for the Markov family: lead-chain counts
    * → ppm transition matrix → MarkovIters unrolled exact-integer
    * power-iteration stages (aggregates are not allowed inside a
    * recursive term, and the depth is a compile-time constant).
    */
  private lazy val markovCtes: String = {
    // AS MATERIALIZED is load-bearing (r12s3 measurement): DuckDB's
    // default inlining re-expands each stage's upstream tree and this
    // 20-stage unroll costs ~60 s; materialized it is milliseconds.
    val stages = (1 to MarkovIters).map { k =>
      s"""it$k AS MATERIALIZED (
         |  SELECT p.b AS t,
         |         CAST(sum(i.pi * p.p_fp) // 1000000 AS BIGINT) AS pi
         |  FROM it${k - 1} i JOIN pm p ON p.a = i.t GROUP BY p.b)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id) AS nxt
       |  FROM events),
       |tc AS (SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS c
       |       FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
       |tt AS (SELECT event_type, sum(c) AS tot FROM tc GROUP BY event_type),
       |pm AS MATERIALIZED (SELECT event_type AS a, nxt AS b,
       |              CAST(c * 1000000 // tot AS BIGINT) AS p_fp
       |       FROM tc JOIN tt USING (event_type)),
       |types AS (SELECT DISTINCT a AS t FROM pm),
       |it0 AS (SELECT t, CAST(1000000 // (SELECT count(*) FROM types)
       |                  AS BIGINT) AS pi
       |        FROM types),
       |$stages""".stripMargin
  }

  /** Shared transition-count matrix: the one-shuffle per-user lead
    * chain folded to (event_type, nxt, c) — |types|²-bounded.
    */
  /** Channels eligible for removal in the attribution chain — the
    * fixture's non-converting event types, spelled as literals on BOTH
    * engines (the mann_whitney isin precedent) because the oracle's
    * unrolled scenario CTEs need static names; a channel absent from
    * the data yields P_removed = P_base = removal effect 0 identically
    * on both sides.
    */
  private val RemovalChannels = Seq("click", "error", "signup", "view")

  /** Conversion-reach recurrence on the COLLECTED absorbing-chain ppm
    * matrix (bounded model state driver-side — the stationaryPi
    * precedent): r'(a) = Σ_b P(a,b)·r(b) DIV 1e6 with r(__conv)
    * pinned at 1e6 and r(__null) at 0, MarkovIters sum-then-truncate
    * steps, optionally with every transition INTO `drop` removed (the
    * Anderl et al. 2016 removal semantics: paths through the channel
    * fall to the null absorber). Pure non-negative integer ops — both
    * engines' unrolls agree bit-for-bit.
    */
  private def conversionReach(pm: Array[(String, String, Long)],
      drop: Option[String]): Long = {
    val states = pm.map(_._1).distinct.sorted
    var r: Map[String, Long] = states.map(_ -> 0L).toMap
    for (_ <- 1 to MarkovIters) {
      r = states.map { a =>
        a -> pm.iterator.filter(e => e._1 == a && !drop.contains(e._2))
          .map { case (_, b, p) =>
            val rb =
              if (b == "__conv") 1000000L
              else if (b == "__null") 0L
              else r.getOrElse(b, 0L)
            p * rb
          }.sum / 1000000L
      }.toMap
    }
    r.getOrElse("__start", 0L)
  }

  /** DuckDB replay of the removal-effect recurrences: the absorbing
    * transition build, then per scenario (base + one per channel) the
    * [[MarkovIters]]-stage unrolled reach recurrence — the markovCtes
    * recipe with the __conv/__null absorber CASE.
    */
  private lazy val removalOracle: String = {
    // AS MATERIALIZED is load-bearing: DuckDB's default CTE inlining
    // re-expands each stage's upstream tree and the 100-stage chain
    // goes from 0.6 s to minutes without it (measured r12s3);
    // markovCtes' 20-stage chain had the same latent cliff.
    def stages(tag: String, filter: String): String = {
      val init =
        s"r${tag}0 AS MATERIALIZED (SELECT t, CAST(0 AS BIGINT) AS v FROM sts)"
      val its = (1 to MarkovIters).map { k =>
        s"""r$tag$k AS MATERIALIZED (
           |  SELECT s.t, CAST(COALESCE(sum(p.p *
           |      CASE WHEN p.b = '__conv' THEN 1000000
           |           WHEN p.b = '__null' THEN 0
           |           ELSE COALESCE(r.v, 0) END), 0) // 1000000
           |    AS BIGINT) AS v
           |  FROM sts s LEFT JOIN pm p ON p.a = s.t$filter
           |  LEFT JOIN r$tag${k - 1} r ON r.t = p.b
           |  GROUP BY s.t)""".stripMargin
      }
      (init +: its).mkString(",\n")
    }
    val scen = (stages("base", "") +: RemovalChannels.map(c =>
      stages(c, s" AND p.b <> '$c'"))).mkString(",\n")
    val K = MarkovIters
    val resRows = RemovalChannels.map(c =>
      s"""SELECT '$c' AS channel,
         |    (SELECT v FROM r$c$K WHERE t = '__start') AS p_removed"""
        .stripMargin).mkString("\n  UNION ALL\n  ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY ts, event_id) AS rn
       |  FROM events),
       |fpu AS (SELECT user_id, min(rn) AS fp_rn FROM ev
       |        WHERE event_type = 'purchase' GROUP BY 1),
       |kept AS (
       |  SELECT ev.user_id, ev.rn,
       |         CASE WHEN ev.event_type = 'purchase' THEN '__conv'
       |              ELSE ev.event_type END AS state
       |  FROM ev LEFT JOIN fpu USING (user_id)
       |  WHERE fpu.fp_rn IS NULL OR ev.rn <= fpu.fp_rn),
       |tr AS (
       |  SELECT COALESCE(lag(state) OVER (PARTITION BY user_id
       |           ORDER BY rn), '__start') AS a, state AS b
       |  FROM kept),
       |te AS (
       |  SELECT state AS a, '__null' AS b
       |  FROM (SELECT user_id, state, rn,
       |          max(rn) OVER (PARTITION BY user_id) AS mx FROM kept)
       |  WHERE rn = mx AND state <> '__conv'),
       |tcr AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
       |        FROM (SELECT * FROM tr UNION ALL SELECT * FROM te)
       |        GROUP BY 1, 2),
       |ttr AS (SELECT a, CAST(sum(c) AS BIGINT) AS tot FROM tcr
       |        GROUP BY 1),
       |pm AS MATERIALIZED (SELECT a, b, CAST(c * 1000000 // tot AS BIGINT)
       |         AS p
       |       FROM tcr JOIN ttr USING (a)),
       |sts AS MATERIALIZED (SELECT DISTINCT a AS t FROM pm),
       |$scen,
       |base AS (SELECT v AS p_base FROM rbase$K WHERE t = '__start'),
       |res AS (
       |  $resRows),
       |sel AS (
       |  SELECT r.channel, b.p_base, r.p_removed,
       |         CASE WHEN b.p_base > 0
       |           THEN 1000000 - r.p_removed * 1000000 // b.p_base
       |         ELSE NULL END AS re
       |  FROM res r CROSS JOIN base b),
       |tot AS (SELECT CAST(sum(greatest(re, 0)) AS BIGINT) AS re_sum
       |        FROM sel)
       |SELECT sel.channel, sel.p_base AS p_base_fp,
       |       sel.p_removed AS p_removed_fp,
       |       CAST(sel.re AS BIGINT) AS re_fp,
       |       CASE WHEN tot.re_sum > 0
       |         THEN CAST(greatest(sel.re, 0) * 1000000 // tot.re_sum
       |           AS BIGINT)
       |       ELSE NULL END AS att_fp
       |FROM sel CROSS JOIN tot ORDER BY sel.channel""".stripMargin
  }

  private def transitionCounts(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("event_type", "nxt").agg(count(lit(1)).as("c"))
  }

  /** 20 exact sum-then-truncate power iterations π' = πP on the
    * COLLECTED ≤|types|² ppm matrix (bounded model state driver-side —
    * the BPE-merge precedent); pure integer ops, so both engines'
    * unrolls agree bit-for-bit.
    */
  private def stationaryPi(pm: Array[(String, String, Long)])
      : Seq[(String, Long)] = {
    val types = pm.map(_._1).distinct.sorted
    var pi: Map[String, Long] =
      types.map(t => t -> 1000000L / types.length).toMap
    for (_ <- 1 to MarkovIters) {
      val nxt = types.map { b =>
        b -> pm.filter(_._2 == b)
          .map { case (a, _, p) => pi.getOrElse(a, 0L) * p }.sum / 1000000L
      }.toMap
      pi = nxt
    }
    types.map(t => (t, pi(t))).toSeq
  }

  /** Kleinberg 2-state burst emission cost −[c·ln p + (n−c)·ln(1−p)]
    * in 1e-6 fp, FLOOR'd at the leaf over the exact daily (c, n) and
    * global (ct, nt) integers — the identical parse tree evaluates on
    * both engines (klTerm/nll precedent). `p` is a SQL double expr.
    */
  private def burstCostSql(p: String) =
    s"""CAST(FLOOR(-(CAST(c AS DOUBLE) * ln($p)
       | + CAST(n - c AS DOUBLE) * ln(1.0 - ($p)))
       | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Base rate p0 = global target share; burst rate p1 = 2·p0 capped
    * below 1 (Kleinberg 2002's s·p0 with s = 2).
    */
  private val burstP0 = "(CAST(ct AS DOUBLE) / nt)"
  private val burstP1 = "LEAST(2.0 * CAST(ct AS DOUBLE) / nt, 0.99)"

  /** Exact integer Viterbi over the COLLECTED calendar-bounded daily
    * cost table (bounded model state driver-side — the stationaryPi
    * precedent; the IEEE cost leaves were already fixed by Spark SQL,
    * so this pass is pure Long arithmetic): forward min-cost per
    * state, backward argmin pass, ties broken toward the base state on
    * BOTH passes — the same rule the oracle's recursive CTEs spell.
    * Rows are (day, n, c, cost0_fp, cost1_fp).
    */
  private def burstViterbi(rows: Array[(Long, Long, Long, Long, Long)],
      trans: Long)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val t = rows.length
    val a0 = new Array[Long](t); val a1 = new Array[Long](t)
    for (i <- 0 until t) {
      val c0 = rows(i)._4; val c1 = rows(i)._5
      if (i == 0) { a0(0) = c0; a1(0) = c1 + trans }
      else {
        a0(i) = c0 + math.min(a0(i - 1), a1(i - 1))
        a1(i) = c1 + math.min(a0(i - 1) + trans, a1(i - 1))
      }
    }
    val st = new Array[Long](t)
    st(t - 1) = if (a0(t - 1) <= a1(t - 1)) 0L else 1L
    for (i <- t - 1 to 1 by -1)
      st(i - 1) =
        if (st(i) == 0L) { if (a0(i - 1) <= a1(i - 1)) 0L else 1L }
        else { if (a0(i - 1) + trans <= a1(i - 1)) 0L else 1L }
    (0 until t).map { i =>
      val (day, n, c, c0, c1) = rows(i)
      val start = if (st(i) == 1L && (i == 0 || st(i - 1) == 0L)) 1L else 0L
      (day, n, c, c0, c1, a0(i), a1(i), st(i), start)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1 — gap sessionization (batch twin of T4's streaming session
    // window): boundary flag via lag, session index via running sum,
    // then one aggregate per (user, session).
    "sessionize_gap_batch" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("us", expr("unix_micros(ts)"))
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val flagged = ev
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull.or(col("us") - col("prev_us") > GapUs), 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("t_start"), max("ts").as("t_end"),
          (max("us") - min("us")).as("duration_us"))
        .orderBy("user_id", "session_idx")
    }),

    // V2 — ordered funnel (view → click → purchase): stage timestamps
    // chain through per-user conditional-min windows over ONE
    // partitioning; the summary row counts users surviving each stage.
    "funnel_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val u = Window.partitionBy("user_id")
      val staged = ev
        .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(u))
        .withColumn("t2", min(when(col("event_type") === "click"
          && col("ts") > col("t1"), col("ts"))).over(u))
        .withColumn("t3", min(when(col("event_type") === "purchase"
          && col("ts") > col("t2"), col("ts"))).over(u))
      staged.groupBy("user_id")
        .agg(max(col("t1").isNotNull.cast("long")).as("s1"),
          max(col("t2").isNotNull.cast("long")).as("s2"),
          max(col("t3").isNotNull.cast("long")).as("s3"))
        .agg(sum("s1").as("n_view"),
          sum("s2").as("n_click_after_view"),
          sum("s3").as("n_purchase_after_click"))
    }),

    // V3 — monthly cohort retention: cohort = CALENDAR MONTH of first
    // event, cell = users from that cohort active `month_offset`
    // months later — the acquisition-cohort grid every growth dashboard
    // draws. (r16, VERDICT r15 ask #3: the op ran on ISO-week cohorts
    // for three rounds because the shipped fixture spans one month; the
    // deterministic [[Tables.eventsMultiMonth]] view provides 3 true
    // calendar months, so the cohort key is the real month boundary —
    // offsets are month-INDEX differences (year·12+month), immune to
    // 28/29/30/31-day month lengths.) (user, month) is de-duplicated
    // BEFORE the cohort join, so the final count(*) is already
    // distinct-users. Scale: two combinable shuffles (per-user min,
    // (user, month) dedup); the grid is calendar-bounded.
    "cohort_retention" -> ((s, d) => {
      val ev = Tables.eventsMultiMonth(s, d).select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
        .withColumn("cohort_month", date_trunc("month", col("first_ts")))
        .select("user_id", "cohort_month")
      val active = ev
        .select(col("user_id"), date_trunc("month", col("ts")).as("mth"))
        .distinct()
      active.join(first, "user_id")
        .withColumn("month_offset",
          expr("CAST((year(mth) * 12 + month(mth)) - " +
            "(year(cohort_month) * 12 + month(cohort_month)) AS BIGINT)"))
        .groupBy(col("cohort_month").cast("date").as("cohort_month"),
          col("month_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_month", "month_offset")
    }),

    // V4 — rolling active users: per day, DAU plus the trailing-7-day
    // actives (WAU7) — the engagement headline over an append-only
    // event log. EXACT distinct counting in a rolling window cannot be
    // a window-frame aggregate (distinct doesn't decompose over
    // frames); the scalable exact form expands each (user, day) fact
    // to the ≤7 window days it feeds (a ×7 map-side explode of the
    // ALREADY-DEDUPLICATED per-day fact — not of raw events) and
    // re-counts distinct per window day. Two combinable shuffles
    // regardless of event volume: the (user, day) dedup and the
    // per-day distinct; calendar days present join back via broadcast.
    "rolling_active_users" -> ((s, d) => {
      val au = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = au.select("day").distinct()
      val dau = au.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = au
        .select(col("user_id"), explode(expr("sequence(0, 6)")).as("i"),
          col("day"))
        .select(col("user_id"), expr("date_add(day, i)").as("day"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct("user_id").as("wau7"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau7"))
        .orderBy("day")
    }),

    // X4 — winsorized (p05/p95-clipped) mean of the event measure per
    // type: the robust KPI that survives a fat-fingered 10000× purchase.
    // Rank-defined percentiles via GlobalRank's two-phase rank (5 event
    // types — the identical low-cardinality window trap as
    // percentile_disc); measure lifted to exact integer CENTS at the
    // leaf (2-decimal data), clamps and sums stay int64, one 1e-6
    // fixed-point division at the end. The bounds table is
    // type-cardinality-sized — broadcast back into the event stream, so
    // the clip pass is map-side; two combinable shuffles total.
    "winsorized_mean_value" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        ev, "rn", Seq("event_type"), Seq("cents"))
      val cnts = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      val bounds = ranked.join(broadcast(cnts), "event_type")
        .groupBy("event_type")
        .agg(
          min(when(col("rn") === ceil(col("cnt") * 0.05), col("cents")))
            .as("lo"),
          min(when(col("rn") === ceil(col("cnt") * 0.95), col("cents")))
            .as("hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"),
          greatest(col("lo"), least(col("hi"), col("cents"))).as("cl"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cl").as("sum_cl"))
        .select(col("event_type"), col("n"),
          expr("sum_cl * 10000 DIV n").as("winsor_mean_fp"))
        .orderBy("event_type")
    }),

    // V5 — Shannon entropy of each event type's NEXT-type distribution
    // (the transition matrix R3's PageRank walks): a type whose entropy
    // collapses is a deterministic funnel step; one near ln(k) routes
    // uniformly. Determinism: the per-cell contribution
    // -p·ln(p) = -ln(c/tot)·c/tot is ONE shared double expression over
    // exact int64 inputs, FLOOR-truncated to 1e-6 fixed-point AT THE
    // CELL, then integer-summed (associative — any partial-agg layout
    // matches; the dsir ln-precedent). Scale: the transition build is
    // one per-user lag window (the R3 chain); the cell table is
    // |types|²-bounded, its row-count totals broadcast back.
    "event_transition_entropy" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq0 = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val tc = seq0.groupBy("event_type", "nxt").agg(count(lit(1)).as("c"))
      val tt = tc.groupBy("event_type").agg(sum("c").as("tot"))
      tc.join(broadcast(tt), "event_type")
        .select(col("event_type"), col("tot"),
          expr("""CAST(FLOOR(-ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                 * c * 1000000 / tot) AS BIGINT)""").as("h_fp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("out_deg"), max("tot").as("n_trans"),
          sum("h_fp").as("entropy_fp"))
        .orderBy("event_type")
    }),

    // V6 — RFM segmentation (recency / frequency / monetary quintiles),
    // the classic CRM cube. Quintiles are RANK-DEFINED — q =
    // ceil(5·rank/n) over each metric's total order (metric DESC,
    // user_id tiebreak) — so no engine ntile convention is exposed.
    // Three GlobalRank two-phase ranks over the per-user fact (at 100 TB
    // users are one huge unpartitioned rank domain — exactly the
    // single-partition window trap); user count threaded as a
    // driver-measured literal; monetary stays exact int64 cents.
    "rfm_segmentation" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy("user_id").agg(
        max(expr("unix_micros(ts)")).as("last_us"),
        count(lit(1)).as("f"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("m"))
      val n = u.count() // driver-measured scalar (GlobalRank pattern)
      // rank ascending on the negation = metric-descending rank
      val w = u.withColumn("neg_last", -col("last_us"))
        .withColumn("neg_f", -col("f")).withColumn("neg_m", -col("m"))
      val rr = graft.functions.GlobalRank.rowNumber(
        w, "rr", Nil, Seq("neg_last", "user_id"))
      val fr = graft.functions.GlobalRank.rowNumber(
        rr, "fr", Nil, Seq("neg_f", "user_id"))
      val mr = graft.functions.GlobalRank.rowNumber(
        fr, "mr", Nil, Seq("neg_m", "user_id"))
      mr.select(
          expr(s"CAST(ceil(rr * 5.0 / ${n}L) AS BIGINT)").as("r_q"),
          expr(s"CAST(ceil(fr * 5.0 / ${n}L) AS BIGINT)").as("f_q"),
          expr(s"CAST(ceil(mr * 5.0 / ${n}L) AS BIGINT)").as("m_q"),
          col("m"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_users"), sum("m").as("monetary_cents"))
        .orderBy("r_q", "f_q", "m_q")
    }),

    // V7 — conversion latency by acquisition channel: per converting
    // user, µs from first 'view' to the first LATER 'purchase', median
    // per entry event type (the user's first event). Latency math is
    // exact integer µs; the median is rank-defined per channel
    // (GlobalRank; channels are few and huge — the low-cardinality
    // trap). Three user-keyed aggregates + co-partitioned user joins;
    // the per-channel count table broadcasts.
    "conversion_latency_by_entry" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), col("ts"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val fe = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("entry"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("v_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id").filter(col("us") > col("v_us"))
        .groupBy("user_id").agg(min("us").as("p_us"))
      val lat = v.join(p, "user_id").join(fe, "user_id")
        .select(col("entry"), col("user_id"),
          (col("p_us") - col("v_us")).as("lat_us"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        lat, "rn", Seq("entry"), Seq("lat_us", "user_id"))
      val cnts = lat.groupBy("entry").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(cnts), "entry")
        .groupBy("entry")
        .agg(count(lit(1)).as("n_converted"),
          min(when(col("rn") === ceil(col("n") * 0.5), col("lat_us")))
            .as("median_lat_us"),
          min("lat_us").as("min_us"), max("lat_us").as("max_us"))
        .orderBy("entry")
    }),

    // V8 — revenue concentration (Pareto check): the top decile of
    // users by monetary total, and their share of all revenue — the
    // whale-dependency metric behind every LTV model. Rank-defined
    // top decile (rank ≤ ceil(0.1·n) over (m DESC, user_id)); exact
    // int64 cents throughout; share = 1e-6 integer division. One
    // per-user aggregate, one GlobalRank, one single-row summary.
    "pareto_revenue_concentration" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy("user_id").agg(
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("m"))
      val n = u.count() // driver-measured scalar (GlobalRank pattern)
      val ranked = graft.functions.GlobalRank.rowNumber(
        u.withColumn("neg_m", -col("m")), "rn", Nil, Seq("neg_m", "user_id"))
      ranked.agg(
          count(lit(1)).as("n_users"),
          sum("m").as("total_cents"),
          sum(when(col("rn") <= ceil(lit(n) * 0.1), col("m"))
            .otherwise(lit(0L))).as("top_cents"))
        .select(col("n_users"),
          expr(s"CAST(ceil(${n}L * 0.1) AS BIGINT)").as("n_top"),
          col("total_cents"), col("top_cents"),
          expr("top_cents * 1000000 DIV total_cents").as("top_share_fp"))
    }),

    // V9 — session-duration histogram in log2-minute buckets over the
    // V1 gap-sessionization (bucket b = floor(ln(dur_min)/ln 2);
    // singleton sessions — duration 0 — take the -99 sentinel): the
    // engagement-depth distribution. Reuses V1's one (user_id, ts)
    // window chain; duration is exact integer µs; the ln-ratio bucket
    // is ONE shared double expression over exact int64 µs (dsir
    // ln-precedent); histogram = one tiny combinable aggregate.
    "session_duration_histogram" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runW = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val se = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > GapUs, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(runW))
      se.groupBy("user_id", "sid")
        .agg((max("us") - min("us")).as("dur"), count(lit(1)).as("ne"))
        .select(
          expr("""CASE WHEN dur = 0 THEN -99
                 ELSE CAST(FLOOR(ln(CAST(dur AS DOUBLE) / 60000000.0)
                   / ln(2.0)) AS BIGINT) END""").as("bucket"),
          col("ne"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_sessions"), sum("ne").as("n_events"))
        .orderBy("bucket")
    }),

    // V11 — Gini coefficient of per-user revenue (the inequality summary
    // behind V8's Pareto cut): G = (2·Σ rank·m − (n+1)·Σm) / (n·Σm) over
    // the (m ASC, user_id) total order — rank-defined, so ties resolve
    // identically in both engines. Σ rank·m runs in DECIMAL(38,0)
    // (rank·cents passes int64 once n·m̄ nears 1e18; HUGEINT twin on the
    // oracle side); the numerator is non-negative by the Chebyshev sum
    // inequality, so toward-zero DIV and floor // agree. One per-user
    // aggregate + one GlobalRank (users = one huge unpartitioned rank
    // domain — the single-partition window trap) + a single-row summary.
    "gini_revenue_inequality" -> ((s, d) => {
      val u = Tables.events(s, d).groupBy("user_id").agg(
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("m"))
      val n = u.count() // driver-measured scalar (GlobalRank pattern)
      val ranked = graft.functions.GlobalRank.rowNumber(
        u, "rn", Nil, Seq("m", "user_id"))
      ranked.agg(
          count(lit(1)).as("n_users"),
          sum("m").as("total_cents"),
          sum(expr("CAST(rn AS DECIMAL(38,0)) * m")).as("s1"))
        .select(col("n_users"), col("total_cents"),
          expr(s"""CAST((2 * s1 - (${n}L + 1) * CAST(total_cents AS DECIMAL(38,0)))
                 * 1000000 DIV (${n}L * CAST(total_cents AS DECIMAL(38,0)))
                 AS BIGINT)""").as("gini_fp"))
    }),

    // V12 — inactivity churn by acquisition channel: a user is churned
    // at the log horizon (max ts, measured once driver-side — the
    // GlobalRank scalar pattern) if their last event is >14 days older.
    // Channel = the user's first event type (V7's entry definition, one
    // per-user window); everything else is exact integer µs and one
    // combinable per-channel aggregate; rate = 1e-6 integer division.
    "churn_inactivity_by_entry" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      val horizon = ev.agg(max("us")).first().getLong(0)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val entry = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("entry"))
      val last = ev.groupBy("user_id").agg(max("us").as("last_us"))
      entry.join(last, "user_id")
        .groupBy("entry")
        .agg(count(lit(1)).as("n_users"),
          sum(when(lit(horizon) - col("last_us") > lit(14L * 86400000000L),
            1L).otherwise(0L)).as("n_churned"))
        .select(col("entry"), col("n_users"), col("n_churned"),
          expr("n_churned * 1000000 DIV n_users").as("churn_rate_fp"))
        .orderBy("entry")
    }),

    // V13 — next-event prediction table: per type, the top-3 successor
    // types by transition count ((c DESC, successor) tiebreak) with a
    // 1e-6 transition probability — the Markov table R3's PageRank and
    // V5's entropy both read. The ranked table is |types|²-bounded (an
    // enum squared), so the row_number window runs over a broadcast-size
    // AGGREGATE, never the event stream; the transition build itself is
    // the shared one-shuffle per-user lead chain.
    "markov_next_event_topk" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq0 = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
      val tc = seq0.groupBy("event_type", "nxt").agg(count(lit(1)).as("c"))
      val tt = tc.groupBy("event_type").agg(sum("c").as("tot"))
      val rw = Window.partitionBy("event_type").orderBy(col("c").desc, col("nxt"))
      tc.withColumn("rk", row_number().over(rw))
        .filter(col("rk") <= 3)
        .join(broadcast(tt), "event_type")
        .select(col("event_type"), col("rk").cast("long").as("rk"),
          col("nxt"), col("c"),
          expr("c * 1000000 DIV tot").as("p_fp"))
        .orderBy("event_type", "rk")
    }),

    // Stationary distribution of the event-type Markov chain (r12):
    // 20 fixed power iterations π' = πP in exact ppm integers — where
    // the user journey SETTLES, the long-run companion to
    // markov_next_event_topk's one-step view (and the classic
    // PageRank-without-teleport read on the behavior graph). The
    // corpus pass is the shared one-shuffle lead chain folding to the
    // |types|²-bounded transition matrix; the iteration runs on that
    // BOUNDED MODEL STATE driver-side (the BPE-merge/PQ-codebook
    // precedent — ≤25 cells, never a distributed loop), each step
    // sum-then-truncate (Σ π(a)·p(a,b) DIV 1e6) so both engines'
    // 20-step unrolls agree bit-for-bit.
    "markov_stationary_dist" -> ((s, d) => {
      val tc = transitionCounts(s, d)
      val tt = tc.groupBy("event_type").agg(sum("c").as("tot"))
      val pm = tc.join(tt, "event_type")
        .select(col("event_type").as("a"), col("nxt").as("b"),
          expr("c * 1000000 DIV tot").as("p_fp"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      import s.implicits._
      stationaryPi(pm).toDF("event_type", "pi_fp")
        .orderBy("event_type")
    }),

    // Kleinberg 2-state burst detection over the daily purchase share
    // (r12, fourth session; Kleinberg 2002, the batched/binomial
    // variant): each day emits c purchases out of n events; state q0
    // burns cost at the global base rate p0 = Σc/Σn, state q1 at
    // 2·p0; entering a burst costs γ·ln T (γ = 1, T = observed days).
    // The min-cost state path marks the days where purchase intensity
    // is STRUCTURALLY elevated — the retail-calendar read a per-day
    // threshold can't give (one hot hour doesn't open a burst; a
    // sustained run does, and the transition cost merges adjacent
    // blips). Scale: ONE map-side combinable daily aggregate (the
    // calendar-bounded axis), emission costs FLOOR'd as IEEE leaves IN
    // SPARK SQL over exact integers, then the Viterbi runs on the
    // COLLECTED ≤|days| table in pure Long arithmetic (bounded model
    // state — stationaryPi precedent); the oracle replays the same
    // integer DP as forward+backward recursive CTEs, so both engines
    // agree bit-for-bit. Output is the full per-day DP evidence table:
    // costs, both forward minima, the chosen state, and burst-start
    // flags (Σ burst_start = number of distinct bursts).
    "kleinberg_burst_days" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
          col("event_type"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"))
      val tot = daily.agg(sum("n").as("nt"), sum("c").as("ct"),
        count(lit(1)).as("t_days"))
      val costed = daily.crossJoin(broadcast(tot))
        .withColumn("cost0_fp", expr(burstCostSql(burstP0)))
        .withColumn("cost1_fp", expr(burstCostSql(burstP1)))
        .withColumn("trans_fp", expr(
          "CAST(FLOOR(ln(CAST(t_days AS DOUBLE)) * 1000000.0) AS BIGINT)"))
        .orderBy("day")
        .collect()
      val rows = costed.map(r => (r.getAs[Long]("day"), r.getAs[Long]("n"),
        r.getAs[Long]("c"), r.getAs[Long]("cost0_fp"),
        r.getAs[Long]("cost1_fp")))
      val trans = costed.head.getAs[Long]("trans_fp")
      import s.implicits._
      burstViterbi(rows, trans)
        .toDF("day", "n", "n_target", "cost0_fp", "cost1_fp",
          "a0_fp", "a1_fp", "state", "burst_start")
        .orderBy("day")
    }),

    // Entropy rate of the event-type Markov chain (r12, second
    // session): H = Σ_a π_a · h_a with h_a = −Σ_b P_ab ln P_ab — the
    // bits-per-step unpredictability of the user journey, weighting
    // each state's branching entropy (V5's per-state read) by how
    // often the chain actually VISITS it (the stationary π). The
    // corpus pass is the same one-shuffle lead chain; per-state
    // entropy terms are FLOOR'd IEEE leaves over exact (c, tot)
    // integers summed distributed; π reuses the exact integer power
    // iteration on the collected ≤|types|² matrix; the contribution
    // product is pure int64 (π ppm × h 1e-9 ≤ 3.3e15).
    "markov_entropy_rate" -> ((s, d) => {
      // ONE corpus pass: the lead chain folds to the ≤|types|² count
      // matrix, collected once; π is the integer iteration on it, and
      // the ln leaves re-enter Spark SQL on the 25-cell local relation
      // so the IEEE tree stays engine-evaluated (never Scala math).
      val cells = transitionCounts(s, d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val tots = cells.groupBy(_._1).map { case (a, cs) =>
        a -> cs.map(_._3).sum }
      val pm = cells.map { case (a, b, c) =>
        (a, b, c * 1000000L / tots(a)) }
      import s.implicits._
      val hA = cells.toSeq.toDF("event_type", "nxt", "c")
        .join(broadcast(tots.toSeq.toDF("event_type", "tot")), "event_type")
        .withColumn("term", expr(hTermSql))
        .groupBy("event_type").agg(sum("term").as("h_state_fp"))
      val pi = stationaryPi(pm).toDF("event_type", "pi_fp")
      hA.join(broadcast(pi), "event_type")
        .withColumn("contrib_fp", expr("pi_fp * h_state_fp DIV 1000000"))
        .select("event_type", "pi_fp", "h_state_fp", "contrib_fp")
        .orderBy("event_type")
    }),

    // Markov removal-effect attribution (r12, third session): how much
    // of the chain's conversion probability does each channel CARRY?
    // Per-user paths truncate at the first purchase (→ __conv) or end
    // at __null; removal of channel c redirects every transition into
    // c to the null absorber, and RE(c) = 1 − P_c(conv)/P(conv)
    // (Anderl et al. 2016) — the data-driven multi-touch attribution
    // that first/last-touch heuristics approximate. Scale: the corpus
    // pass is ONE per-user window chain folding to the ≤(|types|+1)²
    // transition matrix; the 5 reach recurrences run on that COLLECTED
    // bounded model state (stationaryPi precedent) in exact
    // sum-then-truncate ppm integers; attribution normalizes the
    // clamped effects in one |channels|-bounded pass.
    "markov_removal_attribution" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("rn", row_number().over(w))
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("fp_rn"))
      val kept = ev.join(fp, Seq("user_id"), "left")
        .filter(col("fp_rn").isNull || col("rn") <= col("fp_rn"))
        .withColumn("state", when(col("event_type") === "purchase",
          "__conv").otherwise(col("event_type")))
      val w2 = Window.partitionBy("user_id").orderBy("rn")
      val trans = kept
        .withColumn("a", coalesce(lag("state", 1).over(w2), lit("__start")))
        .select(col("a"), col("state").as("b"))
      val nulls = kept
        .withColumn("mx", max("rn").over(Window.partitionBy("user_id")))
        .filter(col("rn") === col("mx") && col("state") =!= "__conv")
        .select(col("state").as("a"), lit("__null").as("b"))
      val tc = trans.union(nulls).groupBy("a", "b")
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val tots = tc.groupBy(_._1).map { case (a, cs) =>
        a -> cs.map(_._3).sum }
      val pm = tc.map { case (a, b, c) => (a, b, c * 1000000L / tots(a)) }
      val pBase = conversionReach(pm, None)
      val rows = RemovalChannels.map { ch =>
        val pRem = conversionReach(pm, Some(ch))
        val re = if (pBase > 0) Some(1000000L - pRem * 1000000L / pBase)
          else None
        (ch, pBase, pRem, re)
      }
      val reSum = rows.flatMap(_._4).map(math.max(_, 0L)).sum
      import s.implicits._
      rows.map { case (ch, pb, pr, re) =>
        val att = re.filter(_ => reSum > 0)
          .map(r => math.max(r, 0L) * 1000000L / reSum)
        (ch, pb, pr, re, att)
      }.toDF("channel", "p_base_fp", "p_removed_fp", "re_fp", "att_fp")
        .orderBy("channel")
    }),

    // DAU/MAU stickiness per month (r12): average daily actives over
    // monthly actives — THE product-engagement ratio. Distinct counts
    // are exact (per-day and per-month hash aggregates, both
    // map-side-combinable on user_id); the report is calendar-bounded.
    "dau_mau_stickiness" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        expr("date_format(ts, 'yyyy-MM')").as("month"),
        expr("CAST(ts AS DATE)").as("day"), col("user_id"))
      val dau = ev.groupBy("month", "day")
        .agg(countDistinct("user_id").as("dau"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_days"), sum("dau").as("sum_dau"))
      val mau = ev.groupBy("month").agg(countDistinct("user_id").as("mau"))
      dau.join(mau, "month")
        .select(col("month"), col("n_days"), col("mau"),
          expr("sum_dau DIV n_days").as("avg_dau"),
          expr("sum_dau * 1000000 DIV (n_days * mau)").as("stickiness_fp"))
        .orderBy("month")
    }),

    // V14 — first-touch revenue attribution: every purchase's value is
    // credited to the user's FIRST event type (the acquisition channel),
    // the simplest attribution model a marketing warehouse serves.
    // Channel = V7's first-event window (one user_id partitioning);
    // revenue stays exact int64 cents; share = 1e-6 integer division
    // against the single-row broadcast total. Shape: one window pass +
    // one co-partitioned user join + one channel aggregate.
    "first_touch_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val entry = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("entry"))
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("np"), sum("cents").as("rev"))
      val byEntry = entry.join(p, "user_id")
        .groupBy("entry")
        .agg(count(lit(1)).as("n_buyers"), sum("np").as("n_purchases"),
          sum("rev").as("attributed_cents"))
      val tot = byEntry.agg(sum("attributed_cents").as("total_cents"))
      byEntry.crossJoin(broadcast(tot))
        .select(col("entry"), col("n_buyers"), col("n_purchases"),
          col("attributed_cents"),
          expr("attributed_cents * 1000000 DIV total_cents").as("share_fp"))
        .orderBy("entry")
    }),

    // V15 — out-of-order arrival audit: per event type, how many events
    // arrive (by event_id, the ingest sequence) with an event time
    // behind the user's running maximum, and how far behind — the
    // measurement that justifies a streaming watermark delay (T5 drops
    // what this op quantifies). Running max is a per-user rows-framed
    // window over the (event_id) ingest order — user_id-partitioned,
    // never global; lateness is exact integer µs; shares are 1e-6
    // integer divisions into one combinable per-type aggregate.
    "late_arrival_audit" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("mx", max("us").over(w))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("us") < col("mx"), 1L).otherwise(0L)).as("n_late"),
          max(col("mx") - col("us")).as("max_lateness_us"))
        .select(col("event_type"), col("n_events"), col("n_late"),
          expr("n_late * 1000000 DIV n_events").as("late_share_fp"),
          col("max_lateness_us"))
        .orderBy("event_type")
    }),

    // V10 — weekday seasonality per event type: day-of-week counts
    // collapsed to peak day + a χ²/n uniformity score. Day-of-week is
    // ENGINE-INDEPENDENT integer math — (epoch_day + 4) % 7, Monday=0
    // (Spark's dayofweek is 1-based Sunday-first, DuckDB's 0-based:
    // neither convention may leak into the result). χ²/n =
    // Σ(7·o−n)²/(7n²) in exact int64 with a 1e-6 fixed-point division
    // ((7o−n)² caps int64 near n ≈ 1e9 per type — the DECIMAL(38,0)
    // lift applies beyond, same expression). Two tiny aggregates, one
    // broadcast join.
    "weekday_seasonality_profile" -> ((s, d) => {
      val c = Tables.events(s, d)
        .select(col("event_type"),
          expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
      val t = c.groupBy("event_type")
        .agg(sum("o").as("n"), max("o").as("mx"))
      c.join(broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          max("n").as("n_events"),
          min(when(col("o") === col("mx"), col("dow"))).as("peak_dow"),
          sum(expr("(7 * o - n) * (7 * o - n)")).as("ss"))
        .select(col("event_type"), col("n_days"), col("n_events"),
          col("peak_dow"),
          expr("ss * 1000000 DIV (7 * n_events * n_events)")
            .as("chi2_over_n_fp"))
        .orderBy("event_type")
    }),

    // Cochran's Q over the user × weekday activity grid (r12, fifth
    // session; Cochran 1950): do the 7 weekdays differ in the SHARE
    // of users active on them, with every user serving as their own
    // block? The binary-outcome sibling of friedman_test_priority —
    // weekday_seasonality_profile reads raw volume, which one heavy
    // user can tilt; Q asks the per-user question. Exact integers
    // throughout: Q = (k−1)·(k·ΣC² − S²)/(k·ΣR − ΣR²) over the
    // per-weekday column totals C_j and per-user row totals R_i
    // (rows with R = 0 or k cancel in the denominator — the
    // textbook degeneracy, handled by construction). Scale: presence
    // collapses map-side to DISTINCT (user, dow) pairs (user-keyed
    // combinable); the user-moment fold is one combinable aggregate;
    // columns are 7-bounded. One floored division (numerator ≥ 0 by
    // Cauchy–Schwarz on the fixed column-total sum).
    "cochran_q_weekday" -> ((s, d) => {
      val pres = Tables.events(s, d)
        .select(col("user_id"),
          expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"))
        .distinct()
      val rowAgg = pres.groupBy("user_id").agg(count(lit(1)).as("r"))
        .agg(count(lit(1)).as("n_users"), sum("r").as("sum_r"),
          sum(expr("r * r")).as("sum_r2"))
      val colAgg = pres.groupBy("dow").agg(count(lit(1)).as("c"))
        .agg(sum("c").as("sum_c"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sum_c2"))
      rowAgg.crossJoin(broadcast(colAgg))
        .filter(expr("7 * sum_r - sum_r2 > 0"))
        .select(col("n_users"), col("sum_r").as("n_active_cells"),
          expr("""CAST(6 * (7 * sum_c2 - CAST(sum_c AS DECIMAL(38,0))
                 |   * sum_c) * 1000000
                 | DIV (CAST(7 AS DECIMAL(38,0)) * sum_r - sum_r2)
                 | AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("q_fp"),
          lit(6L).as("dof"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "sessionize_gap_batch" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events),
         |flagged AS (
         |  SELECT user_id, ts, event_id, us,
         |    CASE WHEN lag(us) OVER w IS NULL
         |              OR us - lag(us) OVER w > $GapUs
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, us,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
         |  FROM flagged)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |  min(ts) AS t_start, max(ts) AS t_end,
         |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
         |FROM sess GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,

    "funnel_conversion" ->
      """WITH staged AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) OVER u AS t1,
        |    ts, event_type
        |  FROM events WINDOW u AS (PARTITION BY user_id)),
        |s2 AS (
        |  SELECT user_id, t1,
        |    min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2,
        |    ts, event_type
        |  FROM staged),
        |s3 AS (
        |  SELECT user_id, t1, t2,
        |    min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |per_user AS (
        |  SELECT user_id,
        |    max(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS s1,
        |    max(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS s2,
        |    max(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS s3
        |  FROM s3 GROUP BY user_id)
        |SELECT CAST(sum(s1) AS BIGINT) AS n_view,
        |  CAST(sum(s2) AS BIGINT) AS n_click_after_view,
        |  CAST(sum(s3) AS BIGINT) AS n_purchase_after_click
        |FROM per_user""".stripMargin,

    // calendar-month cohorts over the deterministic multi-month view
    // (r16 — Tables.eventsMultiMonthDuck); offsets are month-index
    // differences, immune to month lengths
    "cohort_retention" ->
      s"""WITH ev AS (${graft.Tables.eventsMultiMonthDuck}),
         |first_seen AS (
         |  SELECT user_id, date_trunc('month', min(ts)) AS cohort_month
         |  FROM ev GROUP BY user_id),
         |active AS (
         |  SELECT DISTINCT user_id, date_trunc('month', ts) AS mth FROM ev)
         |SELECT CAST(cohort_month AS DATE) AS cohort_month,
         |  CAST((year(mth) * 12 + month(mth))
         |    - (year(cohort_month) * 12 + month(cohort_month))
         |    AS BIGINT) AS month_offset,
         |  count(*) AS n_users
         |FROM active JOIN first_seen USING (user_id)
         |GROUP BY 1, 2
         |ORDER BY cohort_month, month_offset""".stripMargin,

    // same expand-the-deduped-fact shape: every (user, day) feeds days
    // day..day+6; only window days that exist in the log are reported
    "rolling_active_users" ->
      """WITH au AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM au),
        |expanded AS (
        |  SELECT au.user_id, au.day + CAST(t.i AS INTEGER) AS day
        |  FROM au CROSS JOIN range(0, 7) t(i)),
        |wau AS (
        |  SELECT e.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau7
        |  FROM expanded e JOIN days USING (day)
        |  GROUP BY e.day),
        |dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM au GROUP BY day)
        |SELECT day, dau, wau7
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    // identical rank-defined p05/p95 pick (row ceil(q·n) of the cents
    // order), identical int64 clamp/sum, toward-zero 1e-6 division
    "winsorized_mean_value" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |ranked AS (
        |  SELECT event_type, cents,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY cents) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM ev),
        |bounds AS (
        |  SELECT event_type,
        |         min(CASE WHEN rn = ceil(cnt * 0.05) THEN cents END) AS lo,
        |         min(CASE WHEN rn = ceil(cnt * 0.95) THEN cents END) AS hi
        |  FROM ranked GROUP BY event_type)
        |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(greatest(b.lo, least(b.hi, ev.cents))) * 10000
        |         // count(*) AS BIGINT) AS winsor_mean_fp
        |FROM ev JOIN bounds b USING (event_type)
        |GROUP BY ev.event_type ORDER BY event_type""".stripMargin,

    // identical lead-chain over the (ts, event_id) total order, identical
    // -ln(c/tot)·c·1e6/tot cell expression FLOOR-truncated then int-summed
    "event_transition_entropy" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tc AS (SELECT event_type, nxt, count(*) AS c
        |       FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
        |tt AS (SELECT event_type, sum(c) AS tot FROM tc GROUP BY event_type)
        |SELECT tc.event_type,
        |       CAST(count(*) AS BIGINT) AS out_deg,
        |       CAST(max(tt.tot) AS BIGINT) AS n_trans,
        |       CAST(sum(CAST(FLOOR(-ln(CAST(tc.c AS DOUBLE)
        |         / CAST(tt.tot AS DOUBLE)) * tc.c * 1000000 / tt.tot)
        |         AS BIGINT)) AS BIGINT) AS entropy_fp
        |FROM tc JOIN tt USING (event_type)
        |GROUP BY tc.event_type ORDER BY event_type""".stripMargin,

    // identical rank-defined quintiles over (metric DESC, user_id)
    "rfm_segmentation" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_us(ts)) AS last_us,
        |         CAST(count(*) AS BIGINT) AS f,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT m,
        |         row_number() OVER (ORDER BY last_us DESC, user_id) AS rr,
        |         row_number() OVER (ORDER BY f DESC, user_id) AS fr,
        |         row_number() OVER (ORDER BY m DESC, user_id) AS mr,
        |         count(*) OVER () AS n
        |  FROM u)
        |SELECT CAST(ceil(rr * 5.0 / n) AS BIGINT) AS r_q,
        |       CAST(ceil(fr * 5.0 / n) AS BIGINT) AS f_q,
        |       CAST(ceil(mr * 5.0 / n) AS BIGINT) AS m_q,
        |       CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(m) AS BIGINT) AS monetary_cents
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // identical first-event channel, strict-after purchase, rank median
    "conversion_latency_by_entry" ->
      """WITH fe AS (
        |  SELECT user_id, event_type AS entry FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM events) WHERE rn = 1),
        |v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
        |      FROM events WHERE event_type = 'view' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
        |      GROUP BY e.user_id),
        |lat AS (
        |  SELECT f.entry, v.user_id, p.p_us - v.v_us AS lat_us
        |  FROM v JOIN p USING (user_id) JOIN fe f USING (user_id)),
        |r AS (
        |  SELECT entry, lat_us,
        |         row_number() OVER (PARTITION BY entry
        |           ORDER BY lat_us, user_id) AS rn,
        |         count(*) OVER (PARTITION BY entry) AS n
        |  FROM lat)
        |SELECT entry, CAST(count(*) AS BIGINT) AS n_converted,
        |       CAST(min(CASE WHEN rn = ceil(n * 0.5) THEN lat_us END)
        |         AS BIGINT) AS median_lat_us,
        |       CAST(min(lat_us) AS BIGINT) AS min_us,
        |       CAST(max(lat_us) AS BIGINT) AS max_us
        |FROM r GROUP BY entry ORDER BY entry""".stripMargin,

    // identical (m DESC, user_id) rank and ceil(0.1·n) cut
    "pareto_revenue_concentration" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT m, row_number() OVER (ORDER BY m DESC, user_id) AS rn,
        |         count(*) OVER () AS n
        |  FROM u)
        |SELECT CAST(max(n) AS BIGINT) AS n_users,
        |       CAST(ceil(max(n) * 0.1) AS BIGINT) AS n_top,
        |       CAST(sum(m) AS BIGINT) AS total_cents,
        |       CAST(sum(CASE WHEN rn <= ceil(n * 0.1) THEN m ELSE 0 END)
        |         AS BIGINT) AS top_cents,
        |       CAST(sum(CASE WHEN rn <= ceil(n * 0.1) THEN m ELSE 0 END)
        |         * 1000000 // sum(m) AS BIGINT) AS top_share_fp
        |FROM r""".stripMargin,

    // identical V1 session chain, identical ln-ratio bucket expression
    "session_duration_histogram" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events),
         |fl AS (
         |  SELECT user_id, us, event_id,
         |         CASE WHEN lag(us) OVER w IS NULL
         |                   OR us - lag(us) OVER w > $GapUs
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |se AS (
         |  SELECT user_id, us,
         |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
         |           ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM fl),
         |du AS (SELECT user_id, sid, max(us) - min(us) AS dur,
         |              count(*) AS ne
         |       FROM se GROUP BY user_id, sid),
         |b AS (
         |  SELECT CASE WHEN dur = 0 THEN -99
         |              ELSE CAST(FLOOR(ln(CAST(dur AS DOUBLE) / 60000000.0)
         |                / ln(2.0)) AS BIGINT) END AS bucket, ne
         |  FROM du)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_sessions,
         |       CAST(sum(ne) AS BIGINT) AS n_events
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // identical (m ASC, user_id) rank, HUGEINT Σrank·m, floor division
    "gini_revenue_inequality" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT m, row_number() OVER (ORDER BY m, user_id) AS rn,
        |         count(*) OVER () AS n
        |  FROM u)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(m) AS BIGINT) AS total_cents,
        |       CAST((2 * sum(CAST(rn AS HUGEINT) * m)
        |              - (max(n) + 1) * sum(m)) * 1000000
        |         // (max(n) * sum(m)) AS BIGINT) AS gini_fp
        |FROM r""".stripMargin,

    // identical first-event channel, µs horizon, 1e-6 rate division
    "churn_inactivity_by_entry" ->
      s"""WITH ev AS (
         |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |h AS (SELECT max(us) AS horizon FROM ev),
         |fe AS (
         |  SELECT user_id, event_type AS entry FROM (
         |    SELECT user_id, event_type,
         |           row_number() OVER (PARTITION BY user_id
         |             ORDER BY ts, event_id) AS rn
         |    FROM ev) WHERE rn = 1),
         |last AS (SELECT user_id, max(us) AS last_us FROM ev GROUP BY user_id)
         |SELECT entry, CAST(count(*) AS BIGINT) AS n_users,
         |       CAST(sum(CASE WHEN h.horizon - last_us > ${14L * 86400000000L}
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
         |       CAST(sum(CASE WHEN h.horizon - last_us > ${14L * 86400000000L}
         |                     THEN 1 ELSE 0 END) * 1000000
         |         // count(*) AS BIGINT) AS churn_rate_fp
         |FROM fe JOIN last USING (user_id) CROSS JOIN h
         |GROUP BY entry ORDER BY entry""".stripMargin,

    // identical lead chain, (c DESC, nxt) rank, 1e-6 probability
    "markov_next_event_topk" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |tc AS (SELECT event_type, nxt, CAST(count(*) AS BIGINT) AS c
        |       FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
        |tt AS (SELECT event_type, sum(c) AS tot FROM tc GROUP BY event_type),
        |r AS (
        |  SELECT event_type, nxt, c,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY c DESC, nxt) AS rk
        |  FROM tc)
        |SELECT r.event_type, CAST(r.rk AS BIGINT) AS rk, r.nxt, r.c,
        |       CAST(r.c * 1000000 // tt.tot AS BIGINT) AS p_fp
        |FROM r JOIN tt USING (event_type)
        |WHERE r.rk <= 3
        |ORDER BY r.event_type, r.rk""".stripMargin,

    // same lead-chain transition matrix; the 20 sum-then-truncate
    // iterations are UNROLLED as generated CTE stages (aggregates are
    // not allowed inside a recursive term, and the chain depth is a
    // compile-time constant anyway)
    "markov_stationary_dist" ->
      s"""$markovCtes
         |SELECT t AS event_type, pi AS pi_fp
         |FROM it$MarkovIters ORDER BY t""".stripMargin,

    "markov_removal_attribution" -> removalOracle,

    // same integer DP as the driver-side Viterbi, replayed as
    // forward+backward recursive CTEs over the day-rank axis (each
    // iteration carries exactly one row, so the recursion is the
    // linear scan); LEAST/tie rules spelled identically to the Scala
    "kleinberg_burst_days" ->
      s"""WITH RECURSIVE daily AS MATERIALIZED (
         |  SELECT epoch_us(ts) // 86400000000 AS day,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN event_type = 'purchase'
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nt,
         |         CAST(sum(c) AS BIGINT) AS ct, count(*) AS t_days
         |  FROM daily),
         |costed AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY day) AS rk, day, n, c,
         |         ${burstCostSql(burstP0)} AS cost0_fp,
         |         ${burstCostSql(burstP1)} AS cost1_fp,
         |         CAST(FLOOR(ln(CAST(t_days AS DOUBLE)) * 1000000.0)
         |           AS BIGINT) AS trans_fp
         |  FROM daily CROSS JOIN tot),
         |fwd AS (
         |  SELECT rk, day, n, c, cost0_fp, cost1_fp, trans_fp,
         |         cost0_fp AS a0, cost1_fp + trans_fp AS a1
         |  FROM costed WHERE rk = 1
         |  UNION ALL
         |  SELECT nx.rk, nx.day, nx.n, nx.c, nx.cost0_fp, nx.cost1_fp,
         |         nx.trans_fp,
         |         nx.cost0_fp + LEAST(f.a0, f.a1),
         |         nx.cost1_fp + LEAST(f.a0 + nx.trans_fp, f.a1)
         |  FROM fwd f JOIN costed nx ON nx.rk = f.rk + 1),
         |mxr AS (SELECT max(rk) AS t_max FROM costed),
         |bwd AS (
         |  SELECT f.rk, CASE WHEN f.a0 <= f.a1 THEN 0 ELSE 1 END AS st
         |  FROM fwd f CROSS JOIN mxr WHERE f.rk = t_max
         |  UNION ALL
         |  SELECT p.rk,
         |         CASE WHEN b.st = 0
         |              THEN CASE WHEN p.a0 <= p.a1 THEN 0 ELSE 1 END
         |              ELSE CASE WHEN p.a0 + p.trans_fp <= p.a1
         |                        THEN 0 ELSE 1 END END
         |  FROM bwd b JOIN fwd p ON p.rk = b.rk - 1),
         |sel AS MATERIALIZED (
         |  SELECT f.rk, f.day, f.n, f.c, f.cost0_fp, f.cost1_fp,
         |         f.a0, f.a1, b.st
         |  FROM fwd f JOIN bwd b ON b.rk = f.rk)
         |SELECT day, n, c AS n_target, cost0_fp, cost1_fp,
         |       a0 AS a0_fp, a1 AS a1_fp, CAST(st AS BIGINT) AS state,
         |       CAST(CASE WHEN st = 1
         |                 AND coalesce(lag(st) OVER (ORDER BY rk), 0) = 0
         |            THEN 1 ELSE 0 END AS BIGINT) AS burst_start
         |FROM sel ORDER BY day""".stripMargin,

    // same CTE chain; the per-state entropy joins the unrolled π
    "markov_entropy_rate" ->
      s"""$markovCtes,
         |h AS (SELECT event_type, CAST(sum($hTermSql) AS BIGINT)
         |        AS h_state_fp
         |      FROM tc JOIN tt USING (event_type) GROUP BY event_type)
         |SELECT h.event_type, pi AS pi_fp, h_state_fp,
         |       CAST(pi * h_state_fp // 1000000 AS BIGINT) AS contrib_fp
         |FROM h JOIN it$MarkovIters i ON i.t = h.event_type
         |ORDER BY event_type""".stripMargin,

    // identical per-day / per-month distinct-user aggregates
    "dau_mau_stickiness" ->
      """WITH ev AS (
        |  SELECT strftime(ts, '%Y-%m') AS month, CAST(ts AS DATE) AS day,
        |         user_id
        |  FROM events),
        |dau AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM (SELECT month, day, count(DISTINCT user_id) AS dau
        |        FROM ev GROUP BY month, day)
        |  GROUP BY month),
        |mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |        FROM ev GROUP BY month)
        |SELECT month, n_days, mau,
        |       CAST(sum_dau // n_days AS BIGINT) AS avg_dau,
        |       CAST(sum_dau * 1000000 // (n_days * mau) AS BIGINT)
        |         AS stickiness_fp
        |FROM dau JOIN mau USING (month) ORDER BY month""".stripMargin,

    // identical first-event channel, cents sums, 1e-6 share division
    "first_touch_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |fe AS (
        |  SELECT user_id, event_type AS entry FROM (
        |    SELECT user_id, event_type,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM ev) WHERE rn = 1),
        |p AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS np,
        |         CAST(sum(cents) AS BIGINT) AS rev
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id),
        |be AS (
        |  SELECT entry, CAST(count(*) AS BIGINT) AS n_buyers,
        |         CAST(sum(np) AS BIGINT) AS n_purchases,
        |         CAST(sum(rev) AS BIGINT) AS attributed_cents
        |  FROM fe JOIN p USING (user_id) GROUP BY entry),
        |tot AS (SELECT sum(attributed_cents) AS total_cents FROM be)
        |SELECT entry, n_buyers, n_purchases, attributed_cents,
        |       CAST(attributed_cents * 1000000 // total_cents AS BIGINT)
        |         AS share_fp
        |FROM be CROSS JOIN tot ORDER BY entry""".stripMargin,

    // identical ingest-order running max and µs lateness
    "late_arrival_audit" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |mx AS (
        |  SELECT event_type, us,
        |         max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |           ROWS UNBOUNDED PRECEDING) AS mx
        |  FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN us < mx THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_late,
        |       CAST(sum(CASE WHEN us < mx THEN 1 ELSE 0 END) * 1000000
        |         // count(*) AS BIGINT) AS late_share_fp,
        |       CAST(max(mx - us) AS BIGINT) AS max_lateness_us
        |FROM mx GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical (epoch_day + 4) % 7 day index and χ²/n integer form
    "weekday_seasonality_profile" ->
      """WITH c AS (
        |  SELECT event_type,
        |         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM events GROUP BY event_type, dow),
        |t AS (SELECT event_type, sum(o) AS n, max(o) AS mx
        |      FROM c GROUP BY event_type)
        |SELECT c.event_type,
        |       CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(max(t.n) AS BIGINT) AS n_events,
        |       CAST(min(CASE WHEN c.o = t.mx THEN c.dow END) AS BIGINT)
        |         AS peak_dow,
        |       CAST(sum((7 * c.o - t.n) * (7 * c.o - t.n)) * 1000000
        |         // (7 * max(t.n) * max(t.n)) AS BIGINT) AS chi2_over_n_fp
        |FROM c JOIN t USING (event_type)
        |GROUP BY c.event_type ORDER BY event_type""".stripMargin,

    // same presence grid / exact Q rational
    "cochran_q_weekday" ->
      """WITH pres AS MATERIALIZED (
        |  SELECT DISTINCT user_id,
        |         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
        |  FROM events),
        |ra AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |         CAST(sum(r) AS BIGINT) AS sum_r,
        |         CAST(sum(r * r) AS BIGINT) AS sum_r2
        |  FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS r
        |        FROM pres GROUP BY 1) t),
        |ca AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS sum_c,
        |         sum(CAST(c AS HUGEINT) * c) AS sum_c2
        |  FROM (SELECT dow, CAST(count(*) AS BIGINT) AS c
        |        FROM pres GROUP BY 1) t)
        |SELECT n_users, sum_r AS n_active_cells,
        |       CAST(6 * (7 * sum_c2 - CAST(sum_c AS HUGEINT) * sum_c)
        |           * 1000000
        |         // (CAST(7 AS HUGEINT) * sum_r - sum_r2) AS BIGINT)
        |         AS q_fp,
        |       CAST(6 AS BIGINT) AS dof
        |FROM ra CROSS JOIN ca
        |WHERE 7 * sum_r - sum_r2 > 0""".stripMargin,
  )
}
