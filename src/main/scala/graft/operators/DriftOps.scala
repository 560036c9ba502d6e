package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-monitoring operators (round-10 widening, fourth session):
  * the Population Stability Index between the first 15 observed days
  * of the event stream (reference cohort) and the remainder (current
  * cohort) (the banded drift score every ML-feature monitor
  * publishes — the quantile-bin sibling of `kl_divergence_source_
  * unigram` and `ks_two_sample_value`), position-based (U-shaped)
  * multi-touch attribution (40/20/40 credit over each purchase's touch
  * journey — the policy layer `first_touch_attribution` is the
  * degenerate case of), and an open-order aging report (backlog value
  * by age band × priority — the ops-review table).
  *
  * Determinism & scale design:
  *   - PSI bin edges are RANK-defined reference deciles (lower-decile
  *     value at rank ⌊i·n/10⌋) computed via the two-phase global
  *     numbering and joined against rank targets derived from the
  *     count — no engine quantile conventions anywhere; bin membership
  *     is a strict-comparison count against the ≤9 broadcast edges;
  *     counts are Laplace-(+1)-smoothed identically on both engines
  *     and each bin's (p−q)·ln(p/q) term is one FLOOR'd IEEE leaf over
  *     exact integers.
  *   - Attribution journeys derive from per-user sequential windows
  *     (cumulative purchase count = journey id); the 40/20/40 split is
  *     exact integer basis points with the largest-remainder bonus
  *     assigned to the EARLIEST middle touches, so Σ bps = 10000 per
  *     journey exactly (spec law); attributed value stays in exact
  *     cent·bps units.
  *   - Aging bands are CASE ladders over integer day ages measured
  *     against the broadcast corpus max date (single-row measured
  *     scalar, the established pattern).
  */
object DriftOps extends OpGroup {

  private val PsiSmooth = 1L // Laplace +1 per bin
  private val PsiBins = 10L

  /** SPRT daily LLR increment, 1e-9 fp: H0 p=0.20 vs H1 p=0.25 on the
    * purchase share — k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) as ONE
    * shared string whose log arguments are literal ratios, so both
    * engines build the identical IEEE tree over exact counts.
    */
  private val sprtTermSql =
    """CAST(FLOOR((CAST(k AS DOUBLE) * ln(0.25 / 0.20)
      | + CAST(n - k AS DOUBLE) * ln((1.0 - 0.25) / (1.0 - 0.20)))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Wald boundaries ln((1−β)/α) = ±ln 19 at α = β = 0.05, floored to
    * 1e-9 fp as Scala-computed literals shared by both engine texts.
    */
  private val SprtUpFp: Long = math.floor(math.log(19.0) * 1e9).toLong
  private val SprtLoFp: Long = math.floor(-math.log(19.0) * 1e9).toLong

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PSI of `value` between the stream's first 15 observed days
    // (reference) and the rest (current), over reference-decile bins.
    "psi_value_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_id"),
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val mind = ev.agg(min("di").as("min_di"))
      val tagged = ev.crossJoin(broadcast(mind))
        .withColumn("cohort",
          when(col("di") - col("min_di") < 15, "ref").otherwise("cur"))
      val ref = tagged.filter(col("cohort") === "ref")
        .select("v_fp", "event_id")
      val totals = tagged.groupBy()
        .agg(sum(when(col("cohort") === "ref", 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("cohort") === "cur", 1L).otherwise(0L)).as("n_cur"))
      val rn = graft.functions.GlobalRank
        .rowNumber(ref, "rn", Nil, Seq("v_fp", "event_id"))
      val targets = totals.select(col("n_ref"),
          explode(expr("sequence(1, 9)")).as("i"))
        .withColumn("target", expr("(i * n_ref) DIV 10"))
        .filter(col("target") >= 1)
        .select("i", "target")
      val edges = rn.join(broadcast(targets), col("rn") === col("target"))
        .select(col("i"), col("v_fp").as("b"))
      val earr = edges.agg(expr(
        "transform(sort_array(collect_list(struct(i, b))), x -> x.b)")
        .as("earr"))
      val binned = tagged.crossJoin(broadcast(earr))
        .withColumn("bin",
          expr("CAST(size(filter(earr, e -> v_fp > e)) AS BIGINT)"))
        .groupBy("bin")
        .agg(sum(when(col("cohort") === "ref", 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("cohort") === "cur", 1L).otherwise(0L)).as("c_cur"))
      val grid = mind.select(explode(expr("sequence(0, 9)")).as("b0"))
        .select(col("b0").cast("long").as("bin"))
      grid.join(binned, Seq("bin"), "left")
        .withColumn("c_ref", coalesce(col("c_ref"), lit(0L)))
        .withColumn("c_cur", coalesce(col("c_cur"), lit(0L)))
        .crossJoin(broadcast(totals))
        .withColumn("term_fp", expr(
          s"""CAST(FLOOR((
             |  (CAST(c_ref + $PsiSmooth AS DOUBLE) / (n_ref + $PsiBins))
             |  - (CAST(c_cur + $PsiSmooth AS DOUBLE) / (n_cur + $PsiBins)))
             |  * ln(((CAST(c_ref + $PsiSmooth AS DOUBLE) / (n_ref + $PsiBins)))
             |     / ((CAST(c_cur + $PsiSmooth AS DOUBLE) / (n_cur + $PsiBins))))
             |  * 1000000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .select("bin", "c_ref", "c_cur", "term_fp")
        .orderBy("bin")
    }),

    // U-shaped multi-touch attribution: 40% first / 40% last / 20%
    // split over middle touches (largest-remainder bps to the earliest
    // middles), per purchase journey, rolled up by touch event type.
    "position_based_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), expr("unix_micros(ts)").as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val seq = ev.withColumn("cum_p",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(w))
      val touches = seq.filter(col("event_type") =!= "purchase")
        .withColumn("jid", col("cum_p") + 1)
        .select("user_id", "jid", "event_id", "event_type", "us")
      val purch = seq.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("cum_p").as("jid"),
          col("cents").as("pcents"))
      val wj = Window.partitionBy("user_id", "jid").orderBy("us", "event_id")
      val wjAll = wj.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val credited = touches
        .withColumn("pos", row_number().over(wj).cast("long"))
        .withColumn("k", count(lit(1)).over(wjAll))
        .withColumn("bps", expr(
          """CASE WHEN k = 1 THEN 10000
            |     WHEN k = 2 THEN 5000
            |     WHEN pos = 1 OR pos = k THEN 4000
            |     ELSE 2000 DIV (k - 2)
            |          + CASE WHEN pos - 1 <= 2000 % (k - 2) THEN 1 ELSE 0 END
            |END""".stripMargin.replace("\n", " ")))
        .join(purch, Seq("user_id", "jid"))
      credited.groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(expr("pcents * bps")).as("attr_cents_bps"))
        .orderBy("event_type")
    }),

    // Open-order backlog aging: value and count by age band × priority,
    // age measured against the corpus max order date.
    "open_order_aging" -> ((s, d) => {
      val ords = Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "F")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("od"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val maxd = ords.agg(max("od").as("max_od"))
      ords.crossJoin(broadcast(maxd))
        .withColumn("age_days", datediff(col("max_od"), col("od")))
        .withColumn("age_band", expr(
          """CASE WHEN age_days <= 30 THEN '0-030d'
            |     WHEN age_days <= 90 THEN '031-090d'
            |     WHEN age_days <= 180 THEN '091-180d'
            |     WHEN age_days <= 365 THEN '181-365d'
            |     ELSE '365d+' END""".stripMargin.replace("\n", " ")))
        .groupBy("age_band", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("value_cents"))
        .orderBy("age_band", "o_orderpriority")
    }),

    // SPRT conversion monitor (r12, second session): Wald's sequential
    // probability ratio test on the daily purchase-conversion rate —
    // H0: p = 0.20 vs H1: p = 0.25, α = β = 0.05 — the always-valid
    // sequential complement to the fixed-horizon ab_srm_check /
    // welch_t_value reads (peek any day without α-inflation; Wald
    // 1945). Per day (k purchases of n events) the LLR increment
    // k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) is ONE shared IEEE leaf
    // over exact integer counts, FLOOR'd then integer-prefix-summed
    // via GlobalRank (calendar-bounded support); the ±ln 19 decision
    // boundaries are Scala-computed integer literals shared by both
    // engines, so the per-day verdict is exact integer comparison.
    "sprt_conversion_monitor" -> ((s, d) => {
      // integer day index alongside the date: the sliced prefix-sum
      // path ranges over a numeric (the psi_value_drift convention)
      val perDay = Tables.events(s, d)
        .groupBy(expr("CAST(ts AS DATE)").as("day"),
          expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("k"))
        .withColumn("llr_fp", expr(sprtTermSql))
      graft.functions.GlobalRank
        .prefixSum(perDay, "cum_llr_fp", col("llr_fp"), Nil, Seq("di"))
        .withColumn("decision", expr(
          s"""CASE WHEN cum_llr_fp >= $SprtUpFp THEN 'reject_h0'
             |     WHEN cum_llr_fp <= $SprtLoFp THEN 'accept_h0'
             |     ELSE 'continue' END""".stripMargin.replace("\n", " ")))
        .select("day", "n", "k", "llr_fp", "cum_llr_fp", "decision")
        .orderBy("day")
    }),

    // Exact 1-D Wasserstein (earth mover's) distance between each
    // source's document token-length distribution and the pooled
    // corpus (r12, fifth session; Vallender 1974: W₁ = ∫|F−G|). PSI
    // and KL read drift through bins and explode on empty cells; W₁
    // is the binless, metric-aware read (how many token-positions of
    // mass must move) a mixture monitor uses to rank sources by
    // length-profile deviation. Discrete exact form: over the sorted
    // pooled support v₁<…<v_m, W₁ = Σ|F_src(vᵢ)−F_all(vᵢ)|·(vᵢ₊₁−vᵢ)
    // with the CDFs as cross-multiplied integer rationals — the sum
    // folds |cum_src·N − cum_all·n_src|·gap exactly in
    // DECIMAL(38,0)/HUGEINT and divides ONCE at the boundary
    // (BIGINT fp out). Scale: per-(source,len) counts fold map-side
    // off the corpus; everything downstream is value-domain-bounded
    // (|distinct lens| × |sources| grid); cumulatives are the
    // two-phase GlobalRank prefix sums, support gaps a rank-shifted
    // equi-join — no partition-less window anywhere.
    "wasserstein_doclen_drift" -> ((s, d) => {
      val lens = Tables.documents(s, d).select(col("source"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("len"))
      val bySrcLen = lens.groupBy("source", "len")
        .agg(count(lit(1)).as("c"))
      val byLen = bySrcLen.groupBy("len").agg(sum("c").as("c_all"))
      val srcTot = bySrcLen.groupBy("source").agg(sum("c").as("n_src"))
      val nAll = byLen.agg(sum("c_all").as("n_all"))
      val cumAll = graft.functions.GlobalRank
        .prefixSum(byLen, "cum_all", col("c_all"), Nil, Seq("len"))
      val rn = graft.functions.GlobalRank
        .rowNumber(cumAll, "rn", Nil, Seq("len"))
      val gaps = rn.join(
          rn.select((col("rn") - 1).as("rn"), col("len").as("nxt")),
          Seq("rn"), "left")
        .select("len", "cum_all", "nxt")
      val grid = srcTot.crossJoin(gaps)
        .join(bySrcLen, Seq("source", "len"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val cum = graft.functions.GlobalRank
        .prefixSum(grid, "cum_src", col("c"), Seq("source"), Seq("len"))
      cum.crossJoin(broadcast(nAll))
        .groupBy("source", "n_src", "n_all")
        .agg(sum(expr(
          """CASE WHEN nxt IS NULL THEN CAST(0 AS DECIMAL(38,0))
            | ELSE abs(CAST(cum_src AS DECIMAL(38,0)) * n_all
            |        - CAST(cum_all AS DECIMAL(38,0)) * n_src)
            |      * (nxt - len) END""".stripMargin.replace("\n", " ")))
          .as("num"))
        .select(col("source"), col("n_src"), col("n_all"),
          expr("""CAST(num * 1000000
                 | DIV (CAST(n_src AS DECIMAL(38,0)) * n_all) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("w1_fp"))
        .orderBy("source")
    }),

    // Y31 — total-variation distance between the weekend and weekday
    // event-type mixes: TV = ½·Σ_t |p_t − q_t| — the L1 companion to
    // psi_value_drift (PSI needs a bin floor and blows up on empty
    // cells; TV is bounded [0,1], defined for every mix, and IS the
    // maximum probability gap any event-type set can show between the
    // two regimes — the tightest "how different can a downstream
    // consumer's view get" bound). PURE integer: per-type counts fold
    // map-side; |c1_t·n2 − c2_t·n1| sums in DECIMAL(38,0)/HUGEINT over
    // the enum-bounded type set; TV_fp = Σ·1e6 DIV (2·n1·n2) is one
    // exact floor division. Single-row output, zero IEEE leaves.
    "total_variation_event_drift" -> ((s, d) => {
      val cells = Tables.events(s, d)
        .select(col("event_type"),
          expr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5").as("we"))
        .groupBy("event_type")
        .agg(sum(when(col("we"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("we"), 1L).otherwise(0L)).as("c2"))
      val tot = cells.agg(sum("c1").as("n1"), sum("c2").as("n2"),
        count(lit(1)).as("n_types"))
      cells.crossJoin(broadcast(tot))
        .filter(col("n1") > 0 && col("n2") > 0)
        .groupBy("n_types", "n1", "n2")
        .agg(sum(expr(
          """abs(CAST(c1 AS DECIMAL(38,0)) * n2
            | - CAST(c2 AS DECIMAL(38,0)) * n1)"""
            .stripMargin.replace("\n", " "))).as("num"))
        .select(col("n_types"), col("n1"), col("n2"),
          expr("""CAST(num * 1000000
                 | DIV (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("tv_fp"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "sprt_conversion_monitor" ->
      s"""WITH perday AS (
         |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN event_type = 'purchase'
         |                  THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM events GROUP BY 1),
         |t AS (SELECT day, n, k, $sprtTermSql AS llr_fp FROM perday),
         |c AS (
         |  SELECT day, n, k, llr_fp,
         |         CAST(sum(llr_fp) OVER (ORDER BY day) AS BIGINT)
         |           AS cum_llr_fp
         |  FROM t)
         |SELECT day, n, k, llr_fp, cum_llr_fp,
         |       CASE WHEN cum_llr_fp >= $SprtUpFp THEN 'reject_h0'
         |            WHEN cum_llr_fp <= $SprtLoFp THEN 'accept_h0'
         |            ELSE 'continue' END AS decision
         |FROM c ORDER BY day""".stripMargin,
    "psi_value_drift" ->
      s"""WITH ev AS (
         |  SELECT event_id,
         |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di,
         |         CAST(round(value * 1000) AS BIGINT) AS v_fp
         |  FROM events),
         |mind AS (SELECT min(di) AS min_di FROM ev),
         |tagged AS (
         |  SELECT e.event_id, e.v_fp,
         |         CASE WHEN e.di - m.min_di < 15 THEN 'ref' ELSE 'cur' END
         |           AS cohort
         |  FROM ev e CROSS JOIN mind m),
         |totals AS (
         |  SELECT CAST(sum(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_ref,
         |         CAST(sum(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_cur
         |  FROM tagged),
         |ref AS (
         |  SELECT v_fp, row_number() OVER (ORDER BY v_fp, event_id) AS rn
         |  FROM tagged WHERE cohort = 'ref'),
         |targets AS (
         |  SELECT i, (i * t.n_ref) // 10 AS target
         |  FROM range(1, 10) r(i) CROSS JOIN totals t
         |  WHERE (i * t.n_ref) // 10 >= 1),
         |edges AS (
         |  SELECT t.i, r.v_fp AS b FROM ref r
         |  JOIN targets t ON r.rn = t.target),
         |binned AS (
         |  SELECT g.event_id, g.cohort,
         |         CAST(count(e.b) FILTER (WHERE g.v_fp > e.b) AS BIGINT)
         |           AS bin
         |  FROM tagged g LEFT JOIN edges e ON TRUE
         |  GROUP BY g.event_id, g.cohort),
         |counts AS (
         |  SELECT bin,
         |         CAST(sum(CASE WHEN cohort = 'ref' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS c_ref,
         |         CAST(sum(CASE WHEN cohort = 'cur' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS c_cur
         |  FROM binned GROUP BY bin),
         |grid AS (SELECT CAST(i AS BIGINT) AS bin FROM range(0, 10) r(i)),
         |f AS (
         |  SELECT g.bin, COALESCE(c.c_ref, 0) AS c_ref,
         |         COALESCE(c.c_cur, 0) AS c_cur, t.n_ref, t.n_cur
         |  FROM grid g LEFT JOIN counts c ON c.bin = g.bin
         |  CROSS JOIN totals t)
         |SELECT bin, c_ref, c_cur,
         |       CAST(FLOOR((
         |         (CAST(c_ref + $PsiSmooth AS DOUBLE) / (n_ref + $PsiBins))
         |         - (CAST(c_cur + $PsiSmooth AS DOUBLE) / (n_cur + $PsiBins)))
         |         * ln(((CAST(c_ref + $PsiSmooth AS DOUBLE) / (n_ref + $PsiBins)))
         |            / ((CAST(c_cur + $PsiSmooth AS DOUBLE) / (n_cur + $PsiBins))))
         |         * 1000000000.0) AS BIGINT) AS term_fp
         |FROM f ORDER BY bin""".stripMargin,

    "position_based_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |seq AS (
        |  SELECT *, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
        |              ELSE 0 END) OVER (PARTITION BY user_id
        |              ORDER BY us, event_id) AS BIGINT) AS cum_p
        |  FROM ev),
        |touches AS (
        |  SELECT user_id, cum_p + 1 AS jid, event_id, event_type, us
        |  FROM seq WHERE event_type <> 'purchase'),
        |purch AS (
        |  SELECT user_id, cum_p AS jid, cents AS pcents
        |  FROM seq WHERE event_type = 'purchase'),
        |credited AS (
        |  SELECT t.event_type, p.pcents,
        |         CASE WHEN t.k = 1 THEN 10000
        |              WHEN t.k = 2 THEN 5000
        |              WHEN t.pos = 1 OR t.pos = t.k THEN 4000
        |              ELSE 2000 // (t.k - 2)
        |                   + CASE WHEN t.pos - 1 <= 2000 % (t.k - 2)
        |                     THEN 1 ELSE 0 END
        |         END AS bps
        |  FROM (SELECT *,
        |          CAST(row_number() OVER (PARTITION BY user_id, jid
        |            ORDER BY us, event_id) AS BIGINT) AS pos,
        |          CAST(count(*) OVER (PARTITION BY user_id, jid)
        |            AS BIGINT) AS k
        |        FROM touches) t
        |  JOIN purch p ON p.user_id = t.user_id AND p.jid = t.jid)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(pcents * bps) AS BIGINT) AS attr_cents_bps
        |FROM credited GROUP BY event_type ORDER BY event_type""".stripMargin,

    "open_order_aging" ->
      """WITH ords AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS od,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderstatus <> 'F'),
        |maxd AS (SELECT max(od) AS max_od FROM ords),
        |aged AS (
        |  SELECT o.o_orderpriority, o.cents,
        |         datediff('day', o.od, m.max_od) AS age_days
        |  FROM ords o CROSS JOIN maxd m),
        |banded AS (
        |  SELECT CASE WHEN age_days <= 30 THEN '0-030d'
        |              WHEN age_days <= 90 THEN '031-090d'
        |              WHEN age_days <= 180 THEN '091-180d'
        |              WHEN age_days <= 365 THEN '181-365d'
        |              ELSE '365d+' END AS age_band,
        |         o_orderpriority, cents
        |  FROM aged)
        |SELECT age_band, o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM banded GROUP BY age_band, o_orderpriority
        |ORDER BY age_band, o_orderpriority""".stripMargin,

    // same pooled-support grid / cross-multiplied CDF integral; the
    // fold lifts to HUGEINT and divides once at the BIGINT boundary
    "wasserstein_doclen_drift" ->
      """WITH lens AS MATERIALIZED (
        |  SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS l
        |  FROM documents),
        |sl AS MATERIALIZED (
        |  SELECT source, l, CAST(count(*) AS BIGINT) AS c
        |  FROM lens GROUP BY 1, 2),
        |al AS MATERIALIZED (
        |  SELECT l, CAST(sum(c) AS BIGINT) AS c_all FROM sl GROUP BY 1),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src
        |       FROM sl GROUP BY 1),
        |na AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all FROM al),
        |gaps AS MATERIALIZED (
        |  SELECT l, lead(l) OVER (ORDER BY l) AS nxt,
        |         CAST(sum(c_all) OVER (ORDER BY l) AS BIGINT) AS cum_all
        |  FROM al),
        |grid AS MATERIALIZED (
        |  SELECT st.source, st.n_src, g.l, g.nxt, g.cum_all,
        |         coalesce(sl.c, 0) AS c
        |  FROM st CROSS JOIN gaps g
        |  LEFT JOIN sl ON sl.source = st.source AND sl.l = g.l),
        |cum AS (
        |  SELECT source, n_src, l, nxt, cum_all,
        |         CAST(sum(c) OVER (PARTITION BY source ORDER BY l)
        |           AS BIGINT) AS cum_src
        |  FROM grid)
        |SELECT source, n_src, n_all,
        |       CAST(sum(CASE WHEN nxt IS NULL THEN CAST(0 AS HUGEINT)
        |              ELSE abs(CAST(cum_src AS HUGEINT) * n_all
        |                     - CAST(cum_all AS HUGEINT) * n_src)
        |                   * (nxt - l) END) * 1000000
        |         // (CAST(n_src AS HUGEINT) * n_all) AS BIGINT) AS w1_fp
        |FROM cum CROSS JOIN na
        |GROUP BY source, n_src, n_all ORDER BY source""".stripMargin,

    "total_variation_event_drift" ->
      """WITH cells AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 >= 5
        |             THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7 >= 5
        |             THEN 0 ELSE 1 END) AS BIGINT) AS c2
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2,
        |               CAST(count(*) AS BIGINT) AS n_types FROM cells)
        |SELECT n_types, n1, n2,
        |       CAST(sum(abs(CAST(c1 AS HUGEINT) * n2
        |                  - CAST(c2 AS HUGEINT) * n1)) * 1000000
        |         // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS tv_fp
        |FROM cells CROSS JOIN tot
        |WHERE n1 > 0 AND n2 > 0
        |GROUP BY n_types, n1, n2""".stripMargin,
  )
}
