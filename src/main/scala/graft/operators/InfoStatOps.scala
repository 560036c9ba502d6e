package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Information-theory and distribution-drift statistics (round-10
  * widening): the monitoring layer a training-data pipeline runs to
  * detect MIX drift — a source whose unigram distribution diverges from
  * the corpus, an event stream whose weekday profile stops being
  * independent, a metric whose distribution shifts between cohorts, a
  * per-entity trend robust to outlier months. The reference stages its
  * corpus for exactly this kind of SQL analytics
  * (`/root/reference/app.py:129-152` loads staged JSON into BigQuery;
  * `/root/reference/README.md:180-205` declares the analysis tables);
  * these rows are the Spark-native equivalents.
  *
  * Determinism & scale design (the StatOps/LangModelOps discipline):
  *   - Every log/ratio statistic is FLOOR-truncated to fixed-point
  *     BIGINT at the LEAF — each leaf double is a deterministic IEEE
  *     expression over exact int64 inputs (identical parse tree on both
  *     engines) — then integer-summed / integer-maxed, both
  *     order-free, so any partial-agg layout at 100 TB matches DuckDB
  *     bit-for-bit.
  *   - State is DOMAIN-bounded, never corpus-bounded: unigram tables are
  *     vocab-sized, contingency grids are enum²-sized, the KS support is
  *     the fixed-point value domain, Theil-Sen pairs are C(months, 2)
  *     per entity (calendar-bounded). The corpus/event stream only ever
  *     flows through map-side-combinable counts.
  *   - Running sums over the KS support route through
  *     [[graft.functions.GlobalRank.prefixSum]] — the two-phase sliced
  *     prefix sum — never a partition-less window.
  *   - Pair generation (Theil-Sen) is by per-group ARRAY EXPANSION of
  *     the collected month series, not a self-join: a hot join key
  *     cannot blow a task, and the per-group array is calendar-bounded.
  */
object InfoStatOps extends OpGroup {

  /** Per-(source, word) KL contribution in 1e-9 fixed point:
    * `(c/n_src) · ln(c·N / (n_src·c_w))`. All identifiers are exact
    * int64 counts, so the identical expression text evaluates to
    * bit-identical doubles in Spark and DuckDB.
    */
  private val klTermSql =
    """CAST(FLOOR((CAST(c AS DOUBLE) / n_src)
      | * ln(CAST(c AS DOUBLE) * n_tot / (CAST(n_src AS DOUBLE) * cw))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** JS shared-vocab leaves in 1e-9 fp: side-a term
    * p·ln(2p/(p+q)) with p = ca/na, q = cb/nb spelled over exact
    * integer counts (2p/(p+q) = 2·ca·nb/(ca·nb + cb·na)); identical
    * text both engines. The b-side term mirrors with a/b swapped.
    */
  private val jsTermASql =
    """CAST(FLOOR(CAST(ca AS DOUBLE) / na
      | * ln(2.0 * CAST(ca AS DOUBLE) * nb
      |      / (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  private val jsTermBSql =
    """CAST(FLOOR(CAST(cb AS DOUBLE) / nb
      | * ln(2.0 * CAST(cb AS DOUBLE) * na
      |      / (CAST(cb AS DOUBLE) * na + CAST(ca AS DOUBLE) * nb))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** JS exclusive-mass leaf: Σ_{w only in one source} p·ln2 =
    * (n − sh)/n · ln 2, one FLOOR'd leaf per side; identifier names
    * parameterized so the oracle can qualify them, operation tree
    * identical.
    */
  private def jsExclSql(n: String, sh: String): String =
    s"""CAST(FLOOR(CAST($n - $sh AS DOUBLE) / $n * ln(2.0)
       | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  private val jsExclASql = jsExclSql("na", "shca")
  private val jsExclBSql = jsExclSql("nb", "shcb")

  /** Per-cell χ² contribution (O−E)²/E in 1e-6 fixed point, E spelled
    * inline as rt·ct/N so both engines build the same doubles.
    */
  private val chi2TermSql =
    """CAST(FLOOR((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n_tot)
      | * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n_tot)
      | / (CAST(rt AS DOUBLE) * ct / n_tot) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  /** Per-support-point KS CDF gap in 1e-9 fixed point. */
  /** Welch t and Welch–Satterthwaite df as ONE shared IEEE formula
    * string over the exact-moment columns (n1, n2, sv1, sv2, vn1,
    * vn2) — both engines parse the identical text; the wide variance
    * numerators vn = n·Σv² − (Σv)² are DECIMAL(38,0) on Spark and
    * HUGEINT on DuckDB, but CAST AS DOUBLE of equal integers is the
    * same double, so every IEEE operation after is bit-identical.
    * a = vn/(n²(n−1)) is s²/n; t = Δmean/√(a1+a2);
    * df = (a1+a2)²/(a1²/(n1−1)+a2²/(n2−1)). FLOOR'd ppm.
    */
  private def welchA(vn: String, n: String) =
    s"(CAST($vn AS DOUBLE) / (CAST($n AS DOUBLE) * ($n - 1) * $n))"
  private[operators] val welchTSql =
    s"""CAST(FLOOR((CAST(sv1 AS DOUBLE) / n1 - CAST(sv2 AS DOUBLE) / n2)
       | / sqrt(${welchA("vn1", "n1")} + ${welchA("vn2", "n2")})
       | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")
  private[operators] val welchDfSql =
    s"""CAST(FLOOR((${welchA("vn1", "n1")} + ${welchA("vn2", "n2")})
       | * (${welchA("vn1", "n1")} + ${welchA("vn2", "n2")})
       | / (${welchA("vn1", "n1")} * ${welchA("vn1", "n1")} / (n1 - 1)
       |    + ${welchA("vn2", "n2")} * ${welchA("vn2", "n2")} / (n2 - 1))
       | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  private val ksGapSql =
    """CAST(FLOOR(abs(CAST(cum1 AS DOUBLE) / n1 - CAST(cum2 AS DOUBLE) / n2)
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Per-(lang, source) mutual-information contribution in 1e-9 fixed
    * point: `(o/N) · ln(o·N / (cl·cs))`. Zero cells contribute exactly
    * 0 (lim p·ln p = 0), so the observed-cell grid is the full sum.
    */
  private val miTermSql =
    """CAST(FLOOR((CAST(o AS DOUBLE) / n_docs)
      | * ln(CAST(o AS DOUBLE) * n_docs / (CAST(cl AS DOUBLE) * cs))
      | * 1000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Dyadic trailing-8 EWMA numerator in 1/256 units — weights
    * 128,64,32,16,8,4,2,2 over lag1..lag8 (exact powers of two summing
    * to 256, so the whole statistic stays in int64).
    */
  private val ewmaNumSql =
    "128*l1 + 64*l2 + 32*l3 + 16*l4 + 8*l5 + 4*l6 + 2*l7 + 2*l8"

  /** Theil-Sen pairwise slope in 1e-6 fixed point (cents per month). */
  private val tsSlopeSql =
    "CAST(FLOOR(CAST(r2 - r1 AS DOUBLE) / (m2 - m1) * 1000000.0) AS BIGINT)"

  /** Per-shared-type Bhattacharyya term √(p·q) in 1e-12 fixed point:
    * the per-term ratio form √((ca/na)·(cb/nb)) keeps every term ≤ 1,
    * so the vocab sum stays ≤ 1e12 + truncation slack in int64 at ANY
    * corpus size (the √(ca·cb)·scale form would overflow at ~1e12
    * tokens per type). All four operands are exact integers cast to
    * DOUBLE in identical text — both engines build the same doubles.
    */
  private val bcTermSql =
    """CAST(FLOOR(sqrt((CAST(ca AS DOUBLE) / na) * (CAST(cb AS DOUBLE) / nb))
      | * 1000000000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Hellinger distance √(1 − BC) in 1e-6 fixed point over the summed
    * 1e-12 BC; greatest() guards the BC ≈ 1 truncation edge.
    */
  private def hellSql(sumFp: String) =
    s"""CAST(FLOOR(sqrt(greatest(0.0,
       | 1.0 - CAST($sumFp AS DOUBLE) / 1000000000000.0))
       | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Y1 — per-source unigram KL divergence vs the corpus distribution:
    // THE mixture-drift gauge (a source whose KL explodes is templated /
    // off-distribution; DoReMi-style mixture tuning consumes exactly
    // this number). The corpus collapses to the (source, word) count
    // table map-side; the word-marginal join is vocab-bounded on both
    // sides; per-source totals (20 rows) and the corpus total (1 row)
    // broadcast. KL(p_s || p_corpus) >= 0 by Gibbs — pinned in spec.
    // Pairwise Jensen–Shannon divergence between source unigram
    // distributions (r12, third session): the SYMMETRIC, ln2-bounded
    // distance matrix over sources — kl_divergence_source_unigram
    // reads each source against the corpus; JS answers "which two
    // sources are interchangeable and which bring genuinely different
    // text" (the mixture-design read; Lin 1991). Split exactly into
    // shared-vocab terms (p·ln(2p/(p+q)) per side, integer args
    // inside the ln) and EXCLUSIVE-mass terms (a word only in s
    // contributes p·ln2 — dropping these, the classic bug, caps JS
    // below its true value), each FLOOR'd at 1e-9 then
    // integer-summed. The pair grid is |sources|²-bounded and LEFT
    // joins the shared aggregate so a disjoint-vocab pair still
    // reports (its JS = ln2 exactly). The vocab-pair join is the
    // only data-proportional pass.
    "js_divergence_sources" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val ns = sw.groupBy("source").agg(sum("c").as("n"))
      val a = sw.select(col("source").as("src_a"), col("w"),
        col("c").as("ca"))
        .join(broadcast(ns.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
      val b = sw.select(col("source").as("src_b"), col("w"),
        col("c").as("cb"))
        .join(broadcast(ns.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
      val shared = a.join(b, "w").filter(col("src_a") < col("src_b"))
        .withColumn("ta", expr(jsTermASql))
        .withColumn("tb", expr(jsTermBSql))
        .groupBy("src_a", "src_b")
        .agg(sum(expr("ta + tb")).as("shared_fp"),
          sum("ca").as("shca"), sum("cb").as("shcb"),
          count(lit(1)).as("n_shared_types"))
      val pairs = ns.select(col("source").as("src_a"), col("n").as("na"))
        .crossJoin(ns.select(col("source").as("src_b"), col("n").as("nb")))
        .filter(col("src_a") < col("src_b"))
      broadcast(pairs).join(shared, Seq("src_a", "src_b"), "left")
        .withColumn("shared_fp", coalesce(col("shared_fp"), lit(0L)))
        .withColumn("shca", coalesce(col("shca"), lit(0L)))
        .withColumn("shcb", coalesce(col("shcb"), lit(0L)))
        .withColumn("n_shared_types",
          coalesce(col("n_shared_types"), lit(0L)))
        .withColumn("js_fp", expr(
          s"""(shared_fp + $jsExclASql + $jsExclBSql) DIV 2"""))
        .select("src_a", "src_b", "na", "nb", "n_shared_types", "js_fp")
        .orderBy("src_a", "src_b")
    }),

    // Y32 — pairwise Bhattacharyya coefficient + Hellinger distance
    // between source unigram distributions: the METRIC companion to
    // js_divergence_sources (Hellinger satisfies the triangle
    // inequality, so it supports clustering sources / nearest-mixture
    // queries where JS's square root is only a metric up to √·), and
    // BC is the direct overlap mass retrieval re-rankers consume.
    // Only SHARED types contribute (√(p·0) = 0), so unlike JS there
    // is no exclusive-mass term — a disjoint pair reads BC = 0,
    // Hellinger = 1 exactly via the LEFT-join default. Per-term
    // √((ca/na)(cb/nb)) FLOOR'd at 1e-12 and integer-summed (term ≤ 1
    // ⇒ vocab sum ≤ 1e12, int64-safe at any corpus); Hellinger is one
    // shared-text IEEE leaf over the exact sum. The vocab-pair join
    // is the only data-proportional pass (the JS shape).
    "bhattacharyya_hellinger_sources" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val ns = sw.groupBy("source").agg(sum("c").as("n"))
      val a = sw.select(col("source").as("src_a"), col("w"),
        col("c").as("ca"))
        .join(broadcast(ns.select(col("source").as("src_a"),
          col("n").as("na"))), "src_a")
      val b = sw.select(col("source").as("src_b"), col("w"),
        col("c").as("cb"))
        .join(broadcast(ns.select(col("source").as("src_b"),
          col("n").as("nb"))), "src_b")
      val shared = a.join(b, "w").filter(col("src_a") < col("src_b"))
        .withColumn("t_fp", expr(bcTermSql))
        .groupBy("src_a", "src_b")
        .agg(sum("t_fp").as("bc_fp"), count(lit(1)).as("n_shared_types"))
      val pairs = ns.select(col("source").as("src_a"), col("n").as("na"))
        .crossJoin(ns.select(col("source").as("src_b"), col("n").as("nb")))
        .filter(col("src_a") < col("src_b"))
      broadcast(pairs).join(shared, Seq("src_a", "src_b"), "left")
        .withColumn("bc_fp", coalesce(col("bc_fp"), lit(0L)))
        .withColumn("n_shared_types",
          coalesce(col("n_shared_types"), lit(0L)))
        .select(col("src_a"), col("src_b"), col("na"), col("nb"),
          col("n_shared_types"), col("bc_fp"),
          expr(hellSql("bc_fp")).as("hellinger_fp"))
        .orderBy("src_a", "src_b")
    }),

    "kl_divergence_source_unigram" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val ns = sw.groupBy("source").agg(sum("c").as("n_src"))
      val wf = sw.groupBy("w").agg(sum("c").as("cw"))
      val tot = wf.agg(sum("cw").as("n_tot"))
      sw.join(wf, Seq("w"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(tot))
        .withColumn("term_fp", expr(klTermSql))
        .groupBy("source")
        .agg(max("n_src").as("n_tokens"), count(lit(1)).as("n_types"),
          sum("term_fp").as("kl_fp"))
        .orderBy("source")
    }),

    // Y2 — χ² independence test, event_type × weekday: the seasonality
    // drift tripwire (a product stream whose type mix stops being
    // day-independent changed behavior). Full enum² grid from the two
    // broadcast margins (missing cells count as O=0 — their (O−E)²/E
    // mass is real); one broadcast outer join; the event stream itself
    // only flows through one map-side-combinable count.
    "chi2_event_weekday_independence" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("(unix_micros(ts) DIV 86400000000 + 4) % 7").as("dow"))
      val cells = ev.groupBy("event_type", "dow").agg(count(lit(1)).as("oc"))
      val rt = cells.groupBy("event_type").agg(sum("oc").as("rt"))
      val ct = cells.groupBy("dow").agg(sum("oc").as("ct"))
      val n = cells.agg(sum("oc").as("n_tot"))
      rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
        .join(broadcast(cells), Seq("event_type", "dow"), "left")
        .withColumn("o", coalesce(col("oc"), lit(0L)))
        .withColumn("term_fp", expr(chi2TermSql))
        .agg(max("n_tot").as("n_events"), count(lit(1)).as("n_cells"),
          ((countDistinct("event_type") - 1) * (countDistinct("dow") - 1))
            .cast("long").as("dof"),
          sum("term_fp").as("chi2_fp"))
    }),

    // Y3 — two-sample Kolmogorov–Smirnov distance between the `value`
    // distributions of click vs purchase events: the distribution-shift
    // detector run between cohorts / releases. The event stream
    // collapses to per-fixed-point-value counts FIRST (support-bounded
    // state — the 1e-3-quantized value domain, NOT the event count);
    // both CDFs are GlobalRank two-phase prefix sums over that support;
    // the gap is FLOOR-fixed-pointed per support point and max-reduced
    // (order-free). No partition-less window anywhere.
    // Welch's unequal-variance t (r12): the parametric companion to
    // ks_two_sample_value / mann_whitney over the SAME two samples
    // (click vs purchase event values) — t and the Welch–Satterthwaite
    // df from exact integer moments (Σv int64, Σv² lifted to
    // DECIMAL(38,0)/HUGEINT, variance numerators n·Σv²−(Σv)² exact),
    // then ONE shared IEEE formula string both engines parse
    // identically; FLOOR'd ppm outputs. One map-side-combinable
    // conditional-aggregate pass; the report is a single row.
    "welch_t_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
      ev.agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n2"),
          sum(when(col("event_type") === "click", col("v")).otherwise(0L))
            .as("sv1"),
          sum(when(col("event_type") === "purchase", col("v")).otherwise(0L))
            .as("sv2"),
          sum(when(col("event_type") === "click",
            expr("CAST(v AS DECIMAL(38,0)) * v")).otherwise(lit(0)))
            .as("svv1"),
          sum(when(col("event_type") === "purchase",
            expr("CAST(v AS DECIMAL(38,0)) * v")).otherwise(lit(0)))
            .as("svv2"))
        .withColumn("vn1",
          expr("CAST(n1 AS DECIMAL(38,0)) * svv1 - CAST(sv1 AS DECIMAL(38,0)) * sv1"))
        .withColumn("vn2",
          expr("CAST(n2 AS DECIMAL(38,0)) * svv2 - CAST(sv2 AS DECIMAL(38,0)) * sv2"))
        .withColumn("t_fp", expr(InfoStatOps.welchTSql))
        .withColumn("df_fp", expr(InfoStatOps.welchDfSql))
        .select("n1", "n2", "t_fp", "df_fp")
    }),

    "ks_two_sample_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val sup = ev.groupBy("v_fp").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val tot = sup.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      val cum1 = graft.functions.GlobalRank
        .prefixSum(sup, "cum1", col("c1"), Nil, Seq("v_fp"))
      val cum = graft.functions.GlobalRank
        .prefixSum(cum1, "cum2", col("c2"), Nil, Seq("v_fp"))
      cum.crossJoin(broadcast(tot))
        .withColumn("d_fp", expr(ksGapSql))
        .groupBy("n1", "n2").agg(max("d_fp").as("ks_fp"))
        .select(col("n1"), col("n2"), col("ks_fp"))
    }),

    // Y4 — EWMA control chart: per-user dyadic trailing-8 EWMA of the
    // PRIOR eight values (weights 2^-1..2^-7, oldest doubled to close
    // the geometric tail — exact /256 integer arithmetic), flagging the
    // 50 largest |current − EWMA| deviations. One bounded-frame window
    // per user over the total (ts, event_id) order; all math int64;
    // TakeOrdered(50) resolves the global top — no global sort.
    "ewma_control_chart" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      (1 to 8).foldLeft(ev)((df, k) =>
          df.withColumn(s"l$k", lag(col("v_fp"), k).over(w)))
        .filter(col("l8").isNotNull)
        .withColumn("ewma_num", expr(ewmaNumSql))
        .withColumn("dev_num", expr("256 * v_fp - ewma_num"))
        .select("user_id", "event_id", "v_fp", "ewma_num", "dev_num")
        .orderBy(abs(col("dev_num")).desc, col("user_id"), col("event_id"))
        .limit(50)
    }),

    // Y5 — Theil–Sen robust trend per nation: the median of all
    // pairwise monthly-revenue slopes — the outlier-immune answer to
    // ols_trend_fixed (one wild month cannot move a median slope).
    // Pair generation is per-nation ARRAY EXPANSION of the collected
    // month series (C(months,2) ≤ C(84,2) = 3486 pairs — CALENDAR-
    // bounded, so the per-group state cannot grow with data volume),
    // never a self-join; the median is rank-defined (lower median over
    // (slope, m1, m2)) inside a bounded per-nation window.
    "theil_sen_nation_trend" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val nm = ords
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "mi").agg(sum("cents").as("rev"))
      val pairs = nm.groupBy("n_name")
        .agg(sort_array(collect_list(struct(col("mi"), col("rev")))).as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("n_name"), explode(expr(
          """flatten(transform(sequence(0, size(a) - 2), i ->
            |  transform(sequence(i + 1, size(a) - 1), j ->
            |    named_struct('m1', a[i].mi, 'r1', a[i].rev,
            |                 'm2', a[j].mi, 'r2', a[j].rev))))"""
            .stripMargin.replace("\n", " "))).as("p"))
        .select(col("n_name"), col("p.m1").as("m1"), col("p.m2").as("m2"),
          expr(tsSlopeSql.replace("r2 - r1", "p.r2 - p.r1")
            .replace("m2 - m1", "p.m2 - p.m1")).as("slope_fp"))
      val wn = Window.partitionBy("n_name")
        .orderBy(col("slope_fp"), col("m1"), col("m2"))
      pairs
        .withColumn("rn", row_number().over(wn).cast("long"))
        .withColumn("n_pairs",
          count(lit(1)).over(Window.partitionBy("n_name")))
        .filter(expr("rn = (n_pairs + 1) DIV 2"))
        .select(col("n_name"), col("n_pairs"),
          col("slope_fp").as("ts_slope_fp"))
        .orderBy("n_name")
    }),

    // Y6 — mutual information lang × source over documents: how much a
    // document's source predicts its language — the mixture-design
    // number behind per-source language balancing. Observed-cell grid
    // (zero cells contribute exactly 0), two broadcast margins, one
    // broadcast total; the corpus flows through one count. MI >= 0
    // pinned in spec.
    "mutual_information_lang_source" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rl = c.groupBy("lang").agg(sum("o").as("cl"))
      val rs = c.groupBy("source").agg(sum("o").as("cs"))
      val n = c.agg(sum("o").as("n_docs"))
      c.join(broadcast(rl), Seq("lang"))
        .join(broadcast(rs), Seq("source"))
        .crossJoin(broadcast(n))
        .withColumn("term_fp", expr(miTermSql))
        .agg(max("n_docs").as("n_docs"), count(lit(1)).as("n_cells"),
          sum("term_fp").as("mi_fp"))
    }),

    // Quantile–quantile decile table (r12, fifth session): the nine
    // rank-defined lower deciles of the click and purchase value
    // distributions side by side with their gaps — the DIAGNOSTIC
    // companion to the scalar two-sample panel (KS/energy/Wasserstein
    // say "they differ"; the QQ table says WHERE — head, body, or
    // tail). Deciles are the psi_value_drift convention (value at
    // rank ⌊i·n/10⌋ via the per-group two-phase prefix sum — no
    // engine quantile interpolation anywhere); everything downstream
    // of the support aggregate is ≤ 9·2 rows.
    "qq_deciles_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
      val sup = ev.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val cum = graft.functions.GlobalRank
        .prefixSum(sup, "cum", col("c"), Seq("g"), Seq("v"))
      val targets = ev.groupBy("g").agg(count(lit(1)).as("n"))
        .select(col("g"), explode(expr("sequence(1, 9)")).as("i"),
          col("n"))
        .withColumn("target", expr("(i * n) DIV 10"))
        .filter(col("target") >= 1)
        .select("g", "i", "target")
      cum.join(broadcast(targets), Seq("g"))
        .filter(col("cum") >= col("target"))
        .groupBy("g", "i").agg(min("v").as("qv"))
        .groupBy("i")
        .agg(max(when(col("g") === "click", col("qv"))).as("q_click"),
          max(when(col("g") === "purchase", col("qv"))).as("q_purchase"))
        .withColumn("gap", col("q_purchase") - col("q_click"))
        .select(col("i").cast("long").as("decile"), col("q_click"),
          col("q_purchase"), col("gap"))
        .orderBy("decile")
    }),

    // Energy distance between the click and purchase value
    // distributions (r12, fifth session; Székely & Rizzo 2004):
    // D² = 2E|X−Y| − E|X−X'| − E|Y−Y'| — the metric-aware two-sample
    // read completing the panel: KS takes the sup of the CDF gap,
    // Wasserstein its L1, energy its (weighted) L2; unlike the t/U
    // tests it is consistent against ANY distributional alternative.
    // ALL THREE pairwise-|difference| sums are EXACT without pairs:
    // over the sorted value support, Σ_x|x−v| = v·F(v) − S(v) +
    // (S_tot−S(v)) − v·(n−F(v)) from the (count, value·count) prefix
    // sums — so Sxy/Sxx/Syy fold off FOUR chained two-phase prefix
    // sums (jonckheere precedent) with DECIMAL(38,0)/HUGEINT lifts;
    // the V-statistic combination (nonneg by Székely's theorem) does
    // ONE floored division. Support-bounded everywhere; envelope:
    // sums ≤ n·m·range ≈ 2e16 at sf0.1, int64 output boundary
    // documented to ~1e9 events/side.
    "energy_distance_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
      val sup0 = ev.groupBy("v").agg(
        sum(when(col("g") === "click", 1L).otherwise(0L)).as("cx"),
        sum(when(col("g") === "purchase", 1L).otherwise(0L)).as("cy"))
      val gr = graft.functions.GlobalRank
      val sup = gr.prefixSum(
        gr.prefixSum(
          gr.prefixSum(
            gr.prefixSum(sup0, "cum_x", col("cx"), Nil, Seq("v")),
            "cum_sx", expr("cx * v"), Nil, Seq("v")),
          "cum_y", col("cy"), Nil, Seq("v")),
        "cum_sy", expr("cy * v"), Nil, Seq("v"))
      val tot = sup0.agg(sum("cx").as("n1"), sum("cy").as("n2"),
        sum(expr("cx * v")).as("tsx"), sum(expr("cy * v")).as("tsy"))
      val f = sup.crossJoin(broadcast(tot))
        .withColumn("abs_x", expr(
          "v * cum_x - cum_sx + (tsx - cum_sx) - v * (n1 - cum_x)"))
        .withColumn("abs_y", expr(
          "v * cum_y - cum_sy + (tsy - cum_sy) - v * (n2 - cum_y)"))
        .agg(
          sum(expr("CAST(cy AS DECIMAL(38,0)) * abs_x")).as("sxy"),
          sum(expr("CAST(cx AS DECIMAL(38,0)) * abs_x")).as("sxx"),
          sum(expr("CAST(cy AS DECIMAL(38,0)) * abs_y")).as("syy"))
      f.crossJoin(broadcast(tot))
        .filter(col("n1") > 0 && col("n2") > 0)
        .select(col("n1"), col("n2"),
          col("sxy").cast("long").as("sxy"),
          col("sxx").cast("long").as("sxx"),
          col("syy").cast("long").as("syy"),
          expr("""CAST((2 * sxy * n1 * n2
                 |  - sxx * (CAST(n2 AS DECIMAL(38,0)) * n2)
                 |  - syy * (CAST(n1 AS DECIMAL(38,0)) * n1)) * 1000000
                 | DIV (CAST(n1 AS DECIMAL(38,0)) * n1 * n2 * n2)
                 | AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("e_dist_fp"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "js_divergence_sources" ->
      s"""WITH sw AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |swc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
         |        FROM sw GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM swc
         |       GROUP BY 1),
         |shared AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(sum($jsTermASql + $jsTermBSql) AS BIGINT)
         |           AS shared_fp,
         |         CAST(sum(a.ca) AS BIGINT) AS shca,
         |         CAST(sum(b.cb) AS BIGINT) AS shcb,
         |         CAST(count(*) AS BIGINT) AS n_shared_types
         |  FROM (SELECT swc.source, swc.w, swc.c AS ca, ns.n AS na
         |        FROM swc JOIN ns USING (source)) a
         |  JOIN (SELECT swc.source, swc.w, swc.c AS cb, ns.n AS nb
         |        FROM swc JOIN ns USING (source)) b
         |    ON a.w = b.w AND a.source < b.source
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         a.n AS na, b.n AS nb
         |  FROM ns a JOIN ns b ON a.source < b.source)
         |SELECT p.src_a, p.src_b, p.na, p.nb,
         |       CAST(COALESCE(s.n_shared_types, 0) AS BIGINT)
         |         AS n_shared_types,
         |       CAST((COALESCE(s.shared_fp, 0)
         |         + ${jsExclSql("p.na", "COALESCE(s.shca, 0)")}
         |         + ${jsExclSql("p.nb", "COALESCE(s.shcb, 0)")}) // 2
         |         AS BIGINT) AS js_fp
         |FROM pairs p LEFT JOIN shared s
         |  ON s.src_a = p.src_a AND s.src_b = p.src_b
         |ORDER BY p.src_a, p.src_b""".stripMargin,

    "bhattacharyya_hellinger_sources" ->
      s"""WITH sw AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |swc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
         |        FROM sw GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM swc
         |       GROUP BY 1),
         |shared AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(sum($bcTermSql) AS BIGINT) AS bc_fp,
         |         CAST(count(*) AS BIGINT) AS n_shared_types
         |  FROM (SELECT swc.source, swc.w, swc.c AS ca, ns.n AS na
         |        FROM swc JOIN ns USING (source)) a
         |  JOIN (SELECT swc.source, swc.w, swc.c AS cb, ns.n AS nb
         |        FROM swc JOIN ns USING (source)) b
         |    ON a.w = b.w AND a.source < b.source
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         a.n AS na, b.n AS nb
         |  FROM ns a JOIN ns b ON a.source < b.source)
         |SELECT p.src_a, p.src_b, p.na, p.nb,
         |       CAST(COALESCE(s.n_shared_types, 0) AS BIGINT)
         |         AS n_shared_types,
         |       CAST(COALESCE(s.bc_fp, 0) AS BIGINT) AS bc_fp,
         |       ${hellSql("COALESCE(s.bc_fp, 0)")} AS hellinger_fp
         |FROM pairs p LEFT JOIN shared s
         |  ON s.src_a = p.src_a AND s.src_b = p.src_b
         |ORDER BY p.src_a, p.src_b""".stripMargin,

    // same exact moments (HUGEINT squares), same shared IEEE formula
    "welch_t_value" ->
      s"""WITH ev AS (
         |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN v ELSE 0 END)
         |      AS BIGINT) AS sv1,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END)
         |      AS BIGINT) AS sv2,
         |    sum(CASE WHEN event_type = 'click'
         |        THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS svv1,
         |    sum(CASE WHEN event_type = 'purchase'
         |        THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS svv2
         |  FROM ev),
         |w AS (
         |  SELECT n1, n2, sv1, sv2,
         |         CAST(n1 AS HUGEINT) * svv1 - CAST(sv1 AS HUGEINT) * sv1
         |           AS vn1,
         |         CAST(n2 AS HUGEINT) * svv2 - CAST(sv2 AS HUGEINT) * sv2
         |           AS vn2
         |  FROM m)
         |SELECT n1, n2,
         |       $welchTSql AS t_fp,
         |       $welchDfSql AS df_fp
         |FROM w""".stripMargin,

    "kl_divergence_source_unigram" ->
      s"""WITH sw AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |c AS (SELECT source, w, count(*) AS c FROM sw GROUP BY source, w),
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src
         |       FROM c GROUP BY source),
         |wf AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM c GROUP BY w),
         |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_tot FROM wf)
         |SELECT c.source,
         |       CAST(max(n_src) AS BIGINT) AS n_tokens,
         |       CAST(count(*) AS BIGINT) AS n_types,
         |       CAST(sum($klTermSql) AS BIGINT) AS kl_fp
         |FROM c JOIN wf USING (w) JOIN ns ON c.source = ns.source
         |CROSS JOIN tot
         |GROUP BY c.source ORDER BY c.source""".stripMargin,

    "chi2_event_weekday_independence" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
         |  FROM events),
         |cells AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS oc
         |          FROM ev GROUP BY event_type, dow),
         |rt AS (SELECT event_type, CAST(sum(oc) AS BIGINT) AS rt
         |       FROM cells GROUP BY event_type),
         |ct AS (SELECT dow, CAST(sum(oc) AS BIGINT) AS ct
         |       FROM cells GROUP BY dow),
         |n AS (SELECT CAST(sum(oc) AS BIGINT) AS n_tot FROM cells),
         |grid AS (
         |  SELECT rt.event_type, ct.dow, rt.rt, ct.ct, n.n_tot,
         |         coalesce(cells.oc, 0) AS o
         |  FROM rt CROSS JOIN ct CROSS JOIN n
         |  LEFT JOIN cells ON cells.event_type = rt.event_type
         |                 AND cells.dow = ct.dow)
         |SELECT CAST(max(n_tot) AS BIGINT) AS n_events,
         |       CAST(count(*) AS BIGINT) AS n_cells,
         |       CAST((count(DISTINCT event_type) - 1)
         |            * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
         |       CAST(sum($chi2TermSql) AS BIGINT) AS chi2_fp
         |FROM grid""".stripMargin,

    "ks_two_sample_value" ->
      s"""WITH ev AS (
         |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS v_fp
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |sup AS (
         |  SELECT v_fp,
         |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |           AS c1,
         |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS c2
         |  FROM ev GROUP BY v_fp),
         |cum AS (
         |  SELECT v_fp, sum(c1) OVER (ORDER BY v_fp) AS cum1,
         |         sum(c2) OVER (ORDER BY v_fp) AS cum2
         |  FROM sup),
         |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |               CAST(sum(c2) AS BIGINT) AS n2 FROM sup)
         |SELECT n1, n2, max($ksGapSql) AS ks_fp
         |FROM cum CROSS JOIN tot GROUP BY n1, n2""".stripMargin,

    "ewma_control_chart" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, ts,
         |         CAST(round(value * 1000) AS BIGINT) AS v_fp
         |  FROM events),
         |lg AS (
         |  SELECT user_id, event_id, v_fp,
         |         lag(v_fp, 1) OVER w AS l1, lag(v_fp, 2) OVER w AS l2,
         |         lag(v_fp, 3) OVER w AS l3, lag(v_fp, 4) OVER w AS l4,
         |         lag(v_fp, 5) OVER w AS l5, lag(v_fp, 6) OVER w AS l6,
         |         lag(v_fp, 7) OVER w AS l7, lag(v_fp, 8) OVER w AS l8
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id, v_fp,
         |       CAST($ewmaNumSql AS BIGINT) AS ewma_num,
         |       CAST(256 * v_fp - ($ewmaNumSql) AS BIGINT) AS dev_num
         |FROM lg WHERE l8 IS NOT NULL
         |ORDER BY abs(256 * v_fp - ($ewmaNumSql)) DESC, user_id, event_id
         |LIMIT 50""".stripMargin,

    "theil_sen_nation_trend" ->
      s"""WITH nm AS (
         |  SELECT n_name,
         |         year(o_orderdate) * 12 + month(o_orderdate) AS mi,
         |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         |           AS BIGINT) AS rev
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name, mi),
         |pr AS (
         |  SELECT a.n_name, a.mi AS m1, b.mi AS m2,
         |         CAST(FLOOR(CAST(b.rev - a.rev AS DOUBLE)
         |           / (b.mi - a.mi) * 1000000.0) AS BIGINT) AS slope_fp
         |  FROM nm a JOIN nm b ON a.n_name = b.n_name AND a.mi < b.mi),
         |rk AS (
         |  SELECT n_name, m1, m2, slope_fp,
         |         row_number() OVER (PARTITION BY n_name
         |           ORDER BY slope_fp, m1, m2) AS rn,
         |         count(*) OVER (PARTITION BY n_name) AS cnt
         |  FROM pr)
         |SELECT n_name, CAST(cnt AS BIGINT) AS n_pairs,
         |       slope_fp AS ts_slope_fp
         |FROM rk WHERE rn = (cnt + 1) // 2 ORDER BY n_name""".stripMargin,

    "mutual_information_lang_source" ->
      s"""WITH c AS (
         |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
         |  FROM documents GROUP BY lang, source),
         |rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cl
         |       FROM c GROUP BY lang),
         |rs AS (SELECT source, CAST(sum(o) AS BIGINT) AS cs
         |       FROM c GROUP BY source),
         |n AS (SELECT CAST(sum(o) AS BIGINT) AS n_docs FROM c)
         |SELECT CAST(max(n_docs) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_cells,
         |       CAST(sum($miTermSql) AS BIGINT) AS mi_fp
         |FROM c JOIN rl USING (lang) JOIN rs USING (source)
         |CROSS JOIN n""".stripMargin,

    // same per-group rank-defined decile picks
    "qq_deciles_value" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT event_type AS g, CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |sup AS MATERIALIZED (
        |  SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |cum AS (SELECT g, v,
        |               CAST(sum(c) OVER (PARTITION BY g ORDER BY v)
        |                 AS BIGINT) AS cum
        |        FROM sup),
        |ns AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM sup GROUP BY 1),
        |targets AS (
        |  SELECT g, CAST(i AS BIGINT) AS i, (i * n) // 10 AS target
        |  FROM ns CROSS JOIN UNNEST(range(1, 10)) t(i)
        |  WHERE (i * n) // 10 >= 1),
        |qs AS (
        |  SELECT c.g, t.i, min(c.v) AS qv
        |  FROM cum c JOIN targets t ON t.g = c.g AND c.cum >= t.target
        |  GROUP BY c.g, t.i)
        |SELECT i AS decile,
        |       max(CASE WHEN g = 'click' THEN qv END) AS q_click,
        |       max(CASE WHEN g = 'purchase' THEN qv END) AS q_purchase,
        |       max(CASE WHEN g = 'purchase' THEN qv END)
        |         - max(CASE WHEN g = 'click' THEN qv END) AS gap
        |FROM qs GROUP BY i ORDER BY decile""".stripMargin,

    // same prefix-sum |difference| folds; HUGEINT lifts, one division
    "energy_distance_value" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT event_type AS g, CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |sup AS MATERIALIZED (
        |  SELECT v,
        |         CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cx,
        |         CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cy
        |  FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT v, cx, cy,
        |         CAST(sum(cx) OVER w AS BIGINT) AS cum_x,
        |         CAST(sum(cx * v) OVER w AS BIGINT) AS cum_sx,
        |         CAST(sum(cy) OVER w AS BIGINT) AS cum_y,
        |         CAST(sum(cy * v) OVER w AS BIGINT) AS cum_sy
        |  FROM sup WINDOW w AS (ORDER BY v)),
        |tot AS (SELECT CAST(sum(cx) AS BIGINT) AS n1,
        |               CAST(sum(cy) AS BIGINT) AS n2,
        |               CAST(sum(cx * v) AS BIGINT) AS tsx,
        |               CAST(sum(cy * v) AS BIGINT) AS tsy
        |        FROM sup),
        |f AS (
        |  SELECT
        |    sum(CAST(cy AS HUGEINT) * (v * cum_x - cum_sx
        |      + (tsx - cum_sx) - v * (n1 - cum_x))) AS sxy,
        |    sum(CAST(cx AS HUGEINT) * (v * cum_x - cum_sx
        |      + (tsx - cum_sx) - v * (n1 - cum_x))) AS sxx,
        |    sum(CAST(cy AS HUGEINT) * (v * cum_y - cum_sy
        |      + (tsy - cum_sy) - v * (n2 - cum_y))) AS syy
        |  FROM cum CROSS JOIN tot)
        |SELECT n1, n2, CAST(sxy AS BIGINT) AS sxy,
        |       CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
        |       CAST((2 * sxy * n1 * n2
        |          - sxx * (CAST(n2 AS HUGEINT) * n2)
        |          - syy * (CAST(n1 AS HUGEINT) * n1)) * 1000000
        |         // (CAST(n1 AS HUGEINT) * n1 * n2 * n2) AS BIGINT)
        |         AS e_dist_fp
        |FROM f CROSS JOIN tot WHERE n1 > 0 AND n2 > 0""".stripMargin,
  )
}
