package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics and typed-API operators (round-5 widening, SURVEY §2
  * rows X1-X3): windowed anomaly detection, per-group trend fitting, and a
  * `KeyValueGroupedDataset.cogroup` reconciliation — the monitoring /
  * drift-detection layer a production data pipeline runs beside ingestion
  * (the reference's BigQuery tables are exactly the substrate for such
  * checks, `/root/reference/terraform/main.tf:76-96`).
  *
  * Determinism & scale design:
  *   - Every statistic is computed from EXACT integer moments: measures
  *     are fixed-pointed at the leaf (`round(x·10³)`/`round(x·10²)` →
  *     BIGINT), and the window/group sums Σx, Σx² are integer sums —
  *     associative, so any partition layout matches DuckDB bit-for-bit.
  *     Doubles only appear in the FINAL scalar expression (mean/variance/
  *     slope), whose inputs are exact int64 (< 2^53, documented bounds)
  *     and whose operations (+,·,/,sqrt) are correctly-rounded IEEE —
  *     identical in both engines, no summation-order exposure.
  *   - The rolling window is rows-framed over a TOTAL order (ts,
  *     event_id), so the frame contents are engine-independent.
  *   - Trend fitting is one groupBy shuffle carrying five int64 moments
  *     per customer — the classic distributed-OLS shape (no per-point
  *     state leaves the map side after partial aggregation).
  *   - The typed cogroup is the Dataset-API face of a co-partitioned
  *     full-outer reconcile: both sides shuffle once on the key, each
  *     group folds with exact integer/decimal arithmetic in JVM code —
  *     demonstrating that typed per-group logic can still be
  *     oracle-verified when its arithmetic is exact.
  */
object StatOps extends OpGroup {

  /** Trailing-window population z-score, shared Spark/DuckDB expression:
    * all inputs (v_fp milli-units, sx, sxx, n) are exact integers, so the
    * identical parse tree evaluates identically in both engines.
    */
  private val zSql =
    """((CAST(v_fp AS DOUBLE) / 1000.0) - (CAST(sx AS DOUBLE) / (1000.0 * n)))
      | / sqrt(CAST(sxx AS DOUBLE) / (1000000.0 * n)
      |         - (CAST(sx AS DOUBLE) / (1000.0 * n)) * (CAST(sx AS DOUBLE) / (1000.0 * n)))"""
      .stripMargin.replace("\n", " ")

  /** Positive-variance guard (same subexpression as [[zSql]]'s radicand):
    * keeps sqrt real and excludes constant windows in both engines.
    */
  private val varPosSql =
    """(CAST(sxx AS DOUBLE) / (1000000.0 * n)
      | - (CAST(sx AS DOUBLE) / (1000.0 * n)) * (CAST(sx AS DOUBLE) / (1000.0 * n))) > 0.0"""
      .stripMargin.replace("\n", " ")

  /** OLS slope in 1e-6 fixed point from exact int64 moments (micro-cents
    * per day: y is cents, x is days since 1992-01-01).
    */
  private val slopeSql =
    """CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
      | / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1 — rolling z-score outlier detection: trailing 10-event window per
    // user, flag |z| >= 2. Moments are integer window sums over a total
    // (ts, event_id) order; one window shuffle, no driver state.
    "rolling_zscore_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("v_fp", expr("CAST(round(value * 1000) AS BIGINT)"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
      ev.withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("v_fp")).over(w))
        .withColumn("sxx", sum(col("v_fp") * col("v_fp")).over(w))
        .filter(col("n") === 10)
        .filter(expr(varPosSql))
        .withColumn("z_fp", expr(s"CAST(round(($zSql) * 10000.0) AS BIGINT)"))
        .filter(abs(col("z_fp")) >= 20000)
        .select("user_id", "event_id", "v_fp", "z_fp")
        .orderBy("user_id", "event_id")
    }),

    // X2 — per-customer OLS spend trend: five exact moments per group, one
    // shuffle; slope resolved in one shared double expression. Top 25
    // steepest risers.
    "ols_trend_fixed" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey"),
        expr("CAST(datediff(o_orderdate, DATE'1992-01-01') AS BIGINT)").as("x"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .filter(col("n") >= 8 && expr("n * sxx - sx * sx > 0"))
        .withColumn("slope_fp", expr(slopeSql))
        .select("o_custkey", "n", "slope_fp")
        .orderBy(col("slope_fp").desc, col("o_custkey")).limit(25)
    }),

    // X3 — typed cogroup reconciliation: orders vs their lineitem roll-up
    // via KeyValueGroupedDataset.cogroup (full-outer semantics: childless
    // orders keep n_lines=0, orphan lines surface with total_fp NULL).
    // Per-line gross is fixed-pointed with the same IEEE product order as
    // the oracle; group folds are exact integer sums.
    "typed_cogroup_reconcile" -> ((s, d) => {
      import s.implicits._
      val os = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("total"))
        .as[OrderK]
      val ls = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k"), col("l_extendedprice").as("ep"),
          col("l_discount").as("disc"), col("l_tax").as("tax"))
        .as[LineK]
      os.groupByKey(_.k).cogroup(ls.groupByKey(_.k)) { (k, oit, lrows) =>
        var n = 0L
        var gross = 0L
        lrows.foreach { l =>
          n += 1
          gross += fp6(l.ep * (1.0 - l.disc) * (1.0 + l.tax) * 1000000.0)
        }
        val total = oit.toSeq.headOption.map(o => fp6(o.total * 1000000.0))
        Iterator(Recon(k, n, gross, total))
      }.toDF().orderBy("o_orderkey")
    }),

    // X5 — median/MAD robust outlier gate per event type (the
    // winsorized-mean sibling for heavy-tailed measures: median and MAD
    // have breakdown point 0.5 where X1's mean/stddev window has 0).
    // Median and MAD are RANK-DEFINED (value at row ceil(0.5·n) — the
    // percentile_disc convention), so everything is exact int64 cents:
    // no engine quantile interpolation anywhere. Two GlobalRank
    // two-phase ranks (5 event types — the low-cardinality window
    // trap), each statistic table is type-cardinality-sized and
    // broadcasts back into the stream; the outlier test |x−med| > 3·MAD
    // is a map-side integer predicate feeding one combinable aggregate.
    "mad_robust_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val cnts = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      val r1 = graft.functions.GlobalRank.rowNumber(
        ev, "rn", Seq("event_type"), Seq("cents"))
      val med = r1.join(broadcast(cnts), "event_type")
        .groupBy("event_type")
        .agg(min(when(col("rn") === ceil(col("cnt") * 0.5), col("cents")))
          .as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("ad", abs(col("cents") - col("med")))
      val r2 = graft.functions.GlobalRank.rowNumber(
        dev.select("event_type", "ad"), "rn", Seq("event_type"), Seq("ad"))
      val mad = r2.join(broadcast(cnts), "event_type")
        .groupBy("event_type")
        .agg(min(when(col("rn") === ceil(col("cnt") * 0.5), col("ad")))
          .as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max("med").as("med_cents"), max("mad").as("mad_cents"),
          sum(when(col("ad") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    // X6 — interarrival burstiness per event type: mean gap and CV² of
    // per-user interarrival µs (CV² ≈ 1 ⇒ Poisson arrivals; > 1 ⇒
    // bursty — the traffic-shape audit behind capacity planning and
    // bot detection). Gaps are exact integer µs from ONE per-user lag
    // window (the sessionize sort, reused); Σx and Σx² fold through
    // DECIMAL(38,0) (gap² ~ 6e24 overflows int64 — the
    // embedding_dim_stats lift), and CV² resolves in ONE shared double
    // expression over those exact sums, FLOOR-truncated to 1e-6
    // fixed-point. One map-side-combinable shuffle after the window.
    "interarrival_burstiness" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), expr("unix_micros(ts)").as("us"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap").isNotNull)
      gaps.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("gap").cast("decimal(38,0)")).as("sx"),
          // cast BEFORE the square: gap² ~ 6e24 would overflow an int64
          // multiply (ANSI would throw; legacy would wrap silently)
          sum(col("gap").cast("decimal(19,0)")
            * col("gap").cast("decimal(19,0)")).as("sxx"))
        .select(col("event_type"), col("n"),
          expr("CAST(sx DIV n AS BIGINT)").as("mean_gap_us"),
          // sx = 0 guard (all gaps zero, e.g. a replayed event type):
          // NaN would otherwise reach the double→BIGINT cast, where
          // Spark's legacy cast (NULL/0) and DuckDB's diverge — NULL
          // identically on both sides instead
          expr("""CASE WHEN sx = 0 THEN NULL ELSE
                 CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 / CAST(sx AS DOUBLE) / CAST(sx AS DOUBLE) - 1.0)
                 * 1000000) AS BIGINT) END""").as("cv2_fp"))
        .orderBy("event_type")
    }),

    // X7 — Benford first-digit audit of the monetary measure: observed
    // first-digit shares of the integer cents next to the Benford
    // expectation log10(1+1/d) — the fraud/synthetic-data smell test.
    // The first digit comes from the DECIMAL STRING of the exact cents
    // (no float log10 on the data path); shares are 1e-6 integer
    // divisions; the expectation column is a 9-row constant expression
    // (ln on small exact rationals — dsir precedent). One digit-keyed
    // aggregate + one single-row broadcast total.
    "benford_first_digit_audit" -> ((s, d) => {
      val ct = Tables.events(s, d)
        .select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .filter(col("cents") > 0)
        .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
          .as("d1"))
        .groupBy("d1").agg(count(lit(1)).as("n_values"))
      val t = ct.agg(sum("n_values").as("n"))
      ct.crossJoin(broadcast(t))
        .select(col("d1"), col("n_values"),
          expr("n_values * 1000000 DIV n").as("share_fp"),
          expr("CAST(FLOOR(ln(1.0 + 1.0 / d1) / ln(10.0) * 1000000) AS BIGINT)")
            .as("benford_fp"))
        .orderBy("d1")
    }),

    // X8 — supplier market concentration per nation (Herfindahl index in
    // basis points): HHI = Σᵢ shareᵢ² over each nation's suppliers,
    // share = supplier revenue / nation revenue. Revenue follows the
    // flagship exact-decimal form (each item's double rounded ONCE to
    // DECIMAL(18,6), then exact sums), lifted to integer 1e-6 currency
    // units; squares and the S² divisor run in DECIMAL(38,0) (HUGEINT on
    // the oracle side — mᵢ² ≈ 1e24 at a 1e12 market, far past int64).
    // Shape: fact shuffles once on (nationkey, suppkey) after a
    // broadcast dim join; the per-nation fold is supplier-cardinality
    // sized; nation names join broadcast. HHI_bp ≤ 10000 by definition.
    "hhi_supplier_concentration" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val bySup = li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .groupBy("s_nationkey", "s_suppkey")
        .agg(graft.Det.decSum(col("rev")).as("m"))
        .select(col("s_nationkey"),
          expr("CAST(m * 1000000 AS DECIMAL(38,0))").as("mfp"))
      bySup.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(expr("mfp * mfp")).as("q"), sum("mfp").as("s"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_suppliers"),
          expr("CAST(q * 10000 DIV (s * s) AS BIGINT)").as("hhi_bp"))
        .orderBy("n_name")
    }),

    // X9 — percentile grid per event type: p10/p25/p50/p75/p90 of the
    // exact-cents measure in one report — the distribution summary a
    // metrics catalog publishes (generalizes X4's two clip points and
    // X5's single median). All five picks are RANK-DEFINED (row
    // ceil(q·n), the percentile_disc convention) off ONE GlobalRank
    // two-phase rank (few huge groups — the low-cardinality window
    // trap); per-type counts broadcast; one conditional-min aggregate
    // collects the whole grid.
    "event_value_percentile_grid" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        ev, "rn", Seq("event_type"), Seq("cents"))
      val cnts = ev.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      def pick(q: Double, name: String) =
        min(when(col("rn") === ceil(col("cnt") * q), col("cents"))).as(name)
      ranked.join(broadcast(cnts), "event_type")
        .groupBy("event_type")
        .agg(max("cnt").as("n"),
          pick(0.10, "p10"), pick(0.25, "p25"), pick(0.50, "p50"),
          pick(0.75, "p75"), pick(0.90, "p90"))
        .orderBy("event_type")
    }),

    // X10 — corpus QC correlation: Pearson r between document token
    // count and distinct-token count — the one-number lexical-health
    // probe (r ≈ 1 means length drives vocabulary as natural text does;
    // r collapsing flags templated filler). Both variables are EXACT
    // integers, so the five moments are exact int64 sums (x·y ≤ 1e8 per
    // doc; DECIMAL(38,0)/HUGEINT lift on the moment COMBINATION, where
    // n·Σxy passes int64 near 1e9 docs — the X2/M9 recipe); r resolves
    // in ONE shared double expression FLOOR-truncated to 1e-6.
    "doc_length_quality_corr" -> ((s, d) => {
      val m = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("x"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          sum(expr("y * y")).as("syy"))
      m.select(col("n"),
        expr("""CAST(FLOOR(
               |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               |  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               |  * 1000000) AS BIGINT)""".stripMargin).as("pearson_r_fp"))
    }),

    // X11 — weighted percentiles: the quantity-weighted p50/p90 of the
    // exact-cents price per return flag — "the price at which half the
    // VOLUME (not half the line items) has shipped", the
    // inventory-weighted distribution read a mix planner uses. Fully
    // rank-defined: smallest value whose cumulative weight reaches
    // ⌈q·W⌉ (the integer comparison cumw·100 ≥ totw·q is exactly that
    // ceiling test). Skew-proof shape: weights first collapse to the
    // DISTINCT (group, value) domain in a map-side-combinable
    // aggregate — a hot price point folds per mapper — then the
    // cumulative weight runs over the value DOMAIN via the GlobalRank
    // two-phase prefix sum (3 giant groups = the low-cardinality
    // window trap); totals broadcast. cumw·100 wraps int64 only past
    // ~9e16 total units — far beyond a 100 TB fact table.
    "weighted_percentile_value" -> ((s, d) => {
      // materialized once (r18 optimization): the value-domain weight
      // table feeds the prefix sum's measuring pass, its ranking window
      // AND the per-group totals — three executions of the lineitem
      // aggregate otherwise
      val agg = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
        .groupBy("grp", "cents").agg(sum("w").as("wv"))
        .localCheckpoint()
      val cum = graft.functions.GlobalRank.prefixSum(
        agg, "cumw", col("wv"), Seq("grp"), Seq("cents"))
      val tot = agg.groupBy("grp").agg(sum("wv").as("totw"))
      cum.join(broadcast(tot), "grp")
        .groupBy("grp")
        .agg(max("totw").as("total_weight"),
          min(when(col("cumw") * 100 >= col("totw") * 50, col("cents")))
            .as("p50_cents"),
          min(when(col("cumw") * 100 >= col("totw") * 90, col("cents")))
            .as("p90_cents"))
        .orderBy("grp")
    }),
  )

  // Not `private`: Catalyst's generated (de)serializer projections live
  // outside this object and need constructor/field access.
  case class OrderK(k: Long, total: Double)
  case class LineK(k: Long, ep: Double, disc: Double, tax: Double)
  case class Recon(o_orderkey: Long, n_lines: Long,
      gross_fp: Long, total_fp: Option[Long])

  /** JVM twin of DuckDB's `CAST(round(x) AS BIGINT)`: round-half-away on
    * the shortest decimal representation of the double. (`Math.round` is
    * floor(x+0.5), which disagrees on values like 0.49999999999999994.)
    */
  private def fp6(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue

  val oracleSql: Map[String, String] = Map(
    "rolling_zscore_outliers" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, ts,
         |         CAST(round(value * 1000) AS BIGINT) AS v_fp
         |  FROM events),
         |st AS (
         |  SELECT user_id, event_id, v_fp,
         |    count(*) OVER w AS n,
         |    CAST(sum(v_fp) OVER w AS BIGINT) AS sx,
         |    CAST(sum(v_fp * v_fp) OVER w AS BIGINT) AS sxx
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         |SELECT user_id, event_id, v_fp,
         |       CAST(round(($zSql) * 10000.0) AS BIGINT) AS z_fp
         |FROM st
         |WHERE n = 10 AND $varPosSql
         |  AND abs(CAST(round(($zSql) * 10000.0) AS BIGINT)) >= 20000
         |ORDER BY user_id, event_id""".stripMargin,

    "ols_trend_fixed" ->
      s"""WITH o AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
         |  FROM orders),
         |m AS (
         |  SELECT o_custkey, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM o GROUP BY o_custkey)
         |SELECT o_custkey, n, $slopeSql AS slope_fp
         |FROM m WHERE n >= 8 AND n * sxx - sx * sx > 0
         |ORDER BY slope_fp DESC, o_custkey LIMIT 25""".stripMargin,

    "typed_cogroup_reconcile" ->
      """WITH la AS (
        |  SELECT l_orderkey AS k, count(*) AS n_lines,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |                        * (1.0 + l_tax) * 1000000.0) AS BIGINT)) AS BIGINT)
        |      AS gross_fp
        |  FROM lineitem GROUP BY l_orderkey),
        |ok AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 1000000.0) AS BIGINT) AS total_fp
        |  FROM orders)
        |SELECT k AS o_orderkey, COALESCE(n_lines, 0) AS n_lines,
        |       COALESCE(gross_fp, 0) AS gross_fp, total_fp
        |FROM ok FULL JOIN la USING (k)
        |ORDER BY o_orderkey""".stripMargin,

    // identical rank-defined median/MAD picks and integer outlier test
    "mad_robust_outliers" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r1 AS (
        |  SELECT event_type, cents,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY cents) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM ev),
        |med AS (
        |  SELECT event_type,
        |         min(CASE WHEN rn = ceil(cnt * 0.5) THEN cents END) AS med
        |  FROM r1 GROUP BY event_type),
        |dev AS (
        |  SELECT ev.event_type, ev.cents, m.med,
        |         abs(ev.cents - m.med) AS ad
        |  FROM ev JOIN med m USING (event_type)),
        |r2 AS (
        |  SELECT event_type, ad,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY ad) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM dev),
        |mad AS (
        |  SELECT event_type,
        |         min(CASE WHEN rn = ceil(cnt * 0.5) THEN ad END) AS mad
        |  FROM r2 GROUP BY event_type)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(max(d.med) AS BIGINT) AS med_cents,
        |       CAST(max(x.mad) AS BIGINT) AS mad_cents,
        |       CAST(count(*) FILTER (WHERE d.ad > 3 * x.mad) AS BIGINT)
        |         AS n_outliers
        |FROM dev d JOIN mad x USING (event_type)
        |GROUP BY d.event_type ORDER BY event_type""".stripMargin,

    // identical lag chain; HUGEINT moments (Spark: DECIMAL(38,0)), one
    // shared double expression, FLOOR 1e-6 truncation
    "interarrival_burstiness" ->
      """WITH seq AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |g AS (SELECT event_type, CAST(gap AS BIGINT) AS gap
        |      FROM seq WHERE gap IS NOT NULL),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(gap AS HUGEINT)) AS sx,
        |         sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sxx
        |  FROM g GROUP BY event_type)
        |SELECT event_type, n,
        |       CAST(sx // n AS BIGINT) AS mean_gap_us,
        |       CASE WHEN sx = 0 THEN NULL ELSE
        |         CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           / CAST(sx AS DOUBLE) / CAST(sx AS DOUBLE) - 1.0)
        |           * 1000000) AS BIGINT) END AS cv2_fp
        |FROM m ORDER BY event_type""".stripMargin,

    // identical string-derived first digit and expectation expression
    "benford_first_digit_audit" ->
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS d1
        |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |        FROM events) WHERE cents > 0),
        |ct AS (SELECT d1, CAST(count(*) AS BIGINT) AS n_values
        |       FROM dg GROUP BY d1),
        |t AS (SELECT sum(n_values) AS n FROM ct)
        |SELECT d1, n_values,
        |       CAST(n_values * 1000000 // n AS BIGINT) AS share_fp,
        |       CAST(FLOOR(ln(1.0 + 1.0 / d1) / ln(10.0) * 1000000)
        |         AS BIGINT) AS benford_fp
        |FROM ct CROSS JOIN t ORDER BY d1""".stripMargin,

    // identical DECIMAL(18,6) revenue, 1e-6 integer lift, HUGEINT Σm²
    "hhi_supplier_concentration" ->
      """WITH by_sup AS (
        |  SELECT s_nationkey, s_suppkey,
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(18,6))) * 1000000 AS HUGEINT) AS mfp
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_nationkey, s_suppkey),
        |by_nat AS (
        |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |         sum(mfp * mfp) AS q, sum(mfp) AS s
        |  FROM by_sup GROUP BY s_nationkey)
        |SELECT n_name, n_suppliers,
        |       CAST(q * 10000 // (s * s) AS BIGINT) AS hhi_bp
        |FROM by_nat JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,

    // identical rank-defined ceil(q·n) picks off one rank pass
    "event_value_percentile_grid" ->
      """WITH ev AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (
        |  SELECT event_type, cents,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY cents) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM ev)
        |SELECT event_type, CAST(max(cnt) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN rn = ceil(cnt * 0.10) THEN cents END) AS BIGINT) AS p10,
        |  CAST(min(CASE WHEN rn = ceil(cnt * 0.25) THEN cents END) AS BIGINT) AS p25,
        |  CAST(min(CASE WHEN rn = ceil(cnt * 0.50) THEN cents END) AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN rn = ceil(cnt * 0.75) THEN cents END) AS BIGINT) AS p75,
        |  CAST(min(CASE WHEN rn = ceil(cnt * 0.90) THEN cents END) AS BIGINT) AS p90
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical exact integer moments and shared r expression
    "doc_length_quality_corr" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM (
        |    SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        |           CAST(len(list_distinct(string_split(text, ' ')))
        |             AS BIGINT) AS y
        |    FROM documents))
        |SELECT n,
        |       CAST(FLOOR(
        |         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         * 1000000) AS BIGINT) AS pearson_r_fp
        |FROM m""".stripMargin,

    "weighted_percentile_value" ->
      """WITH agg AS (
        |  SELECT l_returnflag AS grp,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wv
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT grp, cents, wv,
        |         CAST(sum(wv) OVER (PARTITION BY grp ORDER BY cents)
        |           AS BIGINT) AS cumw
        |  FROM agg),
        |tot AS (SELECT grp, CAST(sum(wv) AS BIGINT) AS totw
        |        FROM agg GROUP BY grp)
        |SELECT grp, max(totw) AS total_weight,
        |       min(CASE WHEN cumw * 100 >= totw * 50 THEN cents END)
        |         AS p50_cents,
        |       min(CASE WHEN cumw * 100 >= totw * 90 THEN cents END)
        |         AS p90_cents
        |FROM cum JOIN tot USING (grp)
        |GROUP BY grp ORDER BY grp""".stripMargin,
  )
}
