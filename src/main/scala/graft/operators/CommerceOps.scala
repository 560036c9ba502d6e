package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Commerce-analytics operators (round-10 widening, fourth session):
  * the order-fill CDF curve (what fraction of lines ship within k days
  * — the latency view `ship_latency_by_priority`'s quantiles
  * summarize), a discount→quantity elasticity proxy per brand (does
  * discounting move volume — Pearson over exact integer leaves), and
  * supplier revenue-share shift between the corpus's two halves (the
  * supply-base drift report).
  *
  * Determinism & scale design:
  *   - The fill curve buckets latency map-side (grid-bounded state),
  *     then cumulates over the 9-point k grid via a tiny
  *     grid×bucket broadcast join — no window, no second scan.
  *   - Elasticity is the DECIMAL(38,0)-moment Pearson (the Spearman
  *     machinery's terminal-ratio pattern) over integer (discount_pct,
  *     qty) leaves per brand.
  *   - The half split is measured once (broadcast min/max years); both
  *     halves aggregate in ONE pass via conditional sums; the top-10
  *     movers resolve by TakeOrdered on (|shift|, key).
  */
object CommerceOps extends OpGroup {

  private val rhoSql =
    """CASE WHEN dx = 0 OR dy = 0 THEN NULL
      |ELSE round(CAST(num AS DOUBLE)
      |  / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))), 6)
      |END""".stripMargin.replace("\n", " ")

  /** 90-day half-life decay leaf: ⌊cents · exp(ln ½ · age/90)⌋ as ONE
    * shared string over exact integers — identical IEEE tree on both
    * engines, truncated BEFORE the order-free integer sum.
    */
  private val decaySql =
    """CAST(FLOOR(CAST(cents AS DOUBLE)
      | * exp(ln(0.5) * age_days / 90.0)) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDF of order→ship latency at k ∈ {0, 15, …, 120} days.
    "order_fill_curve" -> ((s, d) => {
      val lat = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(expr(
          """least(8, greatest(0,
            |  datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE))
            |  DIV 15))""".stripMargin.replace("\n", " ")).as("b"))
      val buckets = lat.groupBy("b").agg(count(lit(1)).as("n"))
      val tot = buckets.agg(sum("n").as("n_total"))
      val grid = buckets.sparkSession.range(0, 9)
        .select((col("id") * 15).cast("long").as("k_days"),
          col("id").cast("long").as("ki"))
      grid.join(buckets, col("b") <= col("ki"))
        .groupBy("k_days").agg(sum("n").as("n_within"))
        .crossJoin(broadcast(tot))
        .withColumn("share_fp", expr("n_within * 1000000 DIV n_total"))
        .select("k_days", "n_within", "n_total", "share_fp")
        .orderBy("k_days")
    }),

    // Discount→quantity Pearson per brand (elasticity proxy).
    "price_elasticity_brand" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("x"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
      val part = Tables.part(s, d).select("p_partkey", "p_brand")
      val dec = DecimalType(38, 0)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").agg(
          count(lit(1)).as("n_rows"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        .withColumn("num",
          col("n_rows").cast(dec) * col("sxy") - col("sx") * col("sy"))
        .withColumn("dx",
          col("n_rows").cast(dec) * col("sxx") - col("sx") * col("sx"))
        .withColumn("dy",
          col("n_rows").cast(dec) * col("syy") - col("sy") * col("sy"))
        .withColumn("elasticity_corr", expr(rhoSql))
        .select("p_brand", "n_rows", "elasticity_corr")
        .orderBy("p_brand")
    }),

    // Supplier revenue-share shift: first half vs second half of the
    // observed shipdate years, top-10 movers by |shift|.
    "supplier_share_shift" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_suppkey"),
        year(col("l_shipdate")).as("yr"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val yrs = li.agg(min("yr").as("y0"), max("yr").as("y1"))
      val tagged = li.crossJoin(broadcast(yrs))
        .withColumn("h", expr("CASE WHEN 2 * yr <= y0 + y1 THEN 1 ELSE 2 END"))
      val sup = tagged.groupBy("l_suppkey").agg(
        sum(when(col("h") === 1, col("cents")).otherwise(0L)).as("rev1"),
        sum(when(col("h") === 2, col("cents")).otherwise(0L)).as("rev2"))
      val tot = sup.agg(sum("rev1").as("t1"), sum("rev2").as("t2"))
      sup.crossJoin(broadcast(tot))
        .withColumn("share1_fp", expr("rev1 * 1000000 DIV t1"))
        .withColumn("share2_fp", expr("rev2 * 1000000 DIV t2"))
        .withColumn("shift_fp", expr("share2_fp - share1_fp"))
        .select("l_suppkey", "rev1", "rev2", "share1_fp", "share2_fp",
          "shift_fp")
        .orderBy(abs(col("shift_fp")).desc, col("l_suppkey"))
        .limit(10)
    }),

    // Time-decayed revenue by nation (r12, second session): each
    // order's cents weighted by exp(ln ½ · age/90) — a 90-day
    // half-life recency kernel measured against the broadcast corpus
    // max date (the open_order_aging scalar pattern) — the "how much
    // of this account's value is RECENT" read behind every
    // retention-weighted LTV and freshness-weighted mixture score.
    // Each order's decayed value is ONE FLOOR'd IEEE leaf over exact
    // (cents, age_days) integers, then integer-summed (order-free at
    // any partitioning); the report is |nations|-bounded and the
    // decay share is an exact integer ratio.
    "time_decay_revenue" -> ((s, d) => {
      val ords = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
          "o_custkey")
        .select(col("c_nationkey").as("nk"),
          col("o_orderdate").cast("date").as("od"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val maxd = ords.agg(max("od").as("max_od"))
      ords.crossJoin(broadcast(maxd))
        .withColumn("age_days",
          expr("datediff(max_od, od)").cast("long"))
        .withColumn("dec_cents", expr(decaySql))
        .groupBy("nk")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("raw_cents"),
          sum("dec_cents").as("decayed_cents"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          "nk")
        .withColumn("decay_share_fp", expr(
          """CAST(CAST(decayed_cents AS DECIMAL(38,0)) * 1000000
            | DIV raw_cents AS BIGINT)""".stripMargin.replace("\n", " ")))
        .select("nation", "n_orders", "raw_cents", "decayed_cents",
          "decay_share_fp")
        .orderBy("nation")
    }),

    // Little's law backlog audit (r12, third session): per calendar
    // month, time-averaged WIP L = Σoverlap/days, arrival rate
    // λ = arrivals/days, and mean residence W = Σdur/arrivals of the
    // order-fulfillment system (order interval = [o_orderdate,
    // max(l_shipdate)]). Little's L = λ·W identity collapses to the
    // PURE-INTEGER ratio Σoverlap_month / Σdur_of_arrivals — the
    // queueing-consistency read that flags months where backlog grew
    // faster than arrivals explain (boundary-straddling load). Scale:
    // the month axis explodes per order from order-month to
    // ship-month (interval_overlap_months' mk pattern — bounded by
    // the order's residence, never a grid join), everything folds
    // map-side into a months-bounded report; fp products lift to
    // DECIMAL(38,0)/HUGEINT so Σoverlap·1e6 stays exact past the
    // int64 edge (~9e12 order-days). Spec pins the exact conservation
    // law Σ_months overlap = Σ_orders duration.
    "littles_law_backlog" -> ((s, d) => {
      val comp = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(max(to_date(col("l_shipdate"))).as("ship"))
        .join(Tables.orders(s, d).select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("od")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("ship") >= col("od"))
        .select("od", "ship")
      comp.select(col("od"), col("ship"), explode(expr(
          """sequence(year(od) * 12 + month(od) - 1,
            |         year(ship) * 12 + month(ship) - 1)""".stripMargin))
          .as("mk"))
        .withColumn("ms", expr("make_date(mk DIV 12, mk % 12 + 1, 1)"))
        .withColumn("me", last_day(col("ms")))
        .withColumn("days_m", expr("CAST(datediff(me, ms) + 1 AS BIGINT)"))
        .withColumn("overlap_days", expr(
          "CAST(datediff(least(me, ship), greatest(ms, od)) + 1 AS BIGINT)"))
        .withColumn("arrived",
          when(col("mk") === expr("year(od) * 12 + month(od) - 1"), 1L)
            .otherwise(0L))
        .withColumn("dur", expr("CAST(datediff(ship, od) + 1 AS BIGINT)"))
        .groupBy("ms", "days_m")
        .agg(sum("arrived").as("arrivals"),
          sum("overlap_days").as("sum_overlap_days"),
          sum(expr("arrived * dur")).as("sum_duration_days"))
        .withColumn("l_fp", expr(
          """CAST(CAST(sum_overlap_days AS DECIMAL(38,0)) * 1000000
            | DIV days_m AS BIGINT)""".stripMargin.replace("\n", " ")))
        .withColumn("lambda_fp", expr(
          "CAST(CAST(arrivals AS DECIMAL(38,0)) * 1000000 DIV days_m AS BIGINT)"))
        .withColumn("w_fp", expr(
          """CASE WHEN arrivals > 0 THEN
            | CAST(CAST(sum_duration_days AS DECIMAL(38,0)) * 1000000
            |   DIV arrivals AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .withColumn("littles_ratio_fp", expr(
          """CASE WHEN sum_duration_days > 0 THEN
            | CAST(CAST(sum_overlap_days AS DECIMAL(38,0)) * 1000000
            |   DIV sum_duration_days AS BIGINT)
            |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")))
        .select(col("ms").as("month_start"), col("days_m"), col("arrivals"),
          col("sum_overlap_days"), col("sum_duration_days"), col("l_fp"),
          col("lambda_fp"), col("w_fp"), col("littles_ratio_fp"))
        .orderBy("month_start")
    }),

    // Weibull fit of the ship-latency distribution by plotting-
    // position regression (r12, fifth session; Weibull 1951; the
    // median-rank-paper method every reliability handbook runs before
    // trusting an exponential assumption): regress
    // ln(−ln(1−F(t))) on ln t — Weibull data is linear there with
    // slope = the shape k (k≈1 memoryless, k>1 wear-out/aging, k<1
    // infant-mortality), which tells the fulfilment team whether
    // late orders get MORE likely to ship each extra day or less.
    // F is the mean-rank plotting position cum/(n+1) over the
    // day-quantized latency support — rank-defined, no engine
    // quantiles. Scale: latency support is value-domain-bounded
    // (≤ ~122 distinct days); cum is the two-phase prefix sum; each
    // support point contributes ONE shared-text FLOOR'd IEEE (x, y)
    // leaf; the shape/intercept resolve by the closed-form integer-
    // moment OLS (zipf precedent) with sign-explicit divisions.
    "weibull_latency_fit" -> ((s, d) => {
      val lat = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(expr(
          """datediff(CAST(l_shipdate AS DATE),
            | CAST(o_orderdate AS DATE))""".stripMargin.replace("\n", " "))
          .as("t"))
        .filter(col("t") >= 1)
      val sup = lat.groupBy("t").agg(count(lit(1)).as("c"))
      val cum = graft.functions.GlobalRank
        .prefixSum(sup, "cum", col("c"), Nil, Seq("t"))
      val tot = sup.agg(sum("c").as("n"))
      val pts = cum.crossJoin(broadcast(tot))
        .select(col("t"), col("cum"), col("n"),
          expr("CAST(FLOOR(ln(CAST(t AS DOUBLE)) * 1000000.0) AS BIGINT)")
            .as("px"),
          expr("""CAST(FLOOR(ln(-ln(1.0 - CAST(cum AS DOUBLE) / (n + 1)))
                 | * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("py"))
      pts.agg(max("n").as("n"), count(lit(1)).as("p"),
          sum("px").as("sx"), sum("py").as("sy"),
          sum(expr("px * py")).as("sxy"), sum(expr("px * px")).as("sxx"))
        .withColumn("num", expr(
          """CAST(p AS DECIMAL(38,0)) * sxy
            | - CAST(sx AS DECIMAL(38,0)) * sy"""
            .stripMargin.replace("\n", " ")))
        .withColumn("den", expr(
          """CAST(p AS DECIMAL(38,0)) * sxx
            | - CAST(sx AS DECIMAL(38,0)) * sx"""
            .stripMargin.replace("\n", " ")))
        .filter(col("p") >= 2 && expr("den > 0"))
        .select(col("n"), col("p").as("n_points"),
          expr("""CASE WHEN num >= 0
                 | THEN CAST(num * 1000000 DIV den AS BIGINT)
                 | ELSE -CAST((-num) * 1000000 DIV den AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("shape_fp"),
          expr("""CASE WHEN CAST(sy AS DECIMAL(38,0)) * den - num * sx >= 0
                 | THEN CAST((CAST(sy AS DECIMAL(38,0)) * den - num * sx)
                 |   DIV (CAST(p AS DECIMAL(38,0)) * den) AS BIGINT)
                 | ELSE -CAST((-(CAST(sy AS DECIMAL(38,0)) * den
                 |     - num * sx))
                 |   DIV (CAST(p AS DECIMAL(38,0)) * den) AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("intercept_fp"))
    }),

    // Historical VaR / expected shortfall of the daily revenue change
    // (r12, fifth session; the RiskMetrics-convention tail read): over
    // the day-over-day deltas of observed daily revenue, the 95%
    // value-at-risk is the RANK-DEFINED k-th worst delta (k = ⌈0.05·m⌉
    // — no engine quantile interpolation) and the expected shortfall
    // is the exact mean of those k worst — the number a revenue-ops
    // review reads as "a bad day costs at least X; the average bad
    // day costs Y". Scale: daily revenue is ONE map-side aggregate of
    // orders (calendar-bounded); deltas are a rank-shifted equi-join
    // over observed-day adjacency (mase pattern); the tail pick is a
    // two-phase GlobalRank numbering over the ≤|days| delta relation;
    // ES is a signed toward-zero mean over exact cents.
    "var_es_daily_revenue" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(expr("datediff(o_orderdate, DATE '1992-01-01')").as("di"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("rev"))
      val rn = graft.functions.GlobalRank
        .rowNumber(daily, "rn", Nil, Seq("di"))
      val prev = rn.select((col("rn") + 1).as("rn"), col("rev").as("rev_p"))
      val diffs = rn.join(prev, "rn")
        .select(col("di"), (col("rev") - col("rev_p")).as("delta"))
      val m = diffs.agg(count(lit(1)).as("m"))
        .withColumn("k", expr("greatest(1L, CAST(ceil(0.05 * m) AS BIGINT))"))
      val ranked = graft.functions.GlobalRank
        .rowNumber(diffs, "rk", Nil, Seq("delta", "di"))
      val tail = ranked.crossJoin(broadcast(m))
        .filter(col("rk") <= col("k"))
      tail.groupBy("m", "k")
        .agg(max("delta").as("var_cents"), sum("delta").as("tail_sum"))
        .select(col("m").as("n_deltas"), col("k"), col("var_cents"),
          expr("""CASE WHEN tail_sum >= 0 THEN tail_sum * 1000000 DIV k
                 | ELSE -((-tail_sum) * 1000000 DIV k) END"""
            .stripMargin.replace("\n", " ")).as("es_cents_fp"))
    }),

    // ABC inventory classification (r13): parts ranked by revenue,
    // classed by cumulative share — A carries the first 80% of
    // revenue, B to 95%, C the tail (the classical Pareto cut
    // inventory policy runs on; pareto_revenue_concentration reads
    // the same curve at fixed population fractions, this reads it at
    // fixed MASS fractions and reports the class census). The
    // crossing item belongs to the class its INCLUSIVE cumulative
    // lands in (pinned rule, pure integer predicates cum·k ≤ m·tot).
    // Scale: one part-keyed revenue aggregate; rank + prefix via
    // GlobalRank's measured two-phase path ordered by (−rev, key);
    // the census is a 3-row aggregate.
    "abc_inventory_classification" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("rev"))
        .withColumn("negrev", -col("rev"))
        .localCheckpoint()
      val tot = rev.agg(sum("rev").as("tot"))
      val cum = graft.functions.GlobalRank
        .prefixSum(rev, "cum", col("rev"), Nil, Seq("negrev", "l_partkey"))
      cum.crossJoin(broadcast(tot))
        .withColumn("abc_class", expr(
          """CASE WHEN cum * 10 <= 8 * tot THEN 'A'
            |     WHEN cum * 100 <= 95 * tot THEN 'B'
            |     ELSE 'C' END""".stripMargin.replace("\n", " ")))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_cents"))
        .crossJoin(broadcast(tot))
        .select(col("abc_class"), col("n_parts"), col("rev_cents"),
          expr("rev_cents * 1000000 DIV tot").as("share_fp"))
        .orderBy("abc_class")
    }),

    // Laspeyres / Paasche / Fisher price indices by ship month (r13;
    // the index-number triple every price-drift monitor reports):
    // unit values p = Σcents·1e6 DIV Σqty per (part, month)
    // (truncating — deterministic both engines), basket = parts
    // present in BOTH the base month and the report month; L fixes
    // base-month quantities, P current-month, Fisher = √(L·P). Index
    // folds are DECIMAL(38,0)/HUGEINT; L and P are exact truncating
    // ratios; only Fisher's √ is an IEEE leaf (shared text). Scale:
    // one (part, month) aggregate, base month a broadcast 1-row min,
    // the basket join part-keyed.
    "laspeyres_paasche_index" -> ((s, d) => {
      val pm = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          expr("year(l_shipdate) * 12 + month(l_shipdate)").as("mi"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("ec"), sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
        .withColumn("p_fp", expr("ec * 1000000 DIV q"))
        .localCheckpoint()
      val m0 = pm.agg(min("mi").as("mi0"))
      val base = pm.crossJoin(broadcast(m0)).filter(col("mi") === col("mi0"))
        .select(col("l_partkey"), col("p_fp").as("p0"), col("q").as("q0"))
      pm.join(base, "l_partkey")
        .groupBy("mi")
        .agg(count(lit(1)).as("n_parts"),
          sum(expr("CAST(p_fp AS DECIMAL(38,0)) * q0")).as("lnum"),
          sum(expr("CAST(p0 AS DECIMAL(38,0)) * q0")).as("lden"),
          sum(expr("CAST(p_fp AS DECIMAL(38,0)) * q")).as("pnum"),
          sum(expr("CAST(p0 AS DECIMAL(38,0)) * q")).as("pden"))
        .select(col("mi"), col("n_parts"),
          expr("CAST(lnum * 1000000 DIV lden AS BIGINT)").as("laspeyres_fp"),
          expr("CAST(pnum * 1000000 DIV pden AS BIGINT)").as("paasche_fp"),
          expr(
            """CAST(FLOOR(sqrt((CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE))
              | * (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)))
              | * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("fisher_fp"))
        .orderBy("mi")
    }),

    // New-vs-returning revenue split by order month (r13): each
    // month's revenue attributed to first-ever customers vs repeats —
    // the growth-quality read (a flat topline can hide collapsing
    // acquisition). Pure integer: cohort month = min month per
    // customer (one aggregate), the split two conditional sums.
    "new_returning_revenue_split" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        expr("year(o_orderdate) * 12 + month(o_orderdate)").as("mi"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val cohort = ords.groupBy("o_custkey").agg(min("mi").as("mi0"))
      ords.join(cohort, "o_custkey")
        .groupBy("mi")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("mi") === col("mi0"), col("cents"))
            .otherwise(0L)).as("new_rev_cents"),
          sum(when(col("mi") =!= col("mi0"), col("cents"))
            .otherwise(0L)).as("ret_rev_cents"))
        .withColumn("new_share_fp", expr(
          "new_rev_cents * 1000000 DIV (new_rev_cents + ret_rev_cents)"))
        .orderBy("mi")
    }),

    // EOQ / reorder-point policy per brand (r13; Harris 1913 —
    // the square-root economic order quantity): Q* = √(2DS/H) with
    // S = $100/order and H = 20% of the truncating unit value per
    // period, plus the 7-day-lead reorder point D·L/span — the
    // stocking policy sheet an inventory planner derives straight
    // from the demand ledger. Exactness: demand and unit value are
    // exact integers (the laspeyres ec·1e6 DIV q convention); EOQ is
    // ONE FLOOR'd shared-text IEEE leaf over them (all operands CAST
    // AS DOUBLE before the 0.2/100.0 literals touch them); the
    // reorder point is a pure truncating division. Scale: one
    // lineitem⋈part equi-join into a |brands|-bounded aggregate; the
    // observed-span scalar rides ONE broadcast row.
    "eoq_reorder_policy" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ec"),
        col("l_shipdate"))
      val span = li.agg(
        expr("CAST(datediff(max(l_shipdate), min(l_shipdate)) + 1 AS BIGINT)")
          .as("span_days"))
      val part = Tables.part(s, d).select("p_partkey", "p_brand")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("q").as("demand_qty"), sum("ec").as("rev_cents"))
        .withColumn("unit_fp", expr(
          "CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000"
            + " DIV demand_qty AS BIGINT)"))
        .crossJoin(broadcast(span))
        .select(col("p_brand"), col("demand_qty"), col("unit_fp"),
          expr("""CAST(FLOOR(sqrt(2.0 * CAST(demand_qty AS DOUBLE) * 10000.0
                 | / (0.2 * (CAST(unit_fp AS DOUBLE) / 1000000.0)))
                 | * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("eoq_fp"),
          expr("""CAST(CAST(demand_qty AS DECIMAL(38,0)) * 7 * 1000000
                 | DIV span_days AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("reorder_fp"))
        .orderBy("p_brand")
    }),

    // V38 (r14) — newsvendor order-up-to policy (Arrow, Harris &
    // Marschak 1951): the profit-optimal single-period stock level is
    // the critical-fractile quantile of daily demand, F⁻¹(cu/(cu+co))
    // — with pinned unit economics cu = 40 (margin lost per unit
    // short), co = 50 (cost sunk per unit over), so q = 4/9. The
    // missing piece between eoq_reorder_policy (how much per order)
    // and safety_stock_plan (how much buffer): what level a perishable
    // /single-season SKU stocks to. Exactness: the quantile is
    // RANK-DEFINED — the value at row ⌈n·4/9⌉ = (4n+8) DIV 9 of the
    // (demand, day) total order (percentile_disc semantics, no engine
    // quantile algorithm); coverage is an exact 1e6 ratio. Scale: ONE
    // map-side daily order count; the rank rides GlobalRank's measured
    // two-phase numbering; the output is one row.
    "newsvendor_order_level" -> ((s, d) => {
      val dd = Tables.orders(s, d)
        .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
        .agg(count(lit(1)).as("x"))
        .localCheckpoint()
      val rn = graft.functions.GlobalRank
        .rowNumber(dd, "rn", Nil, Seq("x", "day"))
      val n = dd.agg(count(lit(1)).as("n_days"))
      val lvl = rn.crossJoin(broadcast(n))
        .filter(col("rn") === expr("(4 * n_days + 8) DIV 9"))
        .select(col("n_days"), col("rn").as("target_rank"),
          col("x").as("order_up_to"))
      dd.crossJoin(broadcast(lvl))
        .agg(max("n_days").as("n_days"), max("target_rank").as("target_rank"),
          max("order_up_to").as("order_up_to"),
          sum(when(col("x") <= col("order_up_to"), 1L).otherwise(0L))
            .as("n_days_covered"))
        .select(col("n_days"), col("target_rank"), col("order_up_to"),
          col("n_days_covered"),
          expr("n_days_covered * 1000000 DIV n_days").as("coverage_fp"))
    }),

    // Safety stock at 90/95/99% cycle service per brand (r13; the
    // textbook z·σ_d·√L policy, L = 7-day lead) — EOQ above sizes the
    // ORDER, this sizes the BUFFER against daily-demand variance (the
    // pair is the complete reorder policy). σ_d is the sample std of
    // OBSERVED-day demand (pinned convention); z enters as Φ⁻¹ Scala
    // double literals (gumbelC recipe); each level's stock is ONE
    // FLOOR'd shared-text IEEE leaf over the exact per-brand moment
    // integers. Scale: one lineitem⋈part join into a |brands|-bounded
    // (day-keyed first, then brand) moment ladder; the 3-level grid
    // rides a broadcast explode.
    "safety_stock_plan" -> ((s, d) => {
      import s.implicits._
      val zs = Seq((90L, 1.2815515655446004), (95L, 1.6448536269514722),
        (99L, 2.3263478740408408)).toDF("level", "z")
      val part = Tables.part(s, d).select("p_partkey", "p_brand")
      Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')")
            .as("di"),
          expr("CAST(l_quantity AS BIGINT)").as("q"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "di").agg(sum("q").as("dq"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_days"),
          sum(col("dq").cast("decimal(38,0)")).as("sd"),
          sum(expr("CAST(dq AS DECIMAL(38,0)) * dq")).as("sq"))
        .filter(col("n_days") >= 2)
        .withColumn("varnum", expr(
          "CAST(n_days AS DECIMAL(38,0)) * sq - sd * sd"))
        .crossJoin(broadcast(zs))
        .select(col("p_brand"), col("level"), col("n_days"),
          expr("""CAST(FLOOR(CAST(z AS DOUBLE)
                 | * sqrt(CAST(varnum AS DOUBLE)
                 |   / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
                 | * sqrt(7.0) * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("safety_stock_fp"))
        .orderBy("p_brand", "level")
    }),

    // ABC × XYZ classification matrix (r13; the standard inventory
    // segmentation grid): ABC = cumulative revenue class (the V32
    // 80/95 rule per part), XYZ = weekly-demand variability class
    // (X: CV ≤ 0.5 steady, Y: CV ≤ 1.0, Z: erratic or single-week) —
    // the 9-cell census behind differentiated stocking policy (AX =
    // automate, CZ = make-to-order). ENTIRELY integer: the CV
    // thresholds become cross-multiplied predicates on the exact
    // weekly moments (CV² ≤ t² ⟺ t_den·n·varnum ≤ t_num·(n−1)·s²),
    // so no square root is ever taken; the ABC rule is the V32
    // integer predicate verbatim. Scale: one (part, week) aggregate →
    // part-keyed moments; the ABC prefix is the V32 GlobalRank pass;
    // the final census is 9-bounded.
    "abc_xyz_matrix" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ec"),
        expr("CAST(l_quantity AS BIGINT)").as("q"),
        expr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7")
          .as("wk"))
      val rev = li.groupBy("l_partkey").agg(sum("ec").as("rev"))
        .withColumn("negrev", -col("rev"))
        .localCheckpoint()
      val tot = rev.agg(sum("rev").as("tot"))
      val abc = graft.functions.GlobalRank
        .prefixSum(rev, "cum", col("rev"), Nil, Seq("negrev", "l_partkey"))
        .crossJoin(broadcast(tot))
        .withColumn("abc_class", expr(
          """CASE WHEN cum * 10 <= 8 * tot THEN 'A'
            |     WHEN cum * 100 <= 95 * tot THEN 'B'
            |     ELSE 'C' END""".stripMargin.replace("\n", " ")))
        .select("l_partkey", "rev", "abc_class")
      val xyz = li.groupBy("l_partkey", "wk").agg(sum("q").as("wq"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("nw"),
          sum(col("wq").cast("decimal(38,0)")).as("sw"),
          sum(expr("CAST(wq AS DECIMAL(38,0)) * wq")).as("qw"))
        .withColumn("varnum", expr(
          "CAST(nw AS DECIMAL(38,0)) * qw - sw * sw"))
        .withColumn("xyz_class", expr(
          """CASE WHEN nw < 2 THEN 'Z'
            |     WHEN 4 * varnum * nw <= (nw - 1) * sw * sw THEN 'X'
            |     WHEN varnum * nw <= (nw - 1) * sw * sw THEN 'Y'
            |     ELSE 'Z' END""".stripMargin.replace("\n", " ")))
        .select("l_partkey", "xyz_class")
      abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_cents"))
        .crossJoin(broadcast(tot))
        .select(col("abc_class"), col("xyz_class"), col("n_parts"),
          expr("rev_cents * 1000000 DIV tot").as("rev_share_fp"))
        .orderBy("abc_class", "xyz_class")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "order_fill_curve" ->
      """WITH lat AS (
        |  SELECT least(8, greatest(0,
        |           datediff('day', CAST(o_orderdate AS DATE),
        |             CAST(l_shipdate AS DATE)) // 15)) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |buckets AS (SELECT b, CAST(count(*) AS BIGINT) AS n
        |            FROM lat GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM buckets),
        |grid AS (SELECT CAST(i * 15 AS BIGINT) AS k_days,
        |                CAST(i AS BIGINT) AS ki
        |         FROM range(0, 9) r(i)),
        |agg AS (
        |  SELECT g.k_days, CAST(sum(b.n) AS BIGINT) AS n_within
        |  FROM grid g JOIN buckets b ON b.b <= g.ki
        |  GROUP BY g.k_days)
        |SELECT a.k_days, a.n_within, t.n_total,
        |       CAST(a.n_within * 1000000 // t.n_total AS BIGINT) AS share_fp
        |FROM agg a CROSS JOIN tot t ORDER BY a.k_days""".stripMargin,

    "price_elasticity_brand" ->
      s"""WITH q AS (
         |  SELECT p.p_brand,
         |         CAST(round(l_discount * 100) AS BIGINT) AS x,
         |         CAST(round(l_quantity) AS BIGINT) AS y
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
         |m AS (
         |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
         |         sum(CAST(x AS HUGEINT)) AS sx,
         |         sum(CAST(y AS HUGEINT)) AS sy,
         |         sum(CAST(x AS HUGEINT) * x) AS sxx,
         |         sum(CAST(y AS HUGEINT) * y) AS syy,
         |         sum(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM q GROUP BY 1),
         |f AS (
         |  SELECT p_brand, n_rows,
         |         n_rows * sxy - sx * sy AS num,
         |         n_rows * sxx - sx * sx AS dx,
         |         n_rows * syy - sy * sy AS dy
         |  FROM m)
         |SELECT p_brand, n_rows, $rhoSql AS elasticity_corr
         |FROM f ORDER BY p_brand""".stripMargin,

    "supplier_share_shift" ->
      """WITH li AS (
        |  SELECT l_suppkey, year(l_shipdate) AS yr,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |yrs AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM li),
        |sup AS (
        |  SELECT l.l_suppkey,
        |         CAST(sum(CASE WHEN 2 * l.yr <= y.y0 + y.y1
        |              THEN l.cents ELSE 0 END) AS BIGINT) AS rev1,
        |         CAST(sum(CASE WHEN 2 * l.yr > y.y0 + y.y1
        |              THEN l.cents ELSE 0 END) AS BIGINT) AS rev2
        |  FROM li l CROSS JOIN yrs y GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev1) AS BIGINT) AS t1,
        |               CAST(sum(rev2) AS BIGINT) AS t2 FROM sup),
        |f AS (
        |  SELECT s.l_suppkey, s.rev1, s.rev2,
        |         CAST(s.rev1 * 1000000 // t.t1 AS BIGINT) AS share1_fp,
        |         CAST(s.rev2 * 1000000 // t.t2 AS BIGINT) AS share2_fp
        |  FROM sup s CROSS JOIN tot t)
        |SELECT l_suppkey, rev1, rev2, share1_fp, share2_fp,
        |       CAST(share2_fp - share1_fp AS BIGINT) AS shift_fp
        |FROM f
        |ORDER BY abs(share2_fp - share1_fp) DESC, l_suppkey
        |LIMIT 10""".stripMargin,

    "time_decay_revenue" ->
      s"""WITH ords AS (
         |  SELECT c_nationkey AS nk, CAST(o_orderdate AS DATE) AS od,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |maxd AS (SELECT max(od) AS max_od FROM ords),
         |dec AS (
         |  SELECT nk, cents,
         |         CAST(datediff('day', od, max_od) AS BIGINT) AS age_days
         |  FROM ords CROSS JOIN maxd),
         |agg AS (
         |  SELECT nk, CAST(count(*) AS BIGINT) AS n_orders,
         |         CAST(sum(cents) AS BIGINT) AS raw_cents,
         |         CAST(sum($decaySql) AS BIGINT) AS decayed_cents
         |  FROM dec GROUP BY 1)
         |SELECT n_name AS nation, n_orders, raw_cents, decayed_cents,
         |       CAST(CAST(decayed_cents AS HUGEINT) * 1000000 // raw_cents
         |         AS BIGINT) AS decay_share_fp
         |FROM agg JOIN nation ON n_nationkey = nk
         |ORDER BY nation""".stripMargin,

    "littles_law_backlog" ->
      """WITH comp AS (
        |  SELECT CAST(o_orderdate AS DATE) AS od, s.ship
        |  FROM orders JOIN (
        |    SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS ship
        |    FROM lineitem GROUP BY 1) s ON s.l_orderkey = o_orderkey
        |  WHERE s.ship >= CAST(o_orderdate AS DATE)),
        |mon AS (
        |  SELECT od, ship, CAST(t.mk AS BIGINT) AS mk
        |  FROM comp, UNNEST(generate_series(year(od) * 12 + month(od) - 1,
        |                                    year(ship) * 12 + month(ship) - 1))
        |       AS t(mk)),
        |ov AS (
        |  SELECT mk, od, ship,
        |         make_date(CAST(mk // 12 AS INTEGER),
        |                   CAST(mk % 12 + 1 AS INTEGER), 1) AS ms
        |  FROM mon),
        |leaf AS (
        |  SELECT ms,
        |         CAST(date_diff('day', ms, last_day(ms)) + 1 AS BIGINT)
        |           AS days_m,
        |         CAST(date_diff('day', greatest(ms, od),
        |                        least(last_day(ms), ship)) + 1 AS BIGINT)
        |           AS overlap_days,
        |         CASE WHEN mk = year(od) * 12 + month(od) - 1
        |              THEN 1 ELSE 0 END AS arrived,
        |         CAST(date_diff('day', od, ship) + 1 AS BIGINT) AS dur
        |  FROM ov),
        |agg AS (
        |  SELECT ms, days_m, CAST(sum(arrived) AS BIGINT) AS arrivals,
        |         CAST(sum(overlap_days) AS BIGINT) AS sum_overlap_days,
        |         CAST(sum(arrived * dur) AS BIGINT) AS sum_duration_days
        |  FROM leaf GROUP BY 1, 2)
        |SELECT ms AS month_start, days_m, arrivals, sum_overlap_days,
        |       sum_duration_days,
        |       CAST(CAST(sum_overlap_days AS HUGEINT) * 1000000 // days_m
        |         AS BIGINT) AS l_fp,
        |       CAST(CAST(arrivals AS HUGEINT) * 1000000 // days_m
        |         AS BIGINT) AS lambda_fp,
        |       CASE WHEN arrivals > 0 THEN
        |         CAST(CAST(sum_duration_days AS HUGEINT) * 1000000
        |           // arrivals AS BIGINT) ELSE NULL END AS w_fp,
        |       CASE WHEN sum_duration_days > 0 THEN
        |         CAST(CAST(sum_overlap_days AS HUGEINT) * 1000000
        |           // sum_duration_days AS BIGINT) ELSE NULL END
        |         AS littles_ratio_fp
        |FROM agg ORDER BY month_start""".stripMargin,

    // same plotting positions; identical leaves, HUGEINT OLS
    "weibull_latency_fit" ->
      """WITH lat AS MATERIALIZED (
        |  SELECT datediff('day', CAST(o.o_orderdate AS DATE),
        |           CAST(l.l_shipdate AS DATE)) AS t
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE datediff('day', CAST(o.o_orderdate AS DATE),
        |          CAST(l.l_shipdate AS DATE)) >= 1),
        |sup AS MATERIALIZED (
        |  SELECT CAST(t AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS c
        |  FROM lat GROUP BY 1),
        |cum AS (SELECT t, c, CAST(sum(c) OVER (ORDER BY t) AS BIGINT)
        |               AS cum
        |        FROM sup),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sup),
        |pts AS (
        |  SELECT CAST(FLOOR(ln(CAST(t AS DOUBLE)) * 1000000.0) AS BIGINT)
        |           AS px,
        |         CAST(FLOOR(ln(-ln(1.0 - CAST(cum AS DOUBLE) / (n + 1)))
        |           * 1000000.0) AS BIGINT) AS py
        |  FROM cum CROSS JOIN tot),
        |mo AS (
        |  SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS p,
        |         CAST(sum(px) AS BIGINT) AS sx,
        |         CAST(sum(py) AS BIGINT) AS sy,
        |         CAST(sum(CAST(px AS HUGEINT) * py) AS HUGEINT) AS sxy,
        |         CAST(sum(CAST(px AS HUGEINT) * px) AS HUGEINT) AS sxx
        |  FROM pts CROSS JOIN tot),
        |nd AS (
        |  SELECT n, p,
        |         CAST(p AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |           AS num,
        |         CAST(p AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |           AS den,
        |         sx, sy
        |  FROM mo WHERE p >= 2)
        |SELECT n, p AS n_points,
        |       CASE WHEN num >= 0
        |         THEN CAST(num * 1000000 // den AS BIGINT)
        |         ELSE -CAST((-num) * 1000000 // den AS BIGINT) END
        |         AS shape_fp,
        |       CASE WHEN CAST(sy AS HUGEINT) * den - num * sx >= 0
        |         THEN CAST((CAST(sy AS HUGEINT) * den - num * sx)
        |           // (CAST(p AS HUGEINT) * den) AS BIGINT)
        |         ELSE -CAST((-(CAST(sy AS HUGEINT) * den - num * sx))
        |           // (CAST(p AS HUGEINT) * den) AS BIGINT) END
        |         AS intercept_fp
        |FROM nd WHERE den > 0""".stripMargin,

    // same rank-defined tail pick over observed-day deltas
    "var_es_daily_revenue" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS di,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |rn AS (SELECT row_number() OVER (ORDER BY di) AS rn, di, rev
        |       FROM daily),
        |diffs AS MATERIALIZED (
        |  SELECT a.di, a.rev - b.rev AS delta
        |  FROM rn a JOIN rn b ON b.rn = a.rn - 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |             greatest(1, CAST(ceil(0.05 * count(*)) AS BIGINT))
        |               AS k
        |      FROM diffs),
        |ranked AS (
        |  SELECT delta, row_number() OVER (ORDER BY delta, di) AS rk
        |  FROM diffs),
        |tail AS (SELECT delta FROM ranked CROSS JOIN m WHERE rk <= k)
        |SELECT m.m AS n_deltas, m.k,
        |       CAST(max(delta) AS BIGINT) AS var_cents,
        |       CAST(CASE WHEN sum(delta) >= 0
        |            THEN CAST(sum(delta) AS HUGEINT) * 1000000 // m.k
        |            ELSE -((-CAST(sum(delta) AS HUGEINT)) * 1000000 // m.k)
        |            END AS BIGINT) AS es_cents_fp
        |FROM tail CROSS JOIN m GROUP BY m.m, m.k""".stripMargin,

    // same (−rev, key) ordering + inclusive-cumulative class rule
    "abc_inventory_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM lineitem GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM rev),
        |cum AS (
        |  SELECT rev, CAST(sum(rev) OVER (ORDER BY -rev, l_partkey)
        |           AS BIGINT) AS cum
        |  FROM rev),
        |classed AS (
        |  SELECT CASE WHEN cum * 10 <= 8 * tot THEN 'A'
        |              WHEN cum * 100 <= 95 * tot THEN 'B'
        |              ELSE 'C' END AS abc_class, rev
        |  FROM cum CROSS JOIN tot)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(rev) AS BIGINT) AS rev_cents,
        |       CAST(CAST(sum(rev) AS HUGEINT) * 1000000 // tot AS BIGINT)
        |         AS share_fp
        |FROM classed CROSS JOIN tot
        |GROUP BY abc_class, tot ORDER BY abc_class""".stripMargin,

    // same truncating unit values + both-months basket
    "laspeyres_paasche_index" ->
      """WITH pm AS (
        |  SELECT l_partkey,
        |         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
        |           AS mi,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |           AS BIGINT) AS ec,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |pmv AS (SELECT l_partkey, mi, q, ec * 1000000 // q AS p_fp
        |        FROM pm),
        |m0 AS (SELECT min(mi) AS mi0 FROM pmv),
        |base AS (SELECT l_partkey, p_fp AS p0, q AS q0
        |         FROM pmv CROSS JOIN m0 WHERE mi = mi0),
        |agg AS (
        |  SELECT pmv.mi, CAST(count(*) AS BIGINT) AS n_parts,
        |         sum(CAST(pmv.p_fp AS HUGEINT) * base.q0) AS lnum,
        |         sum(CAST(base.p0 AS HUGEINT) * base.q0) AS lden,
        |         sum(CAST(pmv.p_fp AS HUGEINT) * pmv.q) AS pnum,
        |         sum(CAST(base.p0 AS HUGEINT) * pmv.q) AS pden
        |  FROM pmv JOIN base ON pmv.l_partkey = base.l_partkey
        |  GROUP BY pmv.mi)
        |SELECT mi, n_parts,
        |       CAST(lnum * 1000000 // lden AS BIGINT) AS laspeyres_fp,
        |       CAST(pnum * 1000000 // pden AS BIGINT) AS paasche_fp,
        |       CAST(FLOOR(sqrt((CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE))
        |         * (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)))
        |         * 1000000.0) AS BIGINT) AS fisher_fp
        |FROM agg ORDER BY mi""".stripMargin,

    // same cohort-month split, pure integer
    "new_returning_revenue_split" ->
      """WITH ords AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |           AS mi,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |cohort AS (SELECT o_custkey, min(mi) AS mi0
        |           FROM ords GROUP BY o_custkey),
        |j AS (SELECT o.mi, o.cents, c.mi0
        |      FROM ords o JOIN cohort c ON o.o_custkey = c.o_custkey),
        |agg AS (
        |  SELECT mi, CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CASE WHEN mi = mi0 THEN cents ELSE 0 END)
        |           AS BIGINT) AS new_rev_cents,
        |         CAST(sum(CASE WHEN mi <> mi0 THEN cents ELSE 0 END)
        |           AS BIGINT) AS ret_rev_cents
        |  FROM j GROUP BY mi)
        |SELECT mi, n_orders, new_rev_cents, ret_rev_cents,
        |       CAST(CAST(new_rev_cents AS HUGEINT) * 1000000
        |         // (new_rev_cents + ret_rev_cents) AS BIGINT)
        |         AS new_share_fp
        |FROM agg ORDER BY mi""".stripMargin,

    // same truncating unit value, identical EOQ leaf text, same
    // broadcast span scalar
    "eoq_reorder_policy" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS ec,
        |         l_shipdate
        |  FROM lineitem),
        |span AS (
        |  SELECT CAST(datediff('day', min(l_shipdate), max(l_shipdate))
        |    + 1 AS BIGINT) AS span_days
        |  FROM li),
        |b AS (
        |  SELECT p.p_brand, CAST(sum(li.q) AS BIGINT) AS demand_qty,
        |         CAST(sum(li.ec) AS BIGINT) AS rev_cents
        |  FROM li JOIN part p ON li.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand),
        |u AS (
        |  SELECT p_brand, demand_qty,
        |         CAST(CAST(rev_cents AS HUGEINT) * 1000000 // demand_qty
        |           AS BIGINT) AS unit_fp
        |  FROM b)
        |SELECT p_brand, demand_qty, unit_fp,
        |  CAST(FLOOR(sqrt(2.0 * CAST(demand_qty AS DOUBLE) * 10000.0
        |    / (0.2 * (CAST(unit_fp AS DOUBLE) / 1000000.0)))
        |    * 1000000.0) AS BIGINT) AS eoq_fp,
        |  CAST(CAST(demand_qty AS HUGEINT) * 7 * 1000000 // span_days
        |    AS BIGINT) AS reorder_fp
        |FROM u CROSS JOIN span ORDER BY p_brand""".stripMargin,

    "newsvendor_order_level" ->
      """WITH dd AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |rn AS (SELECT x,
        |         CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS rn
        |       FROM dd),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM dd),
        |lvl AS (
        |  SELECT nn.n_days, rn.rn AS target_rank, rn.x AS order_up_to
        |  FROM rn CROSS JOIN nn
        |  WHERE rn.rn = (4 * nn.n_days + 8) // 9)
        |SELECT max(lvl.n_days) AS n_days,
        |       max(lvl.target_rank) AS target_rank,
        |       max(lvl.order_up_to) AS order_up_to,
        |       CAST(sum(CASE WHEN dd.x <= lvl.order_up_to THEN 1 ELSE 0
        |         END) AS BIGINT) AS n_days_covered,
        |       CAST(sum(CASE WHEN dd.x <= lvl.order_up_to THEN 1 ELSE 0
        |         END) * 1000000 // max(lvl.n_days) AS BIGINT)
        |         AS coverage_fp
        |FROM dd CROSS JOIN lvl""".stripMargin,

    // same observed-day moment ladder, identical z literals and leaf
    "safety_stock_plan" ->
      """WITH zs(level, z) AS (VALUES
        |  (CAST(90 AS BIGINT), 1.2815515655446004),
        |  (CAST(95 AS BIGINT), 1.6448536269514722),
        |  (CAST(99 AS BIGINT), 2.3263478740408408)),
        |daily AS (
        |  SELECT p.p_brand,
        |         datediff('day', DATE '1970-01-01',
        |                  CAST(li.l_shipdate AS DATE)) AS di,
        |         CAST(sum(CAST(li.l_quantity AS BIGINT)) AS BIGINT) AS dq
        |  FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(dq) AS HUGEINT) AS sd,
        |         sum(CAST(dq AS HUGEINT) * dq) AS sq
        |  FROM daily GROUP BY 1),
        |v AS (
        |  SELECT p_brand, n_days,
        |         CAST(n_days AS HUGEINT) * sq - sd * sd AS varnum
        |  FROM m WHERE n_days >= 2)
        |SELECT v.p_brand, zs.level, v.n_days,
        |  CAST(FLOOR(CAST(z AS DOUBLE)
        |    * sqrt(CAST(varnum AS DOUBLE)
        |      / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
        |    * sqrt(7.0) * 1000000.0) AS BIGINT) AS safety_stock_fp
        |FROM v CROSS JOIN zs ORDER BY v.p_brand, zs.level""".stripMargin,

    // same V32 ABC predicate, same cross-multiplied CV classes
    "abc_xyz_matrix" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS ec,
        |         CAST(l_quantity AS BIGINT) AS q,
        |         datediff('day', DATE '1970-01-01',
        |                  CAST(l_shipdate AS DATE)) // 7 AS wk
        |  FROM lineitem),
        |rev AS (SELECT l_partkey, CAST(sum(ec) AS BIGINT) AS rev
        |        FROM li GROUP BY l_partkey),
        |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS tot FROM rev),
        |abc AS (
        |  SELECT l_partkey, rev,
        |         CASE WHEN cum * 10 <= 8 * tot THEN 'A'
        |              WHEN cum * 100 <= 95 * tot THEN 'B'
        |              ELSE 'C' END AS abc_class
        |  FROM (SELECT l_partkey, rev,
        |               CAST(sum(rev) OVER (ORDER BY -rev, l_partkey)
        |                 AS BIGINT) AS cum
        |        FROM rev) c CROSS JOIN tot),
        |wkq AS (SELECT l_partkey, wk, CAST(sum(q) AS BIGINT) AS wq
        |        FROM li GROUP BY 1, 2),
        |mo AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS nw,
        |         CAST(sum(wq) AS HUGEINT) AS sw,
        |         sum(CAST(wq AS HUGEINT) * wq) AS qw
        |  FROM wkq GROUP BY 1),
        |xyz AS (
        |  SELECT l_partkey,
        |         CASE WHEN nw < 2 THEN 'Z'
        |              WHEN 4 * (nw * qw - sw * sw) * nw
        |                   <= (nw - 1) * sw * sw THEN 'X'
        |              WHEN (nw * qw - sw * sw) * nw
        |                   <= (nw - 1) * sw * sw THEN 'Y'
        |              ELSE 'Z' END AS xyz_class
        |  FROM mo)
        |SELECT a.abc_class, x.xyz_class,
        |       CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(CAST(sum(a.rev) AS HUGEINT) * 1000000 // tot
        |         AS BIGINT) AS rev_share_fp
        |FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
        |CROSS JOIN tot
        |GROUP BY a.abc_class, x.xyz_class, tot
        |ORDER BY a.abc_class, x.xyz_class""".stripMargin,
  )
}
