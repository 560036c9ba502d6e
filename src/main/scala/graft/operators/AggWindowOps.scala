package graft.operators

import graft.{Det, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation beyond plain group-by (SURVEY.md §2.G3-G6) and the window
  * surface the warehouse schema was built for (§2.H — every entity carries
  * a `popularity` score, tracks carry ordinals; artists_schema.json:4,
  * tracks_schema.json:12-26).
  *
  * Scale notes: cube/rollup multiply output rows, not input shuffles — one
  * pass with grouping-id expansion. Window partitions key on high-card
  * columns (suppkey/custkey) so state per partition stays bounded; the
  * running-frame query uses a cumulative DECIMAL sum, which keeps partial
  * ordering deterministic and spill-safe.
  */
object AggWindowOps extends OpGroup {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G3 — cube subtotals (the BigQuery analytics surface the tables
    // target, terraform/main.tf:66-96). Subtotal NULLs rendered as 'ALL'
    // so the oracle compare is collation-free.
    "grouping_sets_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty"))
        .orderBy("rflag", "lstatus")),

    // G4 — distinct aggregation inside groups (app.py:164,185-188).
    "agg_distinct_in_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // G5 — first-page total drives fan-out planning (app.py:157-158):
    // total count → number of 50-item pages, computed in-plan (no
    // driver-side collect).
    "first_page_total" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("total"))
        .select(col("total"),
          ceil(col("total") / lit(50.0)).cast("long").as("n_pages"))),

    // G6 — order-sensitive collect (albums carry their track list in
    // declared order, albums_schema.json:123-209). Canonical string form
    // because nested lists hash differently across engines (SURVEY §7).
    "ordered_agg_collect" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(expr("concat_ws(',', transform(sort_array(collect_list(l_linenumber)), x -> cast(x AS string)))")
          .as("linenumbers"),
          count(lit(1)).as("n"))
        .orderBy("l_orderkey")),

    // W1 — top-k per group by score (top tracks per album by popularity).
    // row_number with full tiebreak; plans as running rank, no global sort.
    "rank_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_extendedprice")
        .orderBy("l_suppkey", "rn")
    }),

    // W2 — release-to-release gap per artist (lag over date order).
    "lag_lead_release" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lag(col("o_orderdate"), 1).over(w).cast("date")).as("gap_days"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // W3 — running cumulative aggregate (cumulative popularity). DECIMAL
    // accumulator keeps every prefix sum exact, so each output row is
    // reproducible under any physical partitioning.
    "running_frame_agg" -> ((s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(sum(col("l_quantity").cast(DecimalType(18, 6))).over(w)
            .cast("double"), 6).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
    }),

    // W3b — time-based RANGE frame: trailing 30-minute event rate per
    // user (frame bounds by VALUE distance on epoch-µs, not row count —
    // the only correct frame when event spacing is irregular). DECIMAL
    // accumulator keeps every trailing sum exact under any partitioning.
    "range_frame_trailing" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-1800000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("n_30m", count(lit(1)).over(w))
        .withColumn("sum_30m",
          round(sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast("double"), 6))
        .select("event_id", "user_id", "ts_us", "n_30m", "sum_30m")
        .orderBy("event_id")
    }),

    // W4 — deciles / percentile ranks over a score (popularity analog).
    // The semantic is a GLOBAL ranking, but the scale-safe plan is the
    // two-pass CDF: a two-phase global rank (GlobalRank — never a
    // partition-less window) + a broadcast total count, then
    // ntile/percent_rank/cume_dist by their closed-form definitions.
    // The ordering key (c_acctbal, c_custkey) is unique, so rank-based
    // formulas match the tie-aware window functions exactly.
    "ntile_percentile" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val ranked = graft.functions.GlobalRank.rowNumber(
        c, "rn", Nil, Seq("c_acctbal", "c_custkey"))
      val total = c.agg(count(lit(1)).as("n"))
      // ntile(10): the first (n mod 10) buckets carry ceil(n/10) rows.
      val q = floor(col("n") / 10)
      val r = col("n") % 10
      val cut = r * (q + 1)
      ranked.crossJoin(broadcast(total))
        .select(col("c_custkey"),
          when(col("rn") <= cut, floor((col("rn") - 1) / (q + 1)) + 1)
            .otherwise(r + floor((col("rn") - cut - 1) / q) + 1)
            .cast("int").as("decile"),
          when(col("n") === 1, lit(0.0))
            .otherwise(round((col("rn") - 1).cast("double") / (col("n") - 1), 6))
            .as("pct_rank"),
          round(col("rn").cast("double") / col("n"), 6).as("cume"))
        .orderBy("c_custkey")
    }),

    // W5 — month-over-month revenue growth per nation: the BI trend
    // report every warehouse serves. The lag window runs over the
    // nation×month AGGREGATE (|nations|·|months| rows — broadcast-sized
    // at any corpus scale), partitioned by nation, never over the order
    // stream. Revenue = exact integer cents; growth is SIGNED, so it is
    // derived as (cur·1e6 DIV prev) − 1e6 — the division runs on
    // positive operands only, where Spark's toward-zero DIV and
    // DuckDB's floor // agree (a direct (cur−prev)·1e6/prev would
    // diverge on negative growth).
    "mom_revenue_growth" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val nm = ords
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "month").agg(sum("cents").as("rev_cents"))
      val w = Window.partitionBy("n_name").orderBy("month")
      nm.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .select(col("n_name"), col("month"), col("rev_cents"),
          col("prev_cents"),
          expr("rev_cents * 1000000 DIV prev_cents - 1000000")
            .as("growth_fp"))
        .orderBy("n_name", "month")
    }),

    // W6 — the remaining rank-window surface in one query: percent_rank
    // and cume_dist of each month's revenue within its nation (ordered
    // by (rev DESC, month) — a TOTAL order, so both are exact rationals
    // over small integers and IEEE-identical across engines), plus
    // nth_value(3) over the full partition frame (the 3rd-best month's
    // revenue). Partitions are nation × ≤ calendar months — bounded.
    "window_rank_suite" -> ((s, d) => {
      val ords = Tables.orders(s, d).select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      val nm = ords
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "month").agg(sum("cents").as("rev_cents"))
      val byRev = Window.partitionBy("n_name")
        .orderBy(col("rev_cents").desc, col("month"))
      val full = byRev.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      nm.withColumn("pr", round(percent_rank().over(byRev), 6))
        .withColumn("cd", round(cume_dist().over(byRev), 6))
        .withColumn("third_best_cents", nth_value(col("rev_cents"), 3).over(full))
        .select("n_name", "month", "rev_cents", "pr", "cd",
          "third_best_cents")
        .orderBy("n_name", "month")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "grouping_sets_cube" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rflag,
         |       coalesce(l_linestatus, 'ALL') AS lstatus,
         |       count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY rflag, lstatus""".stripMargin,
    "agg_distinct_in_group" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "first_page_total" ->
      """SELECT count(*) AS total,
        |       CAST(ceil(count(*) / 50.0) AS BIGINT) AS n_pages
        |FROM lineitem""".stripMargin,
    "ordered_agg_collect" ->
      """SELECT l_orderkey,
        |       array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS linenumbers,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "rank_topk_per_group" ->
      """SELECT l_suppkey, rn, l_orderkey, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "lag_lead_release" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_orderkey, 1) OVER w AS prev_orderkey,
        |       CAST(date_diff('day',
        |         CAST(lag(o_orderdate, 1) OVER w AS DATE),
        |         CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "running_frame_agg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) OVER (
        |         PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        |         AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""".stripMargin,
    "range_frame_trailing" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |       count(*) OVER w AS n_30m,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
        |         AS sum_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "ntile_percentile" ->
      """SELECT c_custkey,
        |       ntile(10) OVER w AS decile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    // identical month truncation, cents lift, and positive-operand
    // division form for the signed growth
    "mom_revenue_growth" ->
      """WITH nm AS (
        |  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE)
        |           AS month,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, month)
        |SELECT n_name, month, rev_cents,
        |       lag(rev_cents) OVER w AS prev_cents,
        |       CAST(rev_cents * 1000000 // lag(rev_cents) OVER w - 1000000
        |         AS BIGINT) AS growth_fp
        |FROM nm WINDOW w AS (PARTITION BY n_name ORDER BY month)
        |ORDER BY n_name, month""".stripMargin,

    "window_rank_suite" ->
      """WITH nm AS (
        |  SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE)
        |           AS month,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev_cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, month)
        |SELECT n_name, month, rev_cents,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd,
        |       nth_value(rev_cents, 3) OVER (PARTITION BY n_name
        |         ORDER BY rev_cents DESC, month
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS third_best_cents
        |FROM nm
        |WINDOW w AS (PARTITION BY n_name ORDER BY rev_cents DESC, month)
        |ORDER BY n_name, month""".stripMargin,
  )
}
