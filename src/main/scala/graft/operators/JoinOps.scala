package graft.operators

import graft.{Det, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.D).
  *
  * Reference behaviors re-expressed as relational joins:
  *   - batched id→object enrichment, `/albums?ids=…` chunks of 20
  *     (app.py:167-177) → broadcast semi join of a small id set against the
  *     big fact table
  *   - track-id batch enrichment, nulls dropped (app.py:192-199, 206) →
  *     inner join; the pre-filter view is a left join with null probes and
  *     the complement an anti join
  *   - track-carries-album embedding (tracks_schema.json:107-170) →
  *     parent-child equi-join
  *   - artists→albums→tracks traversal (app.py:139-199) → multi-way star
  *     join; Catalyst/AQE choose broadcast vs shuffle per side
  *   - release_date string + precision (albums_schema.json:22-31) → range
  *     join against a tiny broadcast calendar of precision intervals
  *
  * Scale notes: the only non-equi join (J7) keeps its build side O(years),
  * so the BroadcastNestedLoopJoin it plans is a per-row probe of a handful
  * of intervals — safe at 100 TB. Every other join is an equi-join Catalyst
  * can shuffle-partition or broadcast; small-dim sides carry explicit
  * `broadcast()` hints.
  */
object JoinOps extends OpGroup {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 — broadcast semi-join enrichment gate (app.py:167-177): rich
    // suppliers' id set pruned into the lineitem scan.
    "enrich_broadcast_semi" -> ((s, d) => {
      val ids = Tables.supplier(s, d)
        .filter(col("s_acctbal") > 5000).select("s_suppkey")
      Tables.lineitem(s, d)
        .join(broadcast(ids), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_suppkey")
    }),

    // J2 — inner-join enrichment (app.py:192-199): urgent-order ids → rows.
    "enrich_inner_join" -> ((s, d) => {
      val ids = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      Tables.lineitem(s, d)
        .join(ids, col("l_orderkey") === col("o_orderkey"), "inner")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    }),

    // J3 — parent-child join, child rows carrying parent fields flattened
    // (tracks embed their album; README.md:18).
    "parent_child_join" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")),

    // J4 — left join with null probes (batch endpoints return null per
    // missing id, app.py:198).
    "left_join_null_probe" -> ((s, d) => {
      val heavy = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 49).select("l_orderkey").distinct()
      Tables.orders(s, d)
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(col("o_orderkey"),
          col("l_orderkey").isNotNull.as("has_heavy_item"))
        .orderBy("o_orderkey")
    }),

    // J5 — anti join: ids that enriched to nothing (app.py:206's drop).
    "anti_join_missing" -> ((s, d) => {
      val heavy = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 49).select("l_orderkey").distinct()
      Tables.orders(s, d)
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // J9 — FULL OUTER join (the remaining cell of the join matrix;
    // right-outer is its mirror): two deliberately part-overlapping
    // slices so BOTH unmatched sides surface with NULLs. One shuffle
    // per side on the key; coalesce resolves the surviving key.
    "full_outer_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 3 === 0)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      o.join(l, col("o_orderkey") === col("l_orderkey"), "full_outer")
        .select(
          coalesce(col("o_orderkey"), col("l_orderkey")).as("order_key"),
          col("o_orderstatus"),
          col("sum_qty"),
          col("o_orderkey").isNotNull.as("in_orders"),
          col("l_orderkey").isNotNull.as("in_lineitem"))
        .orderBy("order_key")
    }),

    // J6 — star join over all five relations (the pipeline's whole point,
    // app.py:139-199): revenue by region/nation. region+nation broadcast;
    // customer⋈orders⋈lineitem shuffle on their keys.
    "star_join_3way" -> ((s, d) => {
      val r = broadcast(Tables.region(s, d))
      val n = broadcast(Tables.nation(s, d))
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d).select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"), dsum(col("rev")).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // J7 — range join (release_date precision semantics,
    // albums_schema.json:22-31): orders matched into year intervals via a
    // tiny broadcast calendar — O(years) build side stays broadcast-able
    // at any fact-table scale.
    // J7b — as-of join as a FIRST-CLASS operator (custom LogicalPlan +
    // SparkStrategy + merge-join SparkPlan — graft.plans.AsofJoin): for
    // every click, the user's latest purchase at-or-before it. The right
    // side is pre-aggregated to one row per (user, ts) so the as-of pick
    // is tie-free; the oracle is DuckDB's NATIVE `ASOF LEFT JOIN` —
    // engine-vs-engine on the operator semantics itself.
    "asof_join_custom" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
        .agg(max("event_id").as("purchase_id"))
      graft.plans.AsofJoinOps.asofJoin(clicks, purchases,
          Seq("user_id"), Seq("p_user"), "ts_us", "p_ts")
        .select("event_id", "user_id", "ts_us", "purchase_id", "p_ts")
        .orderBy("event_id")
    }),

    "range_asof_join" -> ((s, d) => {
      val years = s.range(1992, 2000).toDF("y")
        .select(col("y"),
          expr("make_timestamp(y, 1, 1, 0, 0, 0)").as("y_start"),
          expr("make_timestamp(y + 1, 1, 1, 0, 0, 0)").as("y_end"))
      Tables.orders(s, d)
        .join(broadcast(years),
          col("o_orderdate") >= col("y_start") && col("o_orderdate") < col("y_end"))
        .groupBy("y")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("y")
    }),

    // J10 — order→ship latency distribution per priority class: the
    // SLA report a fulfilment warehouse runs nightly. Lag is exact
    // integer DAYS (both engines truncate the timestamp to its date
    // first — no hour-boundary convention exposed); the median is
    // rank-defined per priority over a TOTAL order (lag, orderkey,
    // linenumber, partkey, suppkey — (orderkey, linenumber) alone is
    // NOT unique in this fixture, the §12 trap). Priorities are 5
    // values over the whole fact table — GlobalRank's low-cardinality
    // case; the join itself is the plain o↔l equi-join AQE handles.
    "ship_latency_by_priority" -> ((s, d) => {
      val f = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority").as("p"),
          col("o_orderdate"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("p"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lag_days"),
          col("o_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
      val ranked = graft.functions.GlobalRank.rowNumber(f, "rn", Seq("p"),
        Seq("lag_days", "o_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
      val cnts = f.groupBy("p").agg(count(lit(1)).as("n"))
      ranked.join(broadcast(cnts), "p")
        .groupBy("p")
        .agg(count(lit(1)).as("n_lines"),
          min(when(col("rn") === ceil(col("n") * 0.5), col("lag_days")))
            .as("median_days"),
          min("lag_days").as("min_days"), max("lag_days").as("max_days"))
        .orderBy("p")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // quantities are integral in the fixture, so the BIGINT cast-sum is
    // exact and rounding-direction differences cannot arise
    "full_outer_join" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders
        |           WHERE o_orderkey % 2 = 0),
        |l AS (SELECT l_orderkey,
        |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |      FROM lineitem WHERE l_orderkey % 3 = 0 GROUP BY l_orderkey)
        |SELECT coalesce(o_orderkey, l_orderkey) AS order_key,
        |       o_orderstatus, sum_qty,
        |       (o_orderkey IS NOT NULL) AS in_orders,
        |       (l_orderkey IS NOT NULL) AS in_lineitem
        |FROM o FULL OUTER JOIN l ON o_orderkey = l_orderkey
        |ORDER BY order_key""".stripMargin,
    "enrich_broadcast_semi" ->
      s"""SELECT l_suppkey, count(*) AS n_items, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
         |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "enrich_inner_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "parent_child_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       o_custkey, o_orderstatus, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "left_join_null_probe" ->
      """SELECT o_orderkey, (h.l_orderkey IS NOT NULL) AS has_heavy_item
        |FROM orders LEFT JOIN
        |  (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity > 49) h
        |  ON o_orderkey = h.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "anti_join_missing" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN
        |  (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "star_join_3way" ->
      s"""SELECT r_name, n_name, count(*) AS n_items,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation   ON c_nationkey = n_nationkey
         |  JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "range_asof_join" ->
      s"""SELECT y, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders JOIN (SELECT range AS y FROM range(1992, 2000)) years
         |  ON o_orderdate >= CAST(CAST(y AS VARCHAR) || '-01-01' AS TIMESTAMP)
         | AND o_orderdate <  CAST(CAST(y + 1 AS VARCHAR) || '-01-01' AS TIMESTAMP)
         |GROUP BY y ORDER BY y""".stripMargin,
    "asof_join_custom" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |clicks AS (
        |  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id AS p_user, ts_us AS p_ts, max(event_id) AS purchase_id
        |  FROM ev WHERE event_type = 'purchase' GROUP BY p_user, p_ts)
        |SELECT c.event_id, c.user_id, c.ts_us, p.purchase_id, p.p_ts
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.p_user AND p.p_ts <= c.ts_us
        |ORDER BY c.event_id""".stripMargin,

    // identical date-truncated day lag and rank-defined median; the
    // rank's tie chain extends to (partkey, suppkey) — §12 uniqueness
    "ship_latency_by_priority" ->
      """WITH f AS (
        |  SELECT o.o_orderpriority AS p,
        |         datediff('day', o.o_orderdate, l.l_shipdate) AS lag_days,
        |         o.o_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |r AS (
        |  SELECT p, lag_days,
        |         row_number() OVER (PARTITION BY p ORDER BY lag_days,
        |           o_orderkey, l_linenumber, l_partkey, l_suppkey) AS rn,
        |         count(*) OVER (PARTITION BY p) AS n
        |  FROM f)
        |SELECT p, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(min(CASE WHEN rn = ceil(n * 0.5) THEN lag_days END)
        |         AS BIGINT) AS median_days,
        |       CAST(min(lag_days) AS BIGINT) AS min_days,
        |       CAST(max(lag_days) AS BIGINT) AS max_days
        |FROM r GROUP BY p ORDER BY p""".stripMargin,
  )
}
