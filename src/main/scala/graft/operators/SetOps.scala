package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k / set operations (SURVEY.md §2.I).
  *
  * Reference behaviors: `limit: 1` search and 50-item page caps
  * (app.py:141,154,185); `extend()` page accumulation = bag-semantics
  * union (app.py:156,163,176,198); REPEATED `available_markets`
  * intersection capability (albums_schema.json:57-61); staged-but-not-
  * enriched complement (app.py:188,206).
  *
  * Scale notes: O1 plans TakeOrderedAndProject (per-partition top-k +
  * driver merge of k·partitions rows — no global sort); O2 is the one
  * deliberate global range-partitioned sort; unions are metadata-only
  * (no shuffle); intersect/except hash-shuffle both sides on the full row.
  */
object SetOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1 — order-by-limit top-k: no full sort at scale.
    "order_by_limit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")),

    // O2 — deterministic global sort (range-partitioned exchange).
    "global_sort" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    // O3 — bag-semantics union (extend() keeps duplicates): overlapping
    // slices unioned, appearance counts prove no dedup happened.
    "union_pages" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val b = o.filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey")
      a.unionByName(b)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_appearances"))
        .orderBy("o_orderkey")
    }),

    // O4 — set intersection (markets ∩ markets analog).
    "intersect_markets" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val done = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F").select("o_custkey")
      urgent.intersect(done).orderBy("o_custkey")
    }),

    // O5 — set difference: ids staged but never enriched.
    "except_missing" -> ((s, d) => {
      val all = Tables.orders(s, d).select("o_custkey")
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      all.except(urgent).orderBy("o_custkey")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "order_by_limit" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey
        |LIMIT 100""".stripMargin,
    "global_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "union_pages" ->
      """SELECT o_orderkey, count(*) AS n_appearances FROM (
        |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "intersect_markets" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "except_missing" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,
  )
}
