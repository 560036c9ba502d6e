package graft

import org.apache.spark.sql.functions._

/** The custom AS-OF JOIN operator (graft.plans.AsofJoin*): plan shape,
  * semantics on hand-built edges, and equivalence with the composable
  * candidate-explosion form on fixture data.
  */
class AsofJoinSpec extends SparkSpec {

  private def tiny = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // user 10: two prior rights → latest wins
      (2L, 10L, 250L),
      (3L, 20L, 50L),  // user 20: right only AFTER → no match
      (4L, 30L, 100L), // user 30: no right rows at all
      (5L, 40L, 100L)  // user 40: right exactly AT left time (<= includes)
    ).toDF("l_id", "l_user", "l_ts")
    val right = Seq(
      (11L, 10L, 90L), (12L, 10L, 200L),
      (13L, 20L, 60L),
      (14L, 40L, 100L)
    ).toDF("r_id", "r_user", "r_ts")
    (left, right)
  }

  test("as-of semantics: latest <=, unmatched nulls, exact-time inclusion") {
    val (l, r) = tiny
    val got = graft.plans.AsofJoinOps
      .asofJoin(l, r, Seq("l_user"), Seq("r_user"), "l_ts", "r_ts")
      .orderBy("l_id")
      .collect()
      .map(row => (row.getLong(0), Option(row.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      1L -> Some(11L), // only 90 <= 100
      2L -> Some(12L), // 200 beats 90
      3L -> None,      // 60 > 50
      4L -> None,      // no user-30 rights
      5L -> Some(14L)  // 100 <= 100
    ))
  }

  test("NULL join keys match nothing (SQL/DuckDB ASOF equality)") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(10L), 100L),
      (2L, Option.empty[Long], 100L), // null left key → null right, always
      (3L, Option(20L), 100L)
    ).toDF("l_id", "l_user", "l_ts")
    val right = Seq(
      (11L, Option(10L), 90L),
      (12L, Option.empty[Long], 50L), // null right key → never a candidate
      (13L, Option(20L), 80L)
    ).toDF("r_id", "r_user", "r_ts")
    val got = graft.plans.AsofJoinOps
      .asofJoin(left, right, Seq("l_user"), Seq("r_user"), "l_ts", "r_ts")
      .orderBy("l_id").collect()
      .map(row => (row.getLong(0), Option(row.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      1L -> Some(11L),
      2L -> None,      // NOT matched to the null-keyed right row
      3L -> Some(13L)
    ))
  }

  test("physical plan: AsofJoinExec with EnsureRequirements-planned exchange+sort per side") {
    val (l, r) = tiny
    val df = graft.plans.AsofJoinOps
      .asofJoin(l, r, Seq("l_user"), Seq("r_user"), "l_ts", "r_ts")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsofJoin"), s"operator not planned:\n$phys")
    // the declared requirements must have drawn one shuffle + sort per side
    assert("Exchange hashpartitioning".r.findAllIn(phys).size >= 2, phys)
    assert("\\bSort \\[".r.findAllIn(phys).size >= 2, phys)
  }

  test("equivalence with the candidate-explosion composition on fixture events") {
    val ev = Tables.events(spark, sf())
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts_us").as("p_ts"))
      .agg(max("event_id").as("purchase_id"))
    val got = graft.plans.AsofJoinOps
      .asofJoin(clicks, purchases, Seq("user_id"), Seq("p_user"), "ts_us", "p_ts")
      .select("event_id", "purchase_id", "p_ts").orderBy("event_id").collect()

    // reference: explode candidates, keep max p_ts per click (left outer)
    val cand = clicks.join(purchases,
        col("user_id") === col("p_user") && col("p_ts") <= col("ts_us"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(col("p_ts").desc_nulls_last)
    val want = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "purchase_id", "p_ts").orderBy("event_id").collect()

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w0) => assert(g === w0) }
  }

  test("ship_latency_by_priority: rank-defined median replays; lines partition") {
    val rows = operators.JoinOps
      .queries("ship_latency_by_priority")(spark, sf()).collect()
    val od = Tables.orders(spark, sf())
      .selectExpr("o_orderkey", "o_orderpriority",
        "CAST(to_date(o_orderdate) AS STRING) AS od").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val lags = Tables.lineitem(spark, sf())
      .selectExpr("l_orderkey", "CAST(to_date(l_shipdate) AS STRING) AS sd")
      .collect()
      .map { r =>
        val (p, odate) = od(r.getLong(0))
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(odate),
          java.time.LocalDate.parse(r.getString(1)))
        (p, days)
      }
    val byP = lags.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byP.keySet)
    assert(rows.map(_.getLong(1)).sum === lags.length.toLong,
      "every line counted exactly once")
    rows.foreach { r =>
      val ds = byP(r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) === ds.length.toLong)
      // median value at rank ceil(n/2) is tie-insensitive
      assert(r.getLong(2) === ds(math.ceil(ds.length * 0.5).toInt - 1),
        s"median for ${r.getString(0)}")
      assert(r.getLong(3) === ds.min && r.getLong(4) === ds.max)
    }
  }
}
