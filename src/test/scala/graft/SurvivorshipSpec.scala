package graft

import org.apache.spark.sql.functions._

/** Semantic pins for golden_record_merge and window_rank_suite: the
  * survivorship field rules replay against direct aggregates, and the
  * rank-window columns obey their defining identities (pr/cd ranges,
  * the third-best constant-per-partition contract).
  */
class SurvivorshipSpec extends SparkSpec {

  test("golden_record_merge: one row per customer; field rules hold") {
    val rows = operators.SurvivorshipOps
      .queries("golden_record_merge")(spark, sf()).collect()
    val nCust = Tables.orders(spark, sf())
      .select("o_custkey").distinct().count()
    assert(rows.length === nCust, "one golden record per ordering customer")
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length === keys.length)
    rows.foreach { r =>
      val (n, total, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (first, last) = (r.getDate(4), r.getDate(5))
      assert(n >= 1 && mx <= total)
      assert(!first.after(last), "first order date <= last order date")
    }
    // spot-replay one customer's record against direct aggregation
    val k = keys.head
    val direct = Tables.orders(spark, sf())
      .filter(col("o_custkey") === k)
      .agg(count(lit(1)), sum(expr("CAST(round(o_totalprice*100) AS BIGINT)")))
      .collect()(0)
    val Array(mine) = rows.filter(_.getLong(0) == k)
    assert(mine.getLong(1) === direct.getLong(0))
    assert(mine.getLong(2) === direct.getLong(1))
  }

  test("window_rank_suite: pr/cd identities and third-best contract") {
    val rows = operators.AggWindowOps
      .queries("window_rank_suite")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val n = g.length
      // pr spans exactly [0, 1] over a total order; cd ends at 1
      val prs = g.map(_._3).sorted
      assert(math.abs(prs.head) < 1e-9)
      if (n > 1) assert(math.abs(prs.last - 1.0) < 1e-9)
      val cds = g.map(_._4).sorted
      assert(math.abs(cds.last - 1.0) < 1e-9)
      // third_best is the same value on every row of the partition and
      // equals the 3rd-largest revenue (present iff n >= 3)
      val tb = g.map(_._5).distinct
      assert(tb.length === 1)
      if (n >= 3)
        assert(tb.head.contains(g.map(_._2).sorted(Ordering[Long].reverse)(2)))
      else assert(tb.head.isEmpty)
    }
  }

  test("fellegi_sunter_weights: pair conservation + weight monotonicity") {
    val rows = operators.SurvivorshipOps
      .queries("fellegi_sunter_weights")(spark, sf()).collect()
    assert(rows.length === 4, "the 2-field agreement-pattern grid")
    // Σ pattern pairs = Σ within-nation-block C(n, 2), independently
    val blockPairs = Tables.customer(spark, sf())
      .groupBy("c_nationkey").count().collect()
      .map(r => { val n = r.getLong(1); n * (n - 1) / 2 }).sum
    assert(rows.map(_.getLong(2)).sum === blockPairs,
      "patterns partition the blocked candidate space")
    rows.foreach(r => assert(r.getLong(2) >= 0L))
    val w = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // each field's agreement adds a positive log-odds increment
    // (m = 0.9 exceeds both u's), so weights are monotone in the
    // pattern lattice and the increments are additive/symmetric
    assert(w((1L, 1L)) > w((1L, 0L)) && w((1L, 1L)) > w((0L, 1L)))
    assert(w((1L, 0L)) > w((0L, 0L)) && w((0L, 1L)) > w((0L, 0L)))
    assert(math.abs(
      (w((1L, 1L)) - w((0L, 1L))) - (w((1L, 0L)) - w((0L, 0L)))) <= 1L,
      "field contributions are additive up to floor truncation")
  }
}
