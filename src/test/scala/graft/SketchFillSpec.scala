package graft

import org.apache.spark.sql.functions._

/** Semantic pins for SketchFillOps — the sketch error bound and the
  * LOCF fill laws the oracle hash can't name.
  */
class SketchFillSpec extends SparkSpec {

  test("quantile_sketch_merge: estimate within one bin of the exact quantile") {
    val rows = operators.SketchFillOps.queries("quantile_sketch_merge")(
      spark, sf()).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(50L, 90L, 99L))
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4),
        s"p${r.getLong(0)}: |est−exact| ${r.getLong(3)} > bin width ${r.getLong(4)}")
      assert(r.getLong(1) <= r.getLong(2),
        "lower-edge estimate cannot exceed the exact quantile")
    }
    // exact quantiles are monotone in q
    val ex = rows.map(_.getLong(2))
    ex.zip(ex.tail).foreach { case (a, b) => assert(a <= b) }
  }

  test("locf_gapfill_daily: fill is dense, ordered, and carries the last value") {
    val rows = operators.SketchFillOps.queries("locf_gapfill_daily")(
      spark, sf()).collect()
    val byNation = rows.groupBy(_.getLong(0))
    val spanLens = byNation.values.map(_.length).toSet
    assert(spanLens.size === 1, "every nation gets the full spine")
    byNation.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).distinct.length === sorted.length,
        "one row per day")
      var carry = 0L
      sorted.foreach { r =>
        if (!r.isNullAt(2)) carry = r.getLong(2)
        assert(r.getLong(3) === carry, s"LOCF at day ${r.getLong(1)}")
        val src = r.getString(4)
        if (!r.isNullAt(2)) assert(src === "obs")
        else assert(src === "locf" || src === "none")
      }
    }
    // observed values reconcile with the direct daily aggregate
    val nObs = rows.count(r => !r.isNullAt(2))
    val direct = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf()),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"),
        to_date(col("o_orderdate")).as("dt"))
      .distinct().count()
    assert(nObs.toLong === direct, "observed cells = distinct (nation, day)")
  }

  test("kmv_distinct_sketch: estimator accuracy + exact-count replay") {
    val rows = operators.SketchFillOps.queries("kmv_distinct_sketch")(
      spark, sf()).collect()
    val exact = Tables.events(spark, sf())
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val (t, n, hk, est, err) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n === exact(t), "exact NDV replay")
      assert(hk > 0L && hk < 281474976710656L, "48-bit hash range")
      assert(err === math.abs(est - n) * 1000000L / n, "error replay")
      if (n <= 64) assert(est === n, "undersized sketch is exact")
      else assert(err <= 600000L,
        s"$t: KMV(64) ~13% SE estimator off by ${err}ppm")
    }
  }
}
