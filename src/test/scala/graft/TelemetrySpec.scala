package graft

import org.apache.spark.sql.functions._

/** Semantic pins for TelemetryOps — the merge law, conservation, and
  * OHLC ordering invariants the oracle hash can't name.
  */
class TelemetrySpec extends SparkSpec {
  private def run(key: String) =
    operators.TelemetryOps.queries(key)(spark, sf()).collect()

  test("incremental_stats_merge: the two-level fold equals the direct fold") {
    val Array(r) = run("incremental_stats_merge")
    val direct = Tables.lineitem(spark, sf())
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
      .agg(count(lit(1)), sum("c"), min("c"), max("c"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")))
      .collect()(0)
    assert(r.getLong(1) === direct.getLong(0), "n_rows merges")
    assert(r.getLong(2) === direct.getLong(1), "sum merges")
    assert(r.getLong(3) === direct.getLong(2), "min merges")
    assert(r.getLong(4) === direct.getLong(3), "max merges")
    // sumsq_cents crosses the SELECT boundary as a digit string (r12
    // decimal ban); parse back for the exact merge-law compare
    assert(new java.math.BigDecimal(r.getString(5))
        .compareTo(direct.getDecimal(4)) === 0,
      "sum of squares merges")
    assert(r.getLong(0) >= 1 && r.getLong(0) <= 16, "shard count bounded")
  }

  test("join_key_skew_profile: histogram conserves keys and rows") {
    val rows = run("join_key_skew_profile")
    val li = Tables.lineitem(spark, sf())
    assert(rows.map(_.getLong(2)).sum === li.count(),
      "rows_carried partitions the fact table")
    assert(rows.map(_.getLong(1)).sum ===
      li.select("l_orderkey").distinct().count(),
      "n_keys partitions the key domain")
    rows.foreach(r => assert(r.getLong(2) === r.getLong(0) * r.getLong(1)))
  }

  test("ohlc_downsample: bars bound their contents and conserve events") {
    val rows = run("ohlc_downsample")
    assert(rows.map(_.getLong(2)).sum === Tables.events(spark, sf()).count())
    rows.foreach { r =>
      val (n, open, high, low, close) = (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n >= 1)
      assert(low <= high)
      assert(open >= low && open <= high, "open inside the bar range")
      assert(close >= low && close <= high, "close inside the bar range")
      if (n == 1) assert(open === close && open === high && open === low)
    }
    // bars are unique per (type, bucket) and sorted
    val keys = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
    assert(keys.sorted.sameElements(keys))
  }
}
