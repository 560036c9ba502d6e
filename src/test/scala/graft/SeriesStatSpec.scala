package graft

/** Semantic pins for SeriesStatOps: ACF range and lag-0 identity
  * (implicitly r_0 = 1 via den), a brute-force replay of the lag-1
  * numerator, Ljung–Box non-negativity, and LTV monotonicity (the
  * cumulative curve never decreases and ends at the cohort total).
  */
class SeriesStatSpec extends SparkSpec {
  private def run(key: String) =
    operators.SeriesStatOps.queries(key)(spark, sf()).collect()

  private lazy val daily: Array[(Int, Long)] =
    Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)

  test("autocorrelation_profile: |r| <= 1e6; lag-1 numerator replays") {
    val rows = run("autocorrelation_profile")
    assert(rows.nonEmpty && rows.length <= 7)
    val n = daily.length.toLong
    val s = daily.map(_._2).sum
    val dd = daily.map { case (di, x) => (di, n * x - s) }.toMap
    val den = dd.values.map(v => v * v).sum
    rows.foreach { r =>
      val (lag, nt, num, d, rfp) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lag >= 1 && lag <= 7)
      assert(d === den, "shared denominator")
      assert(math.abs(rfp) <= 1000000L, "|r| <= 1 (Cauchy-Schwarz)")
      // brute-force numerator: calendar-aligned pairs at this lag
      val bnum = daily.flatMap { case (di, _) =>
        dd.get(di + lag.toInt).map(b => dd(di) * b)
      }.sum
      val bnt = daily.count { case (di, _) => dd.contains(di + lag.toInt) }
      assert(num === bnum && nt === bnt, s"lag $lag replay")
    }
  }

  test("ljung_box_q: Q >= 0 and lag count matches the profile") {
    val Array(r) = run("ljung_box_q")
    val (nDays, nLags, q) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nDays === daily.length.toLong)
    assert(nLags === run("autocorrelation_profile").length.toLong)
    assert(q >= -nLags, "Q >= 0 up to per-lag floor slack")
  }

  test("cohort_ltv_curve: cumulative is monotone and starts at age 0") {
    val rows = run("cohort_ltv_curve")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._2 === 0, "every cohort has an age-0 row")
      // cumulative replays as the prefix sum of the per-age revenue
      var acc = 0L
      sorted.foreach { case (_, _, nUsers, rev, cum) =>
        acc += rev
        assert(cum === acc, "cum is the exact prefix sum")
        assert(nUsers > 0)
      }
    }
    // total LTV mass across cohorts at age<=11 never exceeds total rev
    val totalRev = Tables.orders(spark, sf())
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
        .expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(rows.map(_._4).sum <= totalRev)
  }

  test("seasonal_mann_kendall: per-season S replays; z from exact ints") {
    import org.apache.spark.sql.functions._
    val rows = operators.SeriesStatOps
      .queries("seasonal_mann_kendall")(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length <= 12)
    val sTot = rows.head.getLong(4)
    val var18 = rows.head.getLong(5)
    assert(rows.map(_.getLong(2)).sum === sTot, "S_m folds to S")
    assert(rows.map(_.getLong(3)).sum === var18, "var18_m folds")
    rows.foreach { r =>
      val (n, sm) = (r.getLong(1), r.getLong(2))
      assert(math.abs(sm) <= n * (n - 1) / 2, "S_m bounded by pairs")
      assert(r.getLong(3) <= n * (n - 1) * (2 * n + 5),
        "tie correction only subtracts")
    }
    // z replay from the exact integer pair
    val adj = if (sTot > 0) sTot - 1 else if (sTot < 0) sTot + 1 else 0L
    val expectZ = BigDecimal(adj / math.sqrt(var18 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.head.getDouble(6) - expectZ) < 1e-9)
    // brute-force replay of one season's sign sum from the raw table
    val monthly = Tables.orders(spark, sf())
      .groupBy(expr("year(o_orderdate)").as("yr"),
        expr("month(o_orderdate)").as("season"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getLong(2)))
    val m1 = monthly.filter(_._2 == rows.head.getLong(0)).sortBy(_._1)
    var s1 = 0L
    for (i <- m1.indices; j <- (i + 1) until m1.length)
      s1 += (m1(j)._3 - m1(i)._3).sign
    assert(rows.head.getLong(2) === s1, "season-1 S brute-force replay")
  }
}
