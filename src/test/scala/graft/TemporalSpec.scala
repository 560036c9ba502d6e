package graft

import org.apache.spark.sql.functions._

/** Semantic pins for TemporalOps — conservation and clipping laws the
  * oracle hash can't name.
  */
class TemporalSpec extends SparkSpec {
  private def run(key: String) =
    operators.TemporalOps.queries(key)(spark, sf()).collect()

  test("interval_overlap_months: month slices conserve interval days") {
    val rows = run("interval_overlap_months")
    val li = Tables.orders(spark, sf())
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      .join(Tables.lineitem(spark, sf()).select(col("l_orderkey"),
        to_date(col("l_shipdate")).as("sd")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("sd") >= col("od"))
    val Array(tot) = li.agg(
      sum(expr("CAST(datediff(sd, od) + 1 AS BIGINT)")).as("days"),
      count(lit(1)).as("n")).collect()
    // clipping to months is a partition of each interval's days
    assert(rows.map(_.getLong(2)).sum === tot.getLong(0))
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "every open line has ≥1 day")
      assert(r.getLong(2) <= r.getLong(1) * 31, "a month caps at 31 days/line")
    }
    // months are unique and sorted
    val ms = rows.map(_.getDate(0).toString)
    assert(ms.distinct.length === ms.length && ms.sorted.sameElements(ms))
  }

  test("rle_event_compression: runs partition the event stream") {
    val rows = run("rle_event_compression")
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, sf()).count())
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1),
        "1 ≤ runs ≤ events")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= r.getLong(1),
        "1 ≤ max run ≤ events")
      assert(r.getLong(4) <= 1000000L, "compression ratio ≤ 1")
    }
  }

  test("seasonal_residual_outliers: residuals cancel within each weekday") {
    val rows = run("seasonal_residual_outliers")
    val nDays = Tables.orders(spark, sf())
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.length === nDays, "one row per order day")
    // Σ residual per weekday = the fixed-point truncation remainder:
    // 0 ≤ n_d·mean_true − n_d·mean_fp < n_d
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val resSum = rs.map(_.getLong(4)).sum
      assert(resSum >= 0 && resSum < rs.length,
        s"weekday residuals cancel up to truncation (got $resSum for ${rs.length} days)")
    }
    // outliers are a small minority (2σ admits ≲ a few % of days)
    val nOut = rows.count(_.getBoolean(5))
    assert(nOut.toDouble / rows.length < 0.2, s"$nOut/${rows.length} outliers")
  }

  test("mase_seasonal_naive: scored-day accounting and the ratio identity") {
    val Array(r) = operators.TemporalOps.queries("mase_seasonal_naive")(
      spark, sf()).collect()
    val (n, saeS, saeN, mase) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0, "some days have both lags")
    assert(saeS >= 0 && saeN >= 0)
    if (saeN > 0)
      assert(mase === (BigInt(saeS) * 1000000 / saeN).toLong, "ratio identity")
    else assert(mase === -1L)
    // scored days ⊆ observed days minus the first week's ramp
    val days = Tables.orders(spark, sf())
      .select(expr("CAST(o_orderdate AS DATE)")).distinct().count()
    assert(n <= days, "cannot score more days than exist")
  }

  test("snapshot_diff_audit: the diff partitions both snapshots exactly") {
    val rows = operators.MergeOps.queries("snapshot_diff_audit")(
        spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet === Set("added", "removed", "changed", "unchanged"))
    val base = Tables.orders(spark, sf()).select("o_orderkey")
    val nOld = base.filter(col("o_orderkey") % 5 =!= 0).count()
    val nNew = base.filter(col("o_orderkey") % 3 =!= 0).count()
    val surviving = rows("changed")._1 + rows("unchanged")._1
    assert(surviving + rows("removed")._1 === nOld, "old side partitions")
    assert(surviving + rows("added")._1 === nNew, "new side partitions")
    // the planted +500-cent edit accounts for the entire changed delta
    assert(rows("changed")._4 === rows("changed")._1 * 500,
      "changed delta = n_changed × 500 cents")
    assert(rows("unchanged")._4 === 0L)
    assert(rows("added")._2 === 0L && rows("removed")._3 === 0L)
  }

  test("gumbel_return_level: fit geometry + full moment replay") {
    val Array(r) = run("gumbel_return_level")
    val (nb, meanMax, beta, mu, z12) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nb >= 12L, "enough monthly blocks to fit")
    assert(beta > 0L, "positive scale")
    assert(mu < meanMax * 1000000L, "mode sits below the block-max mean")
    // z12 = m̄ + (c − γ)·β with c ≈ 2.4417 > γ: return level above mean
    assert(z12 > meanMax * 1000000L, "12-period level exceeds the mean max")
    // replay from independently computed moments
    val mx = Tables.orders(spark, sf())
      .select(expr("date_format(to_date(o_orderdate), 'yyyy-MM')").as("m"),
        expr("to_date(o_orderdate)").as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .groupBy("m", "day").agg(sum("c").as("dc"))
      .groupBy("m").agg(max("dc").as("mx")).collect().map(_.getLong(1))
    assert(mx.length === nb)
    val (nbD, sm) = (mx.length.toDouble, mx.sum)
    val smm = mx.map(v => BigDecimal(v) * BigDecimal(v)).sum
    val s = math.sqrt((nbD * smm.toDouble - sm.toDouble * sm.toDouble) /
      (nbD * (mx.length - 1)))
    val betaE = s * math.sqrt(6.0) / math.Pi
    val muE = sm.toDouble / mx.length - 0.5772156649015329 * betaE
    val c = -math.log(-math.log(1.0 - 1.0 / 12.0))
    assert(beta === math.floor(betaE * 1e6).toLong, "beta replay")
    assert(mu === math.floor(muE * 1e6).toLong, "mu replay")
    assert(z12 === math.floor((muE + betaE * c) * 1e6).toLong, "z12 replay")
  }
}
