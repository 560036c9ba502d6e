package graft

import org.apache.spark.sql.functions._

/** Semantic pins for ExperimentOps + RRF — fusion accounting, CUPED
  * bounds, and the budget-conservation law.
  */
class ExperimentSpec extends SparkSpec {

  test("rrf_rank_fusion: fuses exactly the two legs' candidates") {
    val rows = operators.RankingOps.queries("rrf_rank_fusion")(
      spark, sf()).collect()
    assert(rows.length >= 10 && rows.length <= 20,
      "union of two ≤10-candidate legs")
    rows.foreach { r =>
      val bm = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val de = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(bm.isDefined || de.isDefined)
      val expected = bm.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        de.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) === expected, s"doc ${r.getLong(0)} RRF replay")
    }
    // a doc ranked by BOTH legs must outscore one ranked 10th by a
    // single leg (the fusion property)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(3)).max > single.map(_.getLong(3)).min)
  }

  test("cuped_variance_reduction: reduction factor lives in [0, 1]") {
    val Array(r) = operators.ExperimentOps.queries(
      "cuped_variance_reduction")(spark, sf()).collect()
    assert(r.getLong(0) === Tables.events(spark, sf())
      .select("user_id").distinct().count(), "one covariate row per user")
    val vr = r.getLong(3)
    assert(vr >= 0L && vr <= 1000000L, s"1−ρ² out of range: $vr")
    assert(vr < 1000000L, "pre-period correlates at least a little")
  }

  test("neyman_allocation_plan: allocation conserves the budget exactly") {
    val rows = operators.ExperimentOps.queries("neyman_allocation_plan")(
      spark, sf()).collect()
    assert(rows.map(_.getLong(3)).sum === 1000L, "Σ alloc = budget")
    val totN = rows.map(_.getLong(1)).sum
    assert(totN === Tables.customer(spark, sf()).count())
    rows.foreach(r => assert(r.getLong(3) >= 0))
    // allocation follows the weights: the heaviest stratum gets the
    // largest share
    val byW = rows.maxBy(_.getLong(2))
    assert(byW.getLong(3) === rows.map(_.getLong(3)).max)
  }

  test("bh_fdr_ks_nations: rank permutation + step-up coherence") {
    val rows = operators.ExperimentOps.queries("bh_fdr_ks_nations")(
      spark, sf()).collect()
    val m = Tables.nation(spark, sf()).count()
    assert(rows.length === m, "one test per nation")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf()).count(), "orders partitioned by nation")
    assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to m).toSeq,
      "BH rank is a permutation of 1..m")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000000L, "D in [0,1]")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000000L, "p in [0,1]")
    }
    // step-up replay: rejected == (rank <= max passing rank)
    val passing = rows.filter(r =>
      r.getLong(3) * 20 * m <= r.getLong(4) * 1000000000L)
    val kStar = if (passing.isEmpty) 0L else passing.map(_.getLong(4)).max
    rows.foreach { r =>
      assert((r.getLong(5) == 1L) === (r.getLong(4) <= kStar),
        s"${r.getString(0)}: step-up rejection replay")
    }
    // monotone: the rejection set is a rank prefix
    val rejRanks = rows.filter(_.getLong(5) == 1L).map(_.getLong(4))
    if (rejRanks.nonEmpty)
      assert(rejRanks.sorted.toSeq === (1L to rejRanks.max).toSeq)
  }

  test("delta_method_ratio_ci: interval brackets the replayed ratio") {
    val rows = operators.ExperimentOps.queries("delta_method_ratio_ci")(
      spark, sf()).collect()
    assert(rows.length === 5, "one row per market segment")
    assert(rows.map(_.getLong(2)).sum ===
      Tables.orders(spark, sf()).count(), "orders partitioned by segment")
    rows.foreach { r =>
      val (ratio, se, lo, hi) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(se >= 0L)
      assert(lo <= ratio && ratio <= hi, "CI brackets the point estimate")
      assert(hi - ratio === ratio - lo, "symmetric interval by construction")
    }
    // ratio replay for one segment from the raw tables
    val seg = rows.head.getString(0)
    val exp = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf())
        .filter(col("c_mktsegment") === seg)
        .select(col("c_custkey").as("o_custkey")), "o_custkey")
      .agg(expr("""CAST(FLOOR(CAST(sum(CAST(round(o_totalprice * 100)
        AS BIGINT)) AS DOUBLE) / count(*) * 1000000.0) AS BIGINT)"""))
      .first().getLong(0)
    assert(rows.head.getLong(3) === exp, s"$seg ratio replay")
  }

  test("ab_mde_power_grid: MDE shrinks as 1/sqrt(n); leaves replay") {
    val rows = operators.ExperimentOps
      .queries("ab_mde_power_grid")(spark, sf()).collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      Seq(1000L, 5000L, 10000L, 50000L, 100000L, 500000L))
    val (nEv, nPur) = (rows.head.getLong(1), rows.head.getLong(2))
    assert(rows.forall(r => r.getLong(1) === nEv && r.getLong(2) === nPur))
    assert(nPur > 0 && nPur < nEv)
    val p = nPur.toDouble / nEv
    rows.foreach { r =>
      val expect = math.floor((1.959963984540054 + 0.8416212335729143) *
        math.sqrt(2.0 * p * (1.0 - p) / r.getLong(0)) * 1e6).toLong
      assert(r.getLong(3) === expect, s"MDE leaf replay at n=${r.getLong(0)}")
      assert(r.getLong(4) === r.getLong(3) * nEv / nPur, "relative replay")
    }
    val mdes = rows.map(_.getLong(3))
    assert(mdes.zip(mdes.tail).forall { case (a, b) => a > b },
      "strictly shrinking in n")
    // 100x the sample shrinks MDE ~10x (1/sqrt scaling, +-floor slack)
    assert(math.abs(mdes.head - 10 * mdes(4)) <= 10,
      "inverse-sqrt scaling between n=1000 and n=100000")
  }

  test("odds_ratio_weekend: cell accounting and Woolf leaf replays") {
    val Array(r) = operators.ExperimentOps
      .queries("odds_ratio_weekend")(spark, sf()).collect()
    val (a, b, c, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b + c + d === Tables.events(spark, sf()).count(),
      "2x2 partitions the stream")
    assert(a > 0 && b > 0 && c > 0 && d > 0, "fixture fills every cell")
    val orFp = r.getLong(4)
    assert(orFp === (BigInt(a) * d * 1000000 / (BigInt(b) * c)).toLong,
      "OR rational replay")
    val lnOr = math.log(a.toDouble * d / (b.toDouble * c))
    val se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    assert(r.getLong(5) ===
      math.floor(math.exp(lnOr - 1.96 * se) * 1e6).toLong, "lo replay")
    assert(r.getLong(6) ===
      math.floor(math.exp(lnOr + 1.96 * se) * 1e6).toLong, "hi replay")
    assert(r.getLong(5) <= orFp + 1 && orFp <= r.getLong(6) + 1,
      "point estimate inside the interval (floor slack)")
  }

  test("mantel_haenszel_or: per-stratum cell replay; truncate-then-sum convention") {
    val Array(r) = operators.ExperimentOps.queries("mantel_haenszel_or")(
      spark, sf()).collect()
    // r16: calendar-month strata over the deterministic multi-month view
    val ev = Tables.eventsMultiMonth(spark, sf())
      .selectExpr("CAST(year(ts) * 12 + month(ts) AS BIGINT)",
        "(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5",
        "event_type = 'purchase'")
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2)))
    val strata = ev.groupBy(_._1).values.map { g =>
      val a = g.count(e => e._2 && e._3).toLong
      val b = g.count(e => e._2 && !e._3).toLong
      val c = g.count(e => !e._2 && e._3).toLong
      val dd = g.count(e => !e._2 && !e._3).toLong
      (a, b, c, dd)
    }.toSeq
    assert(strata.length >= 2, "month strata are non-degenerate")
    assert(r.getLong(0) === strata.length.toLong, "stratum census")
    // exact truncate-then-sum replay
    val numT = strata.map { case (a, b, c, dd) =>
      a * dd * 1000000L / (a + b + c + dd) }.sum
    val denT = strata.map { case (a, b, c, dd) =>
      b * c * 1000000L / (a + b + c + dd) }.sum
    assert(r.getLong(1) === numT && r.getLong(2) === denT,
      "MH numerator/denominator replay")
    assert(r.getLong(3) === numT * 1000000L / denT, "OR_MH replay")
    // the pooled OR is a convex-ish mix of stratum ORs: between the
    // extreme per-stratum odds ratios (strata with b·c = 0 excluded)
    val ors = strata.collect { case (a, b, c, dd) if b * c > 0 =>
      a.toDouble * dd / (b.toDouble * c) }
    if (ors.nonEmpty) {
      val v = r.getLong(3) / 1e6
      assert(v >= ors.min - 1e-2 && v <= ors.max + 1e-2,
        "OR_MH within the stratum OR envelope (truncation slack)")
    }
  }

  test("cmh_chi2_weekend: per-stratum E/Var replay; chi2 >= 0") {
    val Array(r) = operators.ExperimentOps.queries("cmh_chi2_weekend")(
      spark, sf()).collect()
    // r16: calendar-month strata over the deterministic multi-month view
    val ev = Tables.eventsMultiMonth(spark, sf())
      .selectExpr("CAST(year(ts) * 12 + month(ts) AS BIGINT)",
        "(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5",
        "event_type = 'purchase'")
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2)))
    val strata = ev.groupBy(_._1).values.map { g =>
      (g.count(e => e._2 && e._3).toLong,
        g.count(e => e._2 && !e._3).toLong,
        g.count(e => !e._2 && e._3).toLong,
        g.count(e => !e._2 && !e._3).toLong)
    }.toSeq.filter { case (a, b, c, dd) => a + b + c + dd >= 2 }
    assert(strata.length >= 2, "month strata are non-degenerate")
    assert(r.getLong(0) === strata.length.toLong, "stratum census")
    val tSum = strata.map(_._1).sum
    val eFp = strata.map { case (a, b, c, dd) =>
      (BigInt(a + b) * (a + c) * 1000000 / (a + b + c + dd)).toLong }.sum
    val vFp = strata.map { case (a, b, c, dd) =>
      val n = BigInt(a + b + c + dd)
      (BigInt(a + b) * (c + dd) * (a + c) * (b + dd) * 1000000
        / (n * n * (n - 1))).toLong }.sum
    assert(r.getLong(1) === tSum && r.getLong(2) === eFp
      && r.getLong(3) === vFp, "T/E/Var replay")
    val d = BigInt(tSum) * 1000000 - eFp
    assert(r.getLong(4) === (d * d / vFp).toLong, "chi2 replay")
    assert(r.getLong(4) >= 0L, "quadratic form is non-negative")
  }
}
