package graft

/** Semantic pins for CausalEvalOps: the IPS identity under the
  * behavior policy itself (self-IPS = logged mean), the conformal
  * coverage guarantee band, and CEM accounting laws.
  */
class CausalEvalSpec extends SparkSpec {
  private def run(key: String) =
    operators.CausalEvalOps.queries(key)(spark, sf()).collect()

  test("ips_policy_value: sane magnitudes; mass conservation bound") {
    val Array(r) = run("ips_policy_value")
    val (n, logged, ips) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === Tables.events(spark, sf()).count())
    assert(logged > 0, "logged mean positive on positive rewards")
    assert(ips >= 0, "IPS of a positive-reward policy is non-negative")
    // the IPS estimate of ANY single-action-per-context policy is
    // bounded by n_x-weighted max cell mean; crude sanity: within 100x
    // of the logged mean on this fixture
    assert(ips < logged * 100)
  }

  test("split_conformal_interval: coverage near the 90% guarantee") {
    val Array(r) = run("split_conformal_interval")
    val (nCal, nTest, qHat, nCov, cov) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nCal > 0 && nTest > 0 && qHat >= 0)
    assert(cov === nCov * 1000000L / nTest)
    // split-conformal guarantees P(cover) >= 0.9 in expectation over
    // exchangeable splits; the %2 split is near-exchangeable here, so
    // pin a generous band rather than the exact guarantee
    assert(cov >= 850000L && cov <= 1000000L,
      s"coverage $cov outside [0.85, 1.0]")
  }

  test("coarsened_exact_matching_att: accounting laws") {
    val Array(r) = run("coarsened_exact_matching_att")
    val (tot, matched, nt, nc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(matched >= 1 && matched <= tot)
    assert(nt > 0 && nc > 0)
    val nUsers = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(nt + nc <= nUsers, "matched units are a subset of users")
  }

  test("sharp_rdd_discount: BigInt OLS replay on both sides") {
    val Array(r) = run("sharp_rdd_discount")
    val (nL, nR) = (r.getLong(0), r.getLong(1))
    assert(nL + nR === Tables.lineitem(spark, sf()).count())
    val pts = Tables.lineitem(spark, sf())
      .selectExpr("CAST(round(l_discount * 100) AS BIGINT) - 5 AS xc",
        "CAST(round(l_quantity) AS BIGINT) AS y")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def fit(side: Array[(Long, Long)]): (Long, Long) = {
      val n = BigInt(side.length)
      val sx = BigInt(side.map(_._1).sum); val sy = BigInt(side.map(_._2).sum)
      val sxx = side.map(p => BigInt(p._1) * p._1).sum
      val sxy = side.map(p => BigInt(p._1) * p._2).sum
      val den = n * sxx - sx * sx
      def sdiv(num: BigInt): Long = {
        val v = num * 1000000
        (if (v >= 0) v / den else -((-v) / den)).toLong
      }
      (sdiv(sy * sxx - sx * sxy), sdiv(n * sxy - sx * sy))
    }
    val (aL, bL) = fit(pts.filter(_._1 < 0))
    val (aR, bR) = fit(pts.filter(_._1 >= 0))
    assert(r.getLong(2) === aL && r.getLong(3) === bL, "left fit replay")
    assert(r.getLong(4) === aR && r.getLong(5) === bR, "right fit replay")
    assert(r.getLong(6) === aR - aL, "jump = intercept gap at the cutoff")
  }

  test("did_revenue_segments: cells partition orders; DiD replays") {
    val rows = run("did_revenue_segments")
    assert(rows.length === 4, "2x2 design")
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(rows.map(_.getLong(2)).sum ===
      Tables.orders(spark, sf()).count())
    val means = rows.map(r =>
      (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
    rows.foreach { r =>
      assert(r.getLong(4) ===
        (BigInt(r.getLong(3)) * 1000000 / r.getLong(2)).toLong,
        "cell mean replay")
      assert(r.getLong(5) >= 0, "variance of mean nonnegative")
    }
    val did = rows.head.getLong(6)
    assert(did === means((1, 1)) - means((1, 0)) -
      (means((0, 1)) - means((0, 0))), "DiD replay from cell means")
    val se = rows.head.getLong(7)
    assert(se >= 0)
    assert(rows.head.getLong(8) === did - math.floor(1.96 * se).toLong)
    assert(rows.head.getLong(9) === did + math.floor(1.96 * se).toLong)
  }

  test("quantile_treatment_effect: rank-pick replay at every decile") {
    val rows = run("quantile_treatment_effect")
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    val (n0, n1) = (rows.head.getLong(1), rows.head.getLong(2))
    assert(n0 + n1 === Tables.orders(spark, sf()).count())
    val v0s = rows.map(_.getLong(3)); val v1s = rows.map(_.getLong(4))
    assert(v0s.zip(v0s.tail).forall { case (a, b) => a <= b },
      "control deciles monotone")
    assert(v1s.zip(v1s.tail).forall { case (a, b) => a <= b },
      "treated deciles monotone")
    rows.foreach(r => assert(r.getLong(5) === r.getLong(4) - r.getLong(3)))
    // independent rank-pick replay from sorted collected arms
    val vals = Tables.orders(spark, sf())
      .selectExpr("""CAST(conv(substring(md5(CAST(o_custkey AS STRING)),
          1, 8), 16, 10) AS BIGINT) % 2 AS arm""",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val a0 = vals.filter(_._1 == 0).map(_._2).sorted
    val a1 = vals.filter(_._1 == 1).map(_._2).sorted
    assert(a0.length.toLong === n0 && a1.length.toLong === n1)
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(3) === a0(((q * n0 + 9) / 10 - 1).toInt),
        s"control decile $q replay")
      assert(r.getLong(4) === a1(((q * n1 + 9) / 10 - 1).toInt),
        s"treated decile $q replay")
    }
  }

  test("covariate_balance_smd: moment replays; A/A stays loosely flat") {
    val rows = run("covariate_balance_smd")
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("acctbal_cents", "n_orders", "spend_cents"))
    val nCust = Tables.customer(spark, sf()).count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === nCust,
        "arms partition customers (same split for every covariate)")
      assert(!r.isNullAt(5))
      val smd = r.getDouble(5)
      // md5 A/A: SMD concentrates at 0 with sd ~ sqrt(2/n); 0.3 is
      // far outside any honest split's range (the tripwire this op
      // exists to pull would need a BROKEN assignment)
      assert(math.abs(smd) < 0.3, s"A/A balance for ${r.getString(0)}")
      assert(r.getBoolean(6) === (math.abs(smd) < 0.1), "flag replay")
    }
    // mean replay for the first covariate from the raw split
    val t = rows.head
    val vals = Tables.customer(spark, sf())
      .selectExpr("""CAST(conv(substring(md5(CAST(c_custkey AS STRING)),
          1, 8), 16, 10) AS BIGINT) % 2 AS arm""",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS v")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    def meanFp(arm: Long): Long = {
      val xs = vals.filter(_._1 == arm).map(_._2)
      val s = BigInt(xs.sum) * 1000000; val n = xs.length
      (if (s >= 0) s / n else -((-s) / n)).toLong
    }
    assert(t.getLong(3) === meanFp(0) && t.getLong(4) === meanFp(1),
      "signed fixed-point mean replay both arms")
  }
}
