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

  test("pettitt_changepoint: brute-force U replay; argmax/tie-break pin") {
    val rows = run("pettitt_changepoint").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf())
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(sum(expr("CAST(round(value * 1000) AS BIGINT)")).as("v"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val n = daily.length
    assert(rows.length === n - 1, "one cut per day except the last")
    val expU = (0 until n - 1).map { t =>
      var u = 0L
      for (i <- 0 to t; j <- (t + 1) until n)
        u += (daily(i)._2 - daily(j)._2).sign
      (daily(t)._1, u)
    }
    assert(rows.map(r => (r._1, r._2)).toSeq === expU, "exact U_t replay")
    val k = expU.map(_._2.abs).max
    val cpDay = expU.filter(_._2.abs == k).map(_._1).min
    rows.foreach { case (day, _, absU, isCp) =>
      assert(absU <= k)
      assert(isCp === (if (day == cpDay) 1L else 0L), "argmax, smallest day")
    }
  }

  test("holt_winters_daily: independent recurrence replay; fit identity") {
    val rows = run("holt_winters_daily").map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)))
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf())
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    assert(rows.length === daily.length - 7, "one fit per day from the 8th")
    // identity: fitted + resid reconstructs the observation exactly
    rows.foreach { case (_, x, _, _, _, fitted, resid) =>
      assert(fitted + resid === x * 1000000L) }
    // independent recurrence replay (toward-zero Long division)
    val xfp = daily.map(_._2 * 1000000L)
    val mean1 = xfp.take(7).sum / 7L
    var l = mean1; var b = (xfp.slice(7, 14).sum / 7L - mean1) / 7L
    var ring = xfp.take(7).map(_ - mean1).toVector
    val exp = (7 until daily.length).map { t =>
      val sOld = ring.head
      val fitted = l + b + sOld
      val lN = (3L * (xfp(t) - sOld) + 7L * (l + b)) / 10L
      val bN = ((lN - l) + 9L * b) / 10L
      val sN = (2L * (xfp(t) - l - b) + 8L * sOld) / 10L
      ring = ring.tail :+ sN; l = lN; b = bN
      (daily(t)._1, daily(t)._2, lN, bN, sN, fitted, xfp(t) - fitted)
    }
    assert(rows.toSeq === exp, "bit-exact recurrence replay")
  }

  test("runs_test_daily: brute-force runs replay; z-arm pins") {
    val rows = run("runs_test_daily")
    val daily = Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (daily.length < 2) assert(rows.isEmpty)
    else {
      assert(rows.length === 1)
      val r = rows.head
      val med = daily.map(_._2).sorted.apply((daily.length - 1) / 2)
      val sgn = daily.filter(_._2 != med).map(t => if (t._2 > med) 1 else 0)
      val runs =
        if (sgn.isEmpty) 0L
        else 1L + sgn.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val nAbove = sgn.count(_ == 1).toLong
      val nBelow = sgn.count(_ == 0).toLong
      assert(r.getLong(0) === daily.length.toLong)
      assert(r.getLong(1) === med, "rank-defined lower median")
      assert(r.getLong(2) === nAbove && r.getLong(3) === nBelow)
      assert(r.getLong(4) === runs, "exact run count")
      assert(runs <= nAbove + nBelow, "runs bounded by kept days")
      val m = nAbove + nBelow
      if (nAbove > 0 && nBelow > 0 && 2 * nAbove * nBelow != m) {
        val mu = 2.0 * nAbove * nBelow / m + 1.0
        val vr = 2.0 * nAbove * nBelow * (2.0 * nAbove * nBelow - m) /
          (m.toDouble * m * (m - 1))
        val z = BigDecimal((runs - mu) / math.sqrt(vr))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(5) - z) < 1e-6, "z replay")
      } else assert(r.isNullAt(5), "degenerate sequences NULL-armed")
    }
  }

  test("durbin_watson_ols: exact scaled-residual replay; 0 <= DW <= 4") {
    val rows = run("durbin_watson_ols")
    val daily = Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val t0 = daily.head._1
    val ts = daily.map(_._1 - t0)
    val ys = daily.map(_._2)
    val (st, sy) = (ts.sum, ys.sum)
    val sty = ts.zip(ys).map { case (a, b) => a * b }.sum
    val stt = ts.map(t => t * t).sum
    val dd = BigInt(n) * stt - BigInt(st) * st
    if (n < 3 || dd <= 0) assert(rows.isEmpty)
    else {
      val bb = BigInt(n) * sty - BigInt(st) * sy
      val cc = dd * sy - bb * st
      val e = ts.zip(ys).map { case (t, y) =>
        BigInt(n) * dd * y - cc - BigInt(n) * bb * t }
      val sumE2 = e.map(x => x * x).sum
      if (sumE2 == 0) assert(rows.isEmpty)
      else {
        val sumD2 = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
        val dw = (sumD2 * 1000000 / sumE2).toLong
        assert(rows.length === 1)
        assert(rows.head.getLong(0) === n)
        assert(rows.head.getLong(1) === dw, "exact DW rational")
        assert(dw >= 0L && dw <= 4000000L, "DW in [0, 4]")
        // residual identity: scaled residuals sum to zero exactly
        assert(e.sum === BigInt(0), "OLS residuals orthogonal to 1")
      }
    }
  }

  test("gesd_outlier_daily: independent round replay; removal laws") {
    val rows = run("gesd_outlier_daily").map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val daily = Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    var kept = daily.toVector
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var it = 1L
    var go = true
    while (go && it <= 3) {
      val n = kept.length.toLong
      val s = kept.map(t => BigInt(t._2)).sum
      val q = kept.map(t => BigInt(t._2) * t._2).sum
      val nqss = BigInt(n) * q - s * s
      if (n < 4 || nqss <= 0) go = false
      else {
        val best = kept.minBy(t => ((BigInt(n) * t._2 - s).abs * -1, t._1))
        val md = (BigInt(n) * best._2 - s).abs
        val rFp = math.floor(md.toDouble
          / math.sqrt(nqss.toDouble * n / (n - 1.0)) * 1000000.0).toLong
        expect += ((it, best._1, best._2, n, rFp))
        kept = kept.filterNot(_ == best)
        it += 1
      }
    }
    assert(rows.toSeq === expect.toSeq, "independent round replay")
    // laws: removed days distinct; n_kept strictly decreasing by 1
    assert(rows.map(_._2).distinct.length === rows.length)
    rows.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(1)._4 === p(0)._4 - 1)
    }
    rows.foreach { case (_, _, _, _, rFp) => assert(rFp >= 0L) }
  }

  private def dailyCounts(): Array[(Long, Long)] =
    Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)

  test("sample_entropy_daily: brute template-pair replay; A subset B") {
    val rows = run("sample_entropy_daily")
    val xs = dailyCounts().map(_._2)
    val n = xs.length.toLong
    val s = xs.sum
    val q = xs.map(x => x * x).sum
    val nqss = n * q - s * s
    if (n < 4 || nqss <= 0) assert(rows.isEmpty)
    else {
      def m(i: Int, j: Int): Boolean =
        25L * (xs(i) - xs(j)) * (xs(i) - xs(j)) * n * (n - 1) <= nqss
      var (b, a) = (0L, 0L)
      for (i <- 0 to xs.length - 4; j <- (i + 1) to xs.length - 3) {
        if (m(i, j) && m(i + 1, j + 1)) {
          b += 1
          if (m(i + 2, j + 2)) a += 1
        }
      }
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === n && r.getLong(1) === b && r.getLong(2) === a,
        "exact template-pair counts")
      assert(a <= b, "length-3 matches are a subset of length-2 matches")
      if (a > 0 && b > 0) {
        val exp = math.floor(math.log(b.toDouble / a) * 1e6).toLong
        assert(r.getLong(3) === exp && r.getLong(3) >= 0L, "SampEn >= 0")
      } else assert(r.isNullAt(3))
    }
  }

  test("hurst_rs_daily: independent block R/S replay; slope replay") {
    val rows = run("hurst_rs_daily").map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val xs = dailyCounts().map(_._2)
    val n = xs.length
    val expect = Seq(8, 16, 32, 64).flatMap { s =>
      val full = (n / s) * s
      if (full == 0) None
      else {
        val stats = (0 until n / s).map { b =>
          val blk = xs.slice(b * s, (b + 1) * s)
          val sb = blk.sum; val qb = blk.map(x => x * x).sum
          val nqss = s * qb - sb * sb
          var z = 0L; var zmax = Long.MinValue; var zmin = Long.MaxValue
          blk.foreach { x =>
            z += s * x - sb; zmax = math.max(zmax, z); zmin = math.min(zmin, z)
          }
          (nqss, zmax, zmin)
        }
        val used = stats.filter(_._1 > 0)
        if (used.isEmpty) None
        else {
          val sumRs = used.map { case (nq, zx, zn) =>
            math.floor((zx - zn).toDouble / math.sqrt(nq.toDouble) * 1e6)
              .toLong
          }.sum
          Some((s.toLong, used.length.toLong,
            (stats.length - used.length).toLong, sumRs / used.length))
        }
      }
    }
    assert(rows.map(t => (t._1, t._2, t._3, t._4)) === expect,
      "per-size block R/S replay")
    val pts = expect.filter(_._4 > 0).map { case (s, _, _, mrs) =>
      (math.floor(math.log(s.toDouble) * 1e6).toLong,
        math.floor(math.log(mrs.toDouble / 1000000.0) * 1e6).toLong)
    }
    val hExp =
      if (pts.length < 2) None
      else {
        val p = pts.length.toLong
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(t => BigInt(t._1) * t._2).sum
        val sxx = pts.map(t => BigInt(t._1) * t._1).sum
        val den = p * sxx - BigInt(sx) * sx
        if (den <= 0) None
        else {
          val num = p * sxy - BigInt(sx) * sy
          Some((if (num >= 0) num * 1000000 / den
                else -((-num) * 1000000 / den)).toLong)
        }
      }
    rows.foreach { r => assert(r._5 === hExp, "closed-form slope replay") }
  }

  test("lz78_complexity_daily: independent parse replay; phrase bounds") {
    val rows = run("lz78_complexity_daily")
    val daily = dailyCounts()
    if (daily.length < 2) assert(rows.isEmpty)
    else {
      val med = daily.map(_._2).sorted.apply((daily.length - 1) / 2)
      val seq0 = daily.map(t => if (t._2 > med) '1' else '0')
      var dict = Set.empty[String]; var cur = ""; var ph = 0L
      seq0.foreach { ch =>
        val cand = cur + ch
        if (dict.contains(cand)) cur = cand
        else { dict += cand; ph += 1; cur = "" }
      }
      if (cur.nonEmpty) ph += 1
      val n = daily.length.toLong
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === n && r.getLong(1) === ph, "exact parse")
      assert(r.getLong(2) === math.floor(
        ph * math.log(n.toDouble) / n * 1000000.0).toLong)
      assert(ph >= 1 && ph <= n, "phrase count bounded by length")
    }
  }

  test("poisson_dispersion_daily: exact moment rationals; VMR law") {
    val rows = run("poisson_dispersion_daily")
    val xs = dailyCounts().map(_._2)
    if (xs.length < 2 || xs.sum == 0) assert(rows.isEmpty)
    else {
      val n = xs.length.toLong; val s = xs.sum
      val q = xs.map(x => BigInt(x) * x).sum
      val nqss = BigInt(n) * q - BigInt(s) * s
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === n && r.getLong(1) === s)
      assert(r.getLong(2) === (BigInt(s) * 1000000 / n).toLong)
      assert(r.getLong(3) === (nqss * 1000000 / (BigInt(n) * (n - 1))).toLong)
      assert(r.getLong(4) === (nqss * 1000000 / s).toLong)
      assert(r.getLong(5) === (nqss * 1000000 / (BigInt(s) * (n - 1))).toLong)
      // identity: dispersion = vmr * (n-1) up to floor slack
      assert(math.abs(r.getLong(4) - r.getLong(5) * (n - 1)) <= n,
        "D = VMR * (n-1) within truncation slack")
    }
  }

  test("pacf_durbin_levinson: independent DL replay; lag-1 = ACF(1)") {
    val rows = run("pacf_durbin_levinson")
      .map(r => (r.getLong(0), r.getLong(1)))
    val acf = run("autocorrelation_profile")
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    val maxL = (1 to 7).takeWhile(k => acf.contains(k.toLong)).size
    if (maxL == 0) assert(rows.isEmpty)
    else {
      // independent recursion replay (toward-zero Long division)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var phi = Vector(acf(1L))
      out += ((1L, phi(0)))
      var k = 1; var go = true
      while (go && k < maxL) {
        val num = acf((k + 1).toLong) - (1 to k).map(j =>
          phi(j - 1) * acf((k + 1 - j).toLong) / 1000000L).sum
        val den = 1000000L - (1 to k).map(j =>
          phi(j - 1) * acf(j.toLong) / 1000000L).sum
        if (den <= 0) go = false
        else {
          val pn = if (num >= 0) num * 1000000L / den
            else -((-num) * 1000000L / den)
          phi = (1 to k).map(j =>
            phi(j - 1) - pn * phi(k - j) / 1000000L).toVector :+ pn
          k += 1; out += ((k.toLong, pn))
        }
      }
      assert(rows.toSeq === out.toSeq, "bit-exact DL replay")
      assert(rows.head === ((1L, acf(1L))), "PACF(1) = ACF(1) identity")
      assert(rows.map(_._1) === (1L to rows.length.toLong), "contiguous lags")
    }
  }

  test("kpss_level_daily: BigInt partial-sum replay; eta >= 0") {
    val Array(r) = run("kpss_level_daily")
    val xs = dailyCounts().map(_._2)
    val n = xs.length.toLong
    assert(r.getLong(0) === n)
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(v => BigInt(v) * v).sum
    var c = BigInt(0)
    var q = BigInt(0)
    xs.zipWithIndex.foreach { case (x, i) =>
      c += x
      val t = c * n - BigInt(i + 1) * s1
      q += t * t
    }
    val vn = n * s2 - s1 * s1
    assert(vn > 0, "fixture has variance")
    assert(BigInt(r.getLong(1)) === q * 1000000 / (BigInt(n) * n * vn),
      "eta exact rational replay")
    assert(r.getLong(1) >= 0)
    // final partial sum is exactly zero by construction (demeaned)
    assert(c * n - BigInt(n) * s1 === BigInt(0))
  }

  test("adf_dickey_fuller_daily: moment + leaf replay on observed-adjacent pairs") {
    val Array(r) = run("adf_dickey_fuller_daily")
    val xs = dailyCounts().map(_._2)
    val pairs = xs.sliding(2).map(p => (p(0), p(1) - p(0))).toArray
    val n = pairs.length.toLong
    assert(r.getLong(0) === n)
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val den = n * sxx - sx * sx
    assert(n >= 4 && den > 0)
    // identical operation order to the shared SQL leaves
    val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      den.toDouble
    val sse = (syy.toDouble - sy.toDouble * sy.toDouble / n) -
      b * (sxy.toDouble - sx.toDouble * sy.toDouble / n)
    val t = b / math.sqrt((sse / (n - 2)) /
      (sxx.toDouble - sx.toDouble * sx.toDouble / n))
    assert(r.getLong(1) === math.floor(b * 1e6).toLong, "beta replay")
    assert(r.getLong(2) === math.floor(t * 1e6).toLong, "t replay")
    // a mean-reverting count series estimates beta < 0
    assert(r.getLong(1) < 0, "daily counts are not a unit root")
  }

  test("theil_u2_forecast: lag-1/lag-7 error-sum replay") {
    val Array(r) = run("theil_u2_forecast")
    val xs = dailyCounts().map(_._2)
    def errSum(k: Int): (Long, BigInt) = {
      val pairs = xs.indices.drop(k).map(i => xs(i) - xs(i - k))
      (pairs.length.toLong, pairs.map(d => BigInt(d) * d).sum)
    }
    val (m1, s1) = errSum(1)
    val (m7, s7) = errSum(7)
    assert(r.getLong(0) === m1 && r.getLong(1) === m7)
    assert(s1 > 0)
    val u2 = math.floor(math.sqrt((s7.toDouble / m7) / (s1.toDouble / m1))
      * 1e6).toLong
    assert(r.getLong(2) === u2, "U2 leaf replay")
    assert(r.getLong(2) > 0)
  }

  test("cooks_distance_topk: per-day D replay; true top-10 cut; D >= 0") {
    val rows = run("cooks_distance_topk")
    assert(rows.length === 10)
    val ds = dailyCounts()
    val di0 = ds.map(_._1).min
    val ty = ds.map { case (di, y) => (di - di0, y) }
    val n = ty.length.toLong
    val st = ty.map(p => BigInt(p._1)).sum
    val sy = ty.map(p => BigInt(p._2)).sum
    val stt = ty.map(p => BigInt(p._1) * p._1).sum
    val sty = ty.map(p => BigInt(p._1) * p._2).sum
    val bnum = n * sty - st * sy
    val bden = n * stt - st * st
    val cc = bden * sy - bnum * st
    val es = ty.map { case (t, y) =>
      (t, y, n * bden * y - cc - n * bnum * t) }
    val sse = es.map(e => e._3 * e._3).sum
    def dOf(t: Long, ei: BigInt): Double = {
      val g2 = (n * t - st) * (n * t - st)
      val h = 1.0 / n + g2.toDouble / (n.toDouble * bden.toDouble)
      ei.toDouble * ei.toDouble * h * (n - 2) /
        (2.0 * sse.toDouble * (1.0 - h) * (1.0 - h))
    }
    val brute = es.map { case (t, y, ei) =>
      (t + di0, y, math.floor(dOf(t, ei) * 1e9).toLong) }
    val byDay = brute.map(b => b._1 -> b).toMap
    rows.foreach { r =>
      val (di, y, d) = (r.getInt(0).toLong, r.getLong(1), r.getLong(2))
      val (_, by, bd) = byDay(di)
      assert(y === by && d === bd, s"day $di D replay")
      assert(d >= 0)
    }
    val cut = rows.map(_.getLong(2)).last
    val returned = rows.map(_.getInt(0).toLong).toSet
    brute.foreach { case (di, _, d) =>
      if (!returned(di)) assert(d <= cut, s"missed day $di with D $d > $cut")
    }
  }

  test("croston_intermittent_demand: exact recurrence replay") {
    val rows = run("croston_intermittent_demand")
    val xs = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.expr(
        "event_type = 'purchase' AND value > 200.0"))
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("z"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).sortBy(_._1)
    assert(xs.length >= 2, "fixture has at least two demand days")
    assert(rows.length === xs.length - 1, "one output row per update")
    var zhat = xs(0)._2 * 1000000L
    var phat = 1000000L
    rows.zipWithIndex.foreach { case (r, j) =>
      val i = j + 1
      val q = xs(i)._1 - xs(i - 1)._1
      zhat = (xs(i)._2 * 1000000L + 4L * zhat) / 5L
      phat = (q * 1000000L + 4L * phat) / 5L
      assert(r.getLong(0) === xs(i)._1 && r.getLong(1) === xs(i)._2)
      assert(r.getLong(2) === q, s"interval at demand $i")
      assert(r.getLong(3) === zhat && r.getLong(4) === phat,
        s"smoothed state at demand $i")
      assert(r.getLong(5) === (BigInt(zhat) * 1000000 / phat).toLong)
      assert(r.getLong(6) === (BigInt(zhat) * 900000 / phat).toLong)
      // SBA bias correction shaves exactly the (1 - alpha/2) factor
      assert(r.getLong(6) <= r.getLong(5))
      assert(r.getLong(4) >= 1000000L, "mean interval >= 1 day")
    }
  }

  test("periodogram_power_share: brute trig-fold replay; shares partition") {
    val rows = run("periodogram_power_share")
    assert(rows.length === 9, "periods 2..10")
    val ds = dailyCounts()
    val di0 = ds.map(_._1).min
    val n = ds.length.toLong
    val sTot = ds.map(_._2).sum
    var powTot = BigInt(0)
    val brute = (2 to 10).map { p =>
      val cs = (0 until p).map { k =>
        val a = 2.0 * math.Pi * k / p
        ((math.cos(a) * 1e6).toLong, (math.sin(a) * 1e6).toLong)
      }
      var sxc = BigInt(0); var sxs = BigInt(0)
      var sc = BigInt(0); var ss = BigInt(0)
      ds.foreach { case (di, x) =>
        val (c, s2) = cs(((di - di0) % p).toInt)
        sxc += BigInt(x) * c; sxs += BigInt(x) * s2
        sc += c; ss += s2
      }
      def tdiv(a: BigInt, b: BigInt) =
        if (a < 0) -((-a) / b) else a / b
      val abar = tdiv(BigInt(n) * sxc - BigInt(sTot) * sc, BigInt(n))
      val bbar = tdiv(BigInt(n) * sxs - BigInt(sTot) * ss, BigInt(n))
      val pow = abar * abar + bbar * bbar
      powTot += pow
      (p, abar.toLong, bbar.toLong, pow)
    }
    assert(powTot > 0)
    var shareSum = 0L
    rows.zip(brute).foreach { case (r, (p, abar, bbar, pow)) =>
      assert(r.getInt(0) === p && r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) === abar && r.getLong(3) === bbar,
        s"A/B replay at p=$p")
      val share = (pow * 1000000 / powTot).toLong
      assert(r.getLong(4) === share, s"share replay at p=$p")
      assert(share >= 0L && share <= 1000000L)
      shareSum += share
    }
    // floored shares under-partition by at most one ulp per period
    assert(shareSum <= 1000000L && shareSum >= 1000000L - 9L)
  }

  test("negbin_fit_daily: exact moment-rational replay; params in range") {
    val Array(r) = run("negbin_fit_daily")
    val xs = dailyCounts().map(_._2)
    val n = BigInt(xs.length)
    val s = BigInt(xs.sum)
    val q = xs.map(x => BigInt(x) * x).sum
    val nqss = n * q - s * s
    val over = nqss - s * (n - 1)
    assert(r.getLong(0) === xs.length.toLong && r.getLong(1) === xs.sum)
    assert(over > 0, "fixture daily volume is overdispersed")
    assert(r.getLong(2) === (s * s * (n - 1) * 1000000 / (n * over)).toLong,
      "shape r replay")
    assert(r.getLong(3) === (s * (n - 1) * 1000000 / nqss).toLong,
      "success prob p replay")
    assert(r.getLong(2) > 0L, "r > 0")
    assert(r.getLong(3) > 0L && r.getLong(3) <= 1000000L, "p in (0, 1]")
  }

  test("circular_hour_stats: brute vector-sum replay; R in [0,1]; z exact") {
    val rows = run("circular_hour_stats")
    assert(rows.length === 5, "one row per event type")
    val ev = Tables.events(spark, sf())
      .selectExpr("event_type", "hour(ts)").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val cs = (0 until 24).map { h =>
      val a = 2.0 * math.Pi * h / 24.0
      ((math.cos(a) * 1e6).toLong, (math.sin(a) * 1e6).toLong)
    }
    rows.foreach { r =>
      val g = ev.filter(_._1 == r.getString(0)).map(_._2)
      val n = g.length.toLong
      assert(r.getLong(1) === n)
      val byH = g.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
      val peak = byH.toSeq.minBy { case (h, c) => (-c, h) }
      assert(r.getLong(2) === peak._1.toLong && r.getLong(3) ===
        peak._2 * 1000000L / n, "peak hour/share replay")
      val c = byH.map { case (h, cnt) => BigInt(cnt) * cs(h)._1 }.sum
      val s2 = byH.map { case (h, cnt) => BigInt(cnt) * cs(h)._2 }.sum
      val rbar = math.floor(math.sqrt((c * c + s2 * s2).toDouble)
        / (n.toDouble * 1000000.0) * 1000000.0).toLong
      assert(r.getLong(4) === rbar, "resultant-length leaf replay")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L, "R in [0,1]")
      assert(r.getLong(5) === ((c * c + s2 * s2) / (BigInt(n) * 1000000)).toLong,
        "Rayleigh z exact rational replay")
      assert(r.getLong(5) >= 0L)
    }
  }

  test("kendall_w_concordance: brute rank replay; W in [0,1]") {
    val Array(r) = run("kendall_w_concordance")
    val ev = Tables.events(spark, sf())
      .selectExpr("event_type", "(unix_micros(ts) DIV 86400000000 + 4) % 7")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val cells = ev.groupBy(identity).map { case ((t, dw), g) =>
      (t, dw, g.length.toLong) }.toSeq
    val types = cells.map(_._1).distinct
    val k = types.length.toLong
    val n = cells.map(_._2).distinct.length.toLong
    assert(r.getLong(0) === k && r.getLong(1) === n)
    // pinned distinct ranks: per type, order weekdays by (count, dow)
    val rj = scala.collection.mutable.Map.empty[Long, Long]
    types.foreach { t =>
      cells.filter(_._1 == t).sortBy(c => (c._3, c._2)).zipWithIndex
        .foreach { case ((_, dw, _), i) =>
          rj(dw) = rj.getOrElse(dw, 0L) + (i + 1) }
    }
    val rjs = rj.values.map(BigInt(_)).sum
    val rj2 = rj.values.map(v => BigInt(v) * v).sum
    val sStat = rj2 - rjs * rjs / n
    assert(r.getLong(2) === sStat.toLong, "S replay")
    assert(r.getLong(3) ===
      (sStat * 12 * 1000000 / (BigInt(k) * k * n * (n * n - 1))).toLong,
      "W replay")
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L, "W in [0,1]")
    assert(r.getLong(4) ===
      (sStat * 12 * (n - 1) * 1000000 / (BigInt(k) * n * (n * n - 1))).toLong,
      "Friedman chi2_r replay")
  }
}
