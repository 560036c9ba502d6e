package graft

/** Semantic pins for RankStatOps: brute-force replays at sf0.001 (the
  * statistics recomputed naively in Scala from collected rows must
  * match the distributed value-domain derivations exactly), plus the
  * range/identity laws a hash match can't name — |ρ| ≤ 1, the U
  * identity U₁+U₂ = 2n₁n₂, the Kendall pair-count conservation law,
  * and V ∈ [0, 1].
  */
class RankStatSpec extends SparkSpec {
  private def run(key: String) =
    operators.RankStatOps.queries(key)(spark, sf()).collect()

  /** Doubled tie-averaged ranks of xs (brute force). */
  private def avgRank2(xs: Seq[Long]): Map[Long, Long] = {
    val sorted = xs.sorted
    sorted.distinct.map { v =>
      val lo = sorted.indexOf(v) + 1L // min rank (1-based)
      val cnt = sorted.count(_ == v).toLong
      v -> (2 * lo + cnt - 1)
    }.toMap
  }

  test("spearman_rank_corr: |rho| <= 1 and matches a brute-force replay") {
    val rows = run("spearman_rank_corr")
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf())
      .selectExpr("l_returnflag",
        "CAST(round(l_quantity * 100) AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (g, n, rho) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(math.abs(rho) <= 1.0 + 1e-9)
      val grp = li.filter(_._1 == g)
      assert(n === grp.length)
      val rx = avgRank2(grp.map(_._2))
      val ry = avgRank2(grp.map(_._3))
      val pts = grp.map(t => (BigInt(rx(t._2)), BigInt(ry(t._3))))
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val num = BigInt(n) * sxy - sx * sy
      val dx = BigInt(n) * sxx - sx * sx
      val dy = BigInt(n) * syy - sy * sy
      val expect = BigDecimal(num.toDouble /
        (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rho - expect) <= 1e-6, s"group $g: $rho vs $expect")
    }
  }

  test("mann_whitney_u_value: U identity and brute-force replay") {
    val Array(r) = run("mann_whitney_u_value")
    val (n1, n2, u1, u2, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(u1 + u2 === 2 * n1 * n2, "U1 + U2 = 2 n1 n2")
    assert(auc >= 0 && auc <= 1000000L)
    val ev = Tables.events(spark, sf())
      .filter("event_type IN ('click','purchase')")
      .selectExpr("event_type", "CAST(round(value * 1000) AS BIGINT) AS v")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = ev.filter(_._1 == "click").map(_._2)
    val b = ev.filter(_._1 == "purchase").map(_._2)
    assert(n1 === a.length && n2 === b.length)
    // 2*U1 = 2*#(a>b) + #(a=b), brute force over all cross pairs
    var gt = 0L; var eq = 0L
    for (x <- a; y <- b) { if (x > y) gt += 1 else if (x == y) eq += 1 }
    assert(u1 === 2 * gt + eq, "2U replays from the cross-pair count")
  }

  test("kendall_tau_monthly: pair conservation and brute-force replay") {
    val Array(r) = run("kendall_tau_monthly")
    val nm = r.getLong(0); val np = r.getLong(1)
    val (c, dd, tx, ty, tb, tau) = (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(np === nm * (nm - 1) / 2, "n_pairs is triangular in n_months")
    assert(c + dd + tx + ty + tb === np, "every pair is classified once")
    assert(math.abs(tau) <= 1000000L)
    val monthly = Tables.orders(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "year(o_orderdate) * 12 + month(o_orderdate)").as("mi"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    assert(nm === monthly.length)
    var bc = 0L; var bd = 0L
    for (i <- monthly.indices; j <- (i + 1) until monthly.length) {
      val dx = (monthly(j)._2 - monthly(i)._2).sign
      val dy = (monthly(j)._3 - monthly(i)._3).sign
      if (dx * dy > 0) bc += 1 else if (dx * dy < 0) bd += 1
    }
    assert(c === bc && dd === bd, "concordant/discordant replay")
  }

  test("cramers_v_priority_status: grid shape and V in [0, 1]") {
    val Array(r) = run("cramers_v_priority_status")
    val (n, cells, dof, chi2, v) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(n === Tables.orders(spark, sf()).count())
    // full margin cross product: with r×c dims, cells=(r·c), and
    // dof=(r−1)(c−1) — fixture has 5 priorities × 3 statuses
    assert(cells === 15 && dof === 8)
    assert(chi2 >= -cells, "chi2 >= 0 up to per-cell floor slack")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("armitage_trend_priority: moments replay the z² rational") {
    val rows = run("armitage_trend_priority")
    assert(rows.length === 5, "one row per priority score 1..5")
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf()).count(), "orders partitioned by score")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "k <= n")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1),
        "rate replay")
    }
    val z2 = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) === z2), "z² is a constant column")
    assert(z2 >= 0L, "z² is a square over a Cauchy-Schwarz denominator")
    // BigInt replay of the Armitage rational from the group table
    val g = rows.map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
      BigInt(r.getLong(2))))
    val nn = g.map(_._2).sum; val kk = g.map(_._3).sum
    val ssn = g.map(x => x._1 * x._2).sum
    val ssk = g.map(x => x._1 * x._3).sum
    val ss2n = g.map(x => x._1 * x._1 * x._2).sum
    val tnum = nn * ssk - kk * ssn
    val tden = nn * ss2n - ssn * ssn
    assert(tden > 0, "priority scores vary")
    val expect = (nn * tnum * tnum * 1000000) / (kk * (nn - kk) * tden)
    assert(z2 === expect.toLong)
  }

  test("kruskal_wallis_priority: rank-sum conservation; H replays") {
    val rows = run("kruskal_wallis_priority")
    assert(rows.length === 5, "one row per priority score")
    val nTot = rows.head.getLong(3)
    assert(rows.map(_.getLong(1)).sum === nTot)
    assert(nTot === Tables.orders(spark, sf()).count())
    // doubled tie-averaged ranks sum to exactly N(N+1) over the corpus
    assert(rows.map(_.getLong(2)).sum === nTot * (nTot + 1),
      "Σ R2_g = N(N+1) — global rank mass conserved")
    val tie3 = rows.head.getLong(4)
    assert(tie3 >= 0)
    val hFp = rows.head.getLong(5)
    val cFp = rows.head.getLong(6)
    assert(rows.forall(r => r.getLong(5) === hFp), "constant columns")
    // BigInt replay of the fixed-point fold from the per-group table
    val sl = rows.map(r =>
      BigInt(r.getLong(2)) * r.getLong(2) / (4 * r.getLong(1))).sum
    val expectH = (BigInt(12) * sl * 1000000 /
      (BigInt(nTot) * (nTot + 1))).toLong - 3 * (nTot + 1) * 1000000L
    assert(hFp === expectH, "H replay")
    assert(hFp >= -60L, "H >= 0 up to per-leaf truncation slack")
    val expectC = 1000000L - (BigInt(tie3) * 1000000 /
      (BigInt(nTot) * nTot * nTot - nTot)).toLong
    assert(cFp === expectC && cFp > 0 && cFp <= 1000000L)
    val hc = rows.head.getLong(7)
    val expectHc =
      if (hFp >= 0) hFp * 1000000L / cFp else -((-hFp) * 1000000L / cFp)
    assert(hc === expectHc, "tie-corrected H replay")
  }

  test("jonckheere_trend_value: brute-force pairwise-U replay") {
    val Array(r) = run("jonckheere_trend_value")
    val (nTot, j2, e2, var72) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nTot === Tables.orders(spark, sf()).count())
    assert(j2 >= 0 && j2 <= 2 * e2, "0 <= J <= max pairs (doubled)")
    // brute-force 2U over all ordered group pairs from the raw table
    val vals = Tables.orders(spark, sf())
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) sc",
        "CAST(round(o_totalprice * 100) AS BIGINT) x")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val byG = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var bj2 = 0L
    for (i <- 1L to 5L; j <- (i + 1) to 5L) {
      val (a, b) = (byG.getOrElse(i, Array[Long]()),
        byG.getOrElse(j, Array[Long]()))
      // doubled U: 2 per strict win, 1 per tie
      bj2 += a.iterator.map(x =>
        2L * b.count(_ > x) + b.count(_ == x)).sum
    }
    assert(j2 === bj2, "doubled J brute-force replay")
    val ns = byG.values.map(_.length.toLong)
    assert(e2 === (nTot * nTot - ns.map(n => n * n).sum) / 2)
    assert(var72 === nTot * nTot * (2 * nTot + 3) -
      ns.map(n => n * n * (2 * n + 3)).sum)
    val expectZ = BigDecimal((j2 - e2).toDouble / 2.0 /
        math.sqrt(var72 / 72.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(4) - expectZ) < 1e-9, "z replay")
  }

  test("chatterjee_xi_corr: brute-force xi replay; functional signal") {
    val Array(r) = run("chatterjee_xi_corr")
    val (n, adiff, den2, xi) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n === Tables.lineitem(spark, sf()).count())
    assert(xi <= 1000000L && xi >= -1000000L)
    // the fixture's extendedprice is synthetically INDEPENDENT of
    // quantity (corr ≈ −0.01 measured), and ξ's null distribution
    // concentrates at 0 with sd ≈ √(2/5n) — so the correct read here
    // is ≈0 (an A/A for the dependence detector); 0.1 is ~8σ slack
    assert(math.abs(xi) < 100000L, "independent columns read as ξ≈0")
    // brute-force replay from the collected rows
    val rows = Tables.lineitem(spark, sf())
      .selectExpr("CAST(round(l_quantity) AS BIGINT) x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) y",
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getInt(3).toLong, x.getLong(4), x.getLong(5)))
    val sorted = rows.sortBy(t => (t._1, t._3, t._4, t._5, t._6))
    val yCounts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ysSorted = yCounts.keys.toArray.sorted
    val cums = ysSorted.scanLeft(0L)((acc, y) => acc + yCounts(y)).tail
    val rMap = ysSorted.zip(cums).toMap
    val rs = sorted.map(t => rMap(t._2))
    val bAdiff = rs.zip(rs.tail).map { case (a, b) => math.abs(b - a) }.sum
    assert(adiff === bAdiff, "consecutive rank-diff replay")
    val bDen = ysSorted.map { y =>
      val l = n - rMap(y) + yCounts(y)
      BigInt(2) * yCounts(y) * l * (n - l)
    }.sum
    assert(BigInt(den2) === bDen, "denominator replay")
    assert(xi ===
      (BigInt(1000000) - BigInt(n) * adiff * 1000000 / bDen).toLong)
  }

  test("yuen_trimmed_t: full trim/winsorize replay from sorted arms") {
    val Array(r) = run("yuen_trimmed_t")
    val vals = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .selectExpr("event_type", "CAST(round(value * 1000) AS BIGINT) v")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def arm(g: String): Array[Long] =
      vals.filter(_._1 == g).map(_._2).sorted
    val (a1, a2) = (arm("click"), arm("purchase"))
    assert(r.getLong(0) === a1.length.toLong)
    assert(r.getLong(1) === a2.length.toLong)
    def stats(a: Array[Long]): (Long, Long, BigInt, BigInt) = {
      val n = a.length; val g = n / 5; val h = n - 2 * g
      val mid = a.slice(g, n - g)
      val ts = mid.map(BigInt(_)).sum
      val w = a.take(g).map(_ => a(g)) ++ mid ++
        a.takeRight(g).map(_ => a(n - g - 1))
      (h.toLong, ts.toLong, w.map(BigInt(_)).sum,
        w.map(x => BigInt(x) * x).sum)
    }
    val (h1, ts1, ws1, wss1) = stats(a1)
    val (h2, ts2, ws2, wss2) = stats(a2)
    assert(r.getLong(2) === h1 && r.getLong(3) === h2)
    assert(r.getLong(4) === ts1 * 1000000L / h1, "trimmed mean 1 replay")
    assert(r.getLong(5) === ts2 * 1000000L / h2, "trimmed mean 2 replay")
    val n1 = a1.length.toDouble; val n2 = a2.length.toDouble
    val d1 = (n1 * wss1.toDouble - ws1.toDouble * ws1.toDouble) /
      (n1 * h1 * (h1 - 1.0))
    val d2 = (n2 * wss2.toDouble - ws2.toDouble * ws2.toDouble) /
      (n2 * h2 * (h2 - 1.0))
    val expectT = BigDecimal(
        (ts1.toDouble / h1 - ts2.toDouble / h2) / math.sqrt(d1 + d2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(6) - expectT) < 1e-6, "Yuen t replay")
  }

  test("friedman_test_priority: brute within-block rank replay; Q >= 0") {
    val rows = run("friedman_test_priority").map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val cells = Tables.orders(spark, sf())
      .selectExpr("year(o_orderdate) * 12 + month(o_orderdate) AS blk",
        "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((blk, sc), ts) =>
        (blk, sc, ts.map(_._2).sum) }.toSeq
    val byBlock = cells.groupBy(_._1)
    val complete = byBlock.filter(_._2.size == 5)
    val dropped = (byBlock.size - complete.size).toLong
    val r2sums = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    complete.values.foreach { cs =>
      val vs = cs.map(_._3)
      cs.foreach { case (_, sc, v) =>
        r2sums(sc) += 2L * vs.count(_ < v) + vs.count(_ == v) + 1L
      }
    }
    if (complete.isEmpty) assert(rows.isEmpty)
    else {
      val n = complete.size.toLong
      val sr2 = r2sums.values.map(x => BigInt(x) * x).sum
      val qfp = ((BigInt(3) * sr2 * 1000000 -
        BigInt(3000000) * n * n * 5 * 36) / (n * 5 * 6)).toLong
      assert(rows.map(_._1) === (1L to 5L).toSeq, "all 5 treatments")
      rows.foreach { case (sc, nb, r2s, nd, q) =>
        assert(nb === n, "complete-block count")
        assert(r2s === r2sums(sc), "exact doubled rank sum")
        assert(nd === dropped)
        assert(q === qfp && q >= 0L, "exact non-negative Q")
      }
      // conservation: doubled rank sums total n·k(k+1) regardless of ties
      assert(rows.map(_._3).sum === n * 5 * 6)
    }
  }

  test("cliff_delta_weekend: brute pair-count replay; conservation") {
    val rows = run("cliff_delta_weekend")
    assert(rows.length === 1)
    val r = rows.head
    val ev = Tables.events(spark, sf())
      .selectExpr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5 AS we",
        "CAST(round(value * 1000) AS BIGINT) AS v")
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val wc = ev.filter(_._1).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val dc = ev.filterNot(_._1).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val nWe = wc.values.sum; val nWd = dc.values.sum
    val dSorted = dc.toSeq.sortBy(_._1)
    var (gt, lt, eq) = (BigInt(0), BigInt(0), BigInt(0))
    wc.foreach { case (v, c) =>
      val less = dSorted.iterator.takeWhile(_._1 < v).map(_._2).sum
      val equal = dc.getOrElse(v, 0L)
      gt += BigInt(c) * less
      eq += BigInt(c) * equal
      lt += BigInt(c) * (nWd - less - equal)
    }
    assert(r.getLong(0) === nWe && r.getLong(1) === nWd)
    assert(BigInt(r.getLong(2)) === gt && BigInt(r.getLong(3)) === lt)
    assert(BigInt(r.getLong(4)) === eq)
    assert(gt + lt + eq === BigInt(nWe) * nWd, "pair conservation")
    if (nWe > 0 && nWd > 0) {
      val num = (gt - lt) * 1000000
      val den = BigInt(nWe) * nWd
      val expect = (if (num >= 0) num / den else -((-num) / den)).toLong
      assert(r.getLong(5) === expect, "signed toward-zero delta")
      assert(math.abs(r.getLong(5)) <= 1000000L, "|delta| <= 1")
    } else assert(r.isNullAt(5))
  }

  test("brown_forsythe_priority: brute |x-med| moment replay") {
    val rows = run("brown_forsythe_priority").map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getString(5), r.getString(6), r.getLong(7)))
    val v = Tables.orders(spark, sf())
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = v.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val meds = groups.map { case (sc, xs) =>
      val sorted = xs.sorted
      sc -> sorted((math.ceil(xs.length * 0.5) - 1).toInt)
    }
    val moments = groups.map { case (sc, xs) =>
      val zs = xs.map(x => math.abs(x - meds(sc)))
      (sc, xs.length.toLong, zs.sum, zs.map(z => BigInt(z) * z).sum)
    }.toSeq.sortBy(_._1)
    val leaves = moments.map(m => BigInt(m._3) * m._3 / m._2)
    val nTot = moments.map(_._2).sum
    val tSum = moments.map(_._3).sum
    val ssb = leaves.sum - BigInt(tSum) * tSum / nTot
    val ssw = moments.map(_._4).sum - leaves.sum
    val k = moments.length.toLong
    if (k < 2 || ssw <= 0 || nTot <= k) assert(rows.isEmpty)
    else {
      assert(rows.map(t => (t._1, t._2, t._3, t._4)) ===
        moments.map(m => (m._1, m._2, meds(m._1), m._3)),
        "per-group medians and |dev| sums")
      rows.foreach { t =>
        assert(t._5 === nTot && BigInt(t._6) === ssb
          && BigInt(t._7) === ssw, "SS replay")
        val num = (nTot - k) * ssb * 1000000
        val den = (k - 1) * ssw
        val f = if (num >= 0) num / den else -((-num) / den)
        assert(t._8 === f.toLong, "sign-guarded F replay")
      }
    }
  }

  test("ansari_bradley_value: brute end-inward score replay") {
    val rows = run("ansari_bradley_value")
    val ev = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .selectExpr("event_type", "CAST(round(value * 1000) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = ev.map(_._2).sorted
    val n = all.length.toLong
    val nX = ev.count(_._1 == "click").toLong
    val nY = n - nX
    if (nX == 0 || nY == 0 || n < 3) assert(rows.isEmpty)
    else {
      val r2 = avgRank2(all.toIndexedSeq)
      def s2(v: Long): Long = math.min(r2(v), 2 * (n + 1) - r2(v))
      val ab2 = ev.filter(_._1 == "click").map(t => s2(t._2)).sum
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === nX && r.getLong(1) === nY)
      assert(r.getLong(2) === ab2, "exact doubled AB statistic")
      val (e, vr) =
        if (n % 2 == 0)
          (nX.toDouble * (n + 2) / 4.0,
            nX.toDouble * nY * (n + 2) * (n - 2) / (48.0 * (n - 1)))
        else
          (nX.toDouble * (n + 1) * (n + 1) / (4.0 * n),
            nX.toDouble * nY * (n + 1) * (3.0 + n.toDouble * n)
              / (48.0 * n * n))
      val z = BigDecimal((ab2 / 2.0 - e) / math.sqrt(vr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - z) < 1e-6, "parity z replay")
    }
  }

  test("gamma_somers_priority_qty: grid pair-count replay; |gamma| >= |D|") {
    val rows = run("gamma_somers_priority_qty")
    assert(rows.length === 1)
    val r = rows.head
    val cells = Tables.orders(spark, sf())
      .select("o_orderkey", "o_orderpriority")
      .join(Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .selectExpr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc",
        "CAST(round(l_quantity) AS BIGINT) AS q")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(identity).map { case ((sc, q), xs) =>
        (sc, q, xs.length.toLong) }.toSeq
    var (c, dd, tx, ty) = (BigInt(0), BigInt(0), BigInt(0), BigInt(0))
    for (a <- cells; b <- cells) {
      val p = BigInt(a._3) * b._3
      if (a._1 < b._1 && a._2 < b._2) c += p
      else if (a._1 < b._1 && a._2 > b._2) dd += p
      else if (a._1 == b._1 && a._2 < b._2) tx += p
      else if (a._1 < b._1 && a._2 == b._2) ty += p
    }
    assert(BigInt(r.getLong(0)) === c && BigInt(r.getLong(1)) === dd)
    assert(BigInt(r.getLong(2)) === tx && BigInt(r.getLong(3)) === ty,
      "exact grid pair counts")
    def sdiv(num: BigInt, den: BigInt): Long =
      (if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den))
        .toLong
    if (c + dd > 0) {
      assert(r.getLong(4) === sdiv(c - dd, c + dd), "gamma replay")
      if (c + dd + ty > 0) {
        assert(r.getLong(5) === sdiv(c - dd, c + dd + ty), "Somers replay")
        assert(math.abs(r.getLong(5)) <= math.abs(r.getLong(4)) + 1,
          "|D| <= |gamma| (larger denominator)")
      }
    } else assert(r.isNullAt(4))
  }

  test("page_trend_test: brute L replay against the friedman ranks") {
    val rows = run("page_trend_test")
    val cells = Tables.orders(spark, sf())
      .selectExpr("year(o_orderdate) * 12 + month(o_orderdate) AS blk",
        "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case ((blk, sc), ts) =>
        (blk, sc, ts.map(_._2).sum) }.toSeq
    val complete = cells.groupBy(_._1).filter(_._2.size == 5)
    if (complete.isEmpty) assert(rows.isEmpty)
    else {
      val n = complete.size.toLong
      var l2 = 0L
      complete.values.foreach { cs =>
        val vs = cs.map(_._3)
        cs.foreach { case (_, sc, v) =>
          l2 += sc * (2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
        }
      }
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === n && r.getLong(2) === l2, "exact L2")
      val z = BigDecimal((l2.toDouble / 2.0 - 45.0 * n)
        / (5.0 * math.sqrt(n.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - z) < 1e-6, "z leaf replay")
      // untied-rank bound: L is between the reverse and forward
      // monotone extremes n*Σj*(2(k-j)+...) — coarse sanity: μ ± kσ·√n
      assert(l2 >= 2 * 35 * n && l2 <= 2 * 55 * n,
        "L within the permutation extremes")
    }
  }
}
