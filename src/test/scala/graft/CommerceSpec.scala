package graft

/** Semantic pins for CommerceOps: the fill curve is a CDF (monotone,
  * ends at 1), elasticity is a bounded correlation over every brand,
  * and share shifts conserve (full-population shifts sum to zero, so
  * the top-10's |shift| ordering is pinned instead).
  */
class CommerceSpec extends SparkSpec {
  private def run(key: String) =
    operators.CommerceOps.queries(key)(spark, sf()).collect()

  test("order_fill_curve: monotone CDF ending at full coverage") {
    val rows = run("order_fill_curve")
    assert(rows.length === 9)
    val within = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(within.zip(within.tail).forall { case (a, b) => a <= b },
      "CDF is monotone")
    val total = rows.head.getLong(2)
    assert(total === Tables.lineitem(spark, sf()).count())
    assert(within.last === total, "k=120 bucket (clamped) covers all")
    assert(rows.sortBy(_.getLong(0)).last.getLong(3) === 1000000L)
  }

  test("price_elasticity_brand: one row per brand, |corr| <= 1") {
    val rows = run("price_elasticity_brand")
    val nBrands = Tables.part(spark, sf())
      .select("p_brand").distinct().count()
    assert(rows.length === nBrands)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) {
        val c = r.getDouble(2)
        assert(math.abs(c) <= 1.0 + 1e-9)
      }
    }
  }

  test("supplier_share_shift: ordered by |shift|; shares replay") {
    val rows = run("supplier_share_shift")
    assert(rows.nonEmpty && rows.length <= 10)
    val shifts = rows.map(r => math.abs(r.getLong(5)))
    assert(shifts.zip(shifts.tail).forall { case (a, b) => a >= b },
      "descending by |shift|")
    rows.foreach { r =>
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3),
        "shift replays from the two shares")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
  }

  test("time_decay_revenue: decay never amplifies; orders conserved") {
    val rows = run("time_decay_revenue")
    assert(rows.length === Tables.nation(spark, sf()).count(),
      "one row per nation")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf()).count(), "orders partitioned by nation")
    rows.foreach { r =>
      val (raw, dec, share) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dec >= 0L && dec <= raw, "exp(ln½·age/90) ≤ 1 per order")
      assert(share >= 0L && share <= 1000000L)
      assert(share === dec * 1000000L / raw, "share replay")
      assert(share < 1000000L, "a multi-year corpus must decay")
    }
  }

  test("littles_law_backlog: overlap conserves duration exactly") {
    val rows = run("littles_law_backlog")
    assert(rows.nonEmpty)
    val months = rows.map(_.getDate(0).toLocalDate)
    assert(months.sameElements(months.sorted), "month axis ordered")
    // exact conservation law: every order-day lands in exactly one
    // month, so Σ_months overlap = Σ_orders duration = Σ_months
    // (arrival-month attributed) duration — two independently
    // computed columns agreeing on the same corpus total
    val totOverlap = rows.map(_.getLong(3)).sum
    val totDur = rows.map(_.getLong(4)).sum
    assert(totOverlap === totDur, "Σ overlap = Σ duration")
    // arrivals partition the completed-order population
    import org.apache.spark.sql.functions._
    val comp = Tables.lineitem(spark, sf())
      .groupBy("l_orderkey").agg(max(to_date(col("l_shipdate"))).as("ship"))
      .join(Tables.orders(spark, sf())
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("ship") >= col("od"))
    assert(rows.map(_.getLong(2)).sum === comp.count())
    rows.foreach { r =>
      val (days, arr, ov, dur) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(days >= 28L && days <= 31L)
      assert(r.getLong(5) === ov * 1000000L / days, "L replay")
      assert(r.getLong(6) === arr * 1000000L / days, "λ replay")
      if (arr > 0)
        assert(r.getLong(7) === dur * 1000000L / arr, "W replay")
      else assert(r.isNullAt(7))
      if (dur > 0)
        assert(r.getLong(8) === ov * 1000000L / dur, "ratio replay")
      else assert(r.isNullAt(8))
      assert(ov >= arr, "an arrival contributes >= 1 overlap day")
    }
  }

  test("var_es_daily_revenue: brute tail replay; ES <= VaR") {
    val rows = run("var_es_daily_revenue")
    val daily = Tables.orders(spark, sf())
      .groupBy(org.apache.spark.sql.functions.expr(
        "datediff(o_orderdate, DATE '1992-01-01')").as("di"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (daily.length < 2) assert(rows.isEmpty)
    else {
      val deltas = daily.sliding(2).map(p => (p(1)._1, p(1)._2 - p(0)._2))
        .toArray
      val m = deltas.length.toLong
      val k = math.max(1L, math.ceil(0.05 * m).toLong)
      val sorted = deltas.sortBy(t => (t._2, t._1)).take(k.toInt)
      val varC = sorted.map(_._2).max
      val tailSum = sorted.map(_._2).sum
      val es = if (tailSum >= 0) tailSum * 1000000L / k
        else -((-tailSum) * 1000000L / k)
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === m && r.getLong(1) === k)
      assert(r.getLong(2) === varC, "rank-defined VaR pick")
      assert(r.getLong(3) === es, "exact tail mean")
      assert(r.getLong(3) <= r.getLong(2) * 1000000L,
        "ES is at most the VaR boundary")
    }
  }

  test("weibull_latency_fit: plotting-position OLS replay") {
    val rows = run("weibull_latency_fit")
    val lat = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()).select("o_orderkey", "o_orderdate"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr(
        "datediff(CAST(l_shipdate AS DATE), CAST(o_orderdate AS DATE)) AS t")
      .collect().map(_.getInt(0).toLong).filter(_ >= 1)
    val n = lat.length.toLong
    val sup = lat.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val pts = sup.map { case (t, cnt) =>
      cum += cnt
      (math.floor(math.log(t.toDouble) * 1e6).toLong,
        math.floor(math.log(-math.log(1.0 - cum.toDouble / (n + 1)))
          * 1e6).toLong)
    }
    val p = pts.length.toLong
    if (p < 2) assert(rows.isEmpty)
    else {
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(q => BigInt(q._1) * q._2).sum
      val sxx = pts.map(q => BigInt(q._1) * q._1).sum
      val num = p * sxy - BigInt(sx) * sy
      val den = p * sxx - BigInt(sx) * sx
      if (den <= 0) assert(rows.isEmpty)
      else {
        def sdiv(a: BigInt, b: BigInt): Long =
          (if (a >= 0) a / b else -((-a) / b)).toLong
        assert(rows.length === 1)
        val r = rows.head
        assert(r.getLong(0) === n && r.getLong(1) === p)
        assert(r.getLong(2) === sdiv(num * 1000000, den), "shape replay")
        assert(r.getLong(3) ===
          sdiv(BigInt(sy) * den - num * sx, BigInt(p) * den),
          "intercept replay")
        assert(r.getLong(2) > 0, "latency CDF is increasing => shape > 0")
      }
    }
  }

  test("abc_inventory_classification: brute replay; classes partition parts and revenue") {
    val rows = run("abc_inventory_classification")
    val revs = Tables.lineitem(spark, sf())
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(round(l_extendedprice * 100) AS BIGINT)")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tot = revs.map(_._2).sum
    var cum = 0L
    val classes = revs.sortBy(p => (-p._2, p._1)).map { case (_, rev) =>
      cum += rev
      if (cum * 10 <= 8 * tot) ("A", rev)
      else if (cum * 100 <= 95 * tot) ("B", rev) else ("C", rev)
    }
    val brute = classes.groupBy(_._1).map { case (c, g) =>
      c -> (g.length.toLong, g.map(_._2).sum) }
    assert(rows.map(_.getString(0)).toSeq === brute.keys.toSeq.sorted)
    rows.foreach { r =>
      val (c, n, rev, share) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert((n, rev) === brute(c), s"class $c census replay")
      assert(share === rev * 1000000L / tot)
    }
    assert(rows.map(_.getLong(1)).sum === revs.length.toLong,
      "classes partition the parts")
    assert(rows.map(_.getLong(2)).sum === tot,
      "classes partition the revenue")
    // sorted-order law (distribution-free, unlike a Pareto-shape pin —
    // the synthetic fixture's part revenues are near-uniform): mean
    // revenue per part is non-increasing A → B → C
    val byC = rows.map(r => r.getString(0) -> r).toMap
    def meanRev(c: String) =
      byC(c).getLong(2).toDouble / byC(c).getLong(1)
    assert(meanRev("A") >= meanRev("B") && meanRev("B") >= meanRev("C"),
      "class mean revenue non-increasing")
  }

  test("laspeyres_paasche_index: base month indexes at exactly 1; Fisher between L and P") {
    val rows = run("laspeyres_paasche_index")
    assert(rows.nonEmpty)
    val mis = rows.map(_.getInt(0))
    assert(mis.sameElements(mis.sorted))
    // the base month is its own basket: L = P = F = 1.000000
    val base = rows.head
    assert(base.getLong(2) === 1000000L && base.getLong(3) === 1000000L,
      "base month L = P = 1")
    assert(base.getLong(4) === 1000000L, "base month Fisher = 1")
    rows.foreach { r =>
      val (l, p, f) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(l > 0 && p > 0 && f > 0)
      // Fisher is the geometric mean: between min and max of L and P
      // (1 fp unit of slack for the two truncations)
      assert(f >= math.min(l, p) - 1 && f <= math.max(l, p) + 1,
        s"Fisher $f outside [$l, $p]")
      assert(r.getLong(1) > 0, "non-empty basket")
    }
  }

  test("new_returning_revenue_split: cohort replay; first month is all-new") {
    val rows = run("new_returning_revenue_split")
    assert(rows.nonEmpty)
    val ords = Tables.orders(spark, sf())
      .selectExpr("o_custkey",
        "year(o_orderdate) * 12 + month(o_orderdate)",
        "CAST(round(o_totalprice * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    val cohort = ords.groupBy(_._1).map { case (c, g) =>
      c -> g.map(_._2).min }
    val brute = ords.groupBy(_._2).map { case (mi, g) =>
      mi -> (g.length.toLong,
        g.filter(o => cohort(o._1) == mi).map(_._3).sum,
        g.filter(o => cohort(o._1) != mi).map(_._3).sum)
    }
    rows.foreach { r =>
      val (mi, n, nw, rt) = (r.getInt(0).toLong, r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert((n, nw, rt) === brute(mi), s"month $mi split replay")
      assert(r.getLong(4) === nw * 1000000L / (nw + rt))
    }
    // every first-month customer is by definition new
    assert(rows.head.getLong(3) === 0L, "first month has no returners")
    assert(rows.map(_.getInt(0).toLong).toSet === brute.keySet)
  }

  test("eoq_reorder_policy: per-brand demand/unit/EOQ/reorder replay") {
    val rows = run("eoq_reorder_policy")
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf())
      .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong))
    val brandOf = Tables.part(spark, sf())
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val span = li.map(_._4).max - li.map(_._4).min + 1
    val brute = li.groupBy(x => brandOf(x._1)).map { case (b, g) =>
      val dem = g.map(_._2).sum
      val rev = g.map(_._3).sum
      val unit = (BigInt(rev) * 1000000 / dem).toLong
      val eoq = math.floor(math.sqrt(
        2.0 * dem.toDouble * 10000.0 / (0.2 * (unit.toDouble / 1000000.0)))
        * 1000000.0).toLong
      val rp = (BigInt(dem) * 7 * 1000000 / span).toLong
      b -> (dem, unit, eoq, rp)
    }
    assert(rows.length === brute.size, "one row per brand")
    rows.foreach { r =>
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(got === brute(r.getString(0)), s"brand ${r.getString(0)}")
      assert(r.getLong(3) > 0L && r.getLong(4) > 0L)
    }
  }

  test("safety_stock_plan: per-brand moment replay; monotone in level") {
    val rows = run("safety_stock_plan")
    assert(rows.nonEmpty && rows.length % 3 === 0, "3 levels per brand")
    val li = Tables.lineitem(spark, sf())
      .selectExpr("l_partkey",
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')",
        "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val brandOf = Tables.part(spark, sf())
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val zOf = Map(90L -> 1.2815515655446004, 95L -> 1.6448536269514722,
      99L -> 2.3263478740408408)
    val brute = li.groupBy(x => brandOf(x._1)).collect {
      case (b, g) if g.map(_._2).distinct.length >= 2 =>
        val daily = g.groupBy(_._2).values.map(_.map(_._3).sum).toSeq
        val n = daily.length.toLong
        val sd = daily.map(BigInt(_)).sum
        val sq = daily.map(v => BigInt(v) * v).sum
        b -> (n, BigInt(n) * sq - sd * sd)
    }
    rows.foreach { r =>
      val (n, varnum) = brute(r.getString(0))
      assert(r.getLong(2) === n, s"brand ${r.getString(0)} day census")
      val want = math.floor(zOf(r.getLong(1))
        * math.sqrt(varnum.toDouble / (n.toDouble * (n.toDouble - 1.0)))
        * math.sqrt(7.0) * 1000000.0).toLong
      assert(r.getLong(3) === want,
        s"brand ${r.getString(0)} level ${r.getLong(1)} leaf replay")
      assert(r.getLong(3) >= 0L)
    }
    // higher service level => larger buffer, per brand
    rows.grouped(3).foreach { g =>
      assert(g(0).getLong(3) <= g(1).getLong(3)
        && g(1).getLong(3) <= g(2).getLong(3), "monotone in z")
    }
  }

  test("abc_xyz_matrix: brute per-part class replay; census partitions") {
    val rows = run("abc_xyz_matrix")
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf())
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(l_quantity AS BIGINT)",
        "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') DIV 7")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rev = li.groupBy(_._1).map { case (p, g) => p -> g.map(_._2).sum }
    val tot = rev.values.sum
    // ABC: inclusive cumulative rule over (-rev, partkey) order
    val sorted = rev.toSeq.sortBy { case (p, r) => (-r, p) }
    var cum = 0L
    val abcOf = sorted.map { case (p, r) =>
      cum += r
      p -> (if (cum * 10 <= 8 * tot) "A"
            else if (cum * 100 <= 95 * tot) "B" else "C")
    }.toMap
    val xyzOf = li.groupBy(_._1).map { case (p, g) =>
      val wq = g.groupBy(_._4).values.map(_.map(_._3).sum).toSeq
      val n = wq.length.toLong
      val sw = wq.map(BigInt(_)).sum
      val varnum = BigInt(n) * wq.map(v => BigInt(v) * v).sum - sw * sw
      p -> (if (n < 2) "Z"
            else if (4 * varnum * n <= (n - 1) * sw * sw) "X"
            else if (varnum * n <= (n - 1) * sw * sw) "Y" else "Z")
    }
    val brute = rev.keys.toSeq.groupBy(p => (abcOf(p), xyzOf(p)))
      .map { case (k, ps) =>
        k -> (ps.length.toLong,
          (BigInt(ps.map(rev).sum) * 1000000 / tot).toLong) }
    assert(rows.length === brute.size, "one row per occupied cell")
    rows.foreach { r =>
      assert((r.getLong(2), r.getLong(3)) ===
        brute((r.getString(0), r.getString(1))),
        s"cell ${r.getString(0)}${r.getString(1)} replay")
    }
    assert(rows.map(_.getLong(2)).sum === rev.size.toLong,
      "every part lands in exactly one cell")
  }

  test("newsvendor_order_level: rank-pick replay + critical-fractile law") {
    import org.apache.spark.sql.functions.{count, expr, lit}
    val daily = Tables.orders(spark, sf())
      .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(t => t).map(_._2)
    val sorted = daily.sorted
    val n = sorted.length
    val rank = (4 * n + 8) / 9
    val level = sorted(rank - 1)
    val covered = daily.count(_ <= level)
    val Array(r) = run("newsvendor_order_level")
    assert(r.getLong(0) === n.toLong && r.getLong(1) === rank.toLong)
    assert(r.getLong(2) === level, "order-up-to = value at rank ⌈4n/9⌉")
    assert(r.getLong(3) === covered.toLong)
    assert(r.getLong(4) === covered.toLong * 1000000L / n)
    // the rank-defined quantile covers at least the critical fractile
    assert(r.getLong(4) * 9 >= 4 * 1000000L - 9 * 1000000L / n,
      "empirical coverage >= 4/9 up to one day's mass")
  }
}
