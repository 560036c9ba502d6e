package graft

/** Semantic pins for InfoStatOps (the DuckDB oracle hash-checks the
  * queries; these pin the mathematical invariants a hash match can't
  * name — non-negativity laws, CDF bounds, weight conservation, the
  * pair-count triangular law, and ordering contracts).
  */
class InfoStatSpec extends SparkSpec {
  private def run(key: String) =
    operators.InfoStatOps.queries(key)(spark, sf()).collect()

  test("kl_divergence_source_unigram: Gibbs non-negativity within floor slack") {
    val rows = run("kl_divergence_source_unigram")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, kl) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok > 0 && nTyp > 0 && nTyp <= nTok)
      // each of the n_types terms is FLOOR-truncated (error < 1 ulp of
      // 1e-9), so the exact KL >= 0 implies kl_fp >= -n_types
      assert(kl >= -nTyp, s"KL must be >= 0 up to floor slack: $r")
    }
    // sources are distinct and sorted (output contract)
    val srcs = rows.map(_.getString(0))
    assert(srcs.distinct.length === srcs.length && srcs.sorted.sameElements(srcs))
  }

  test("chi2_event_weekday_independence: full grid, dof law, chi2 >= 0") {
    val Array(r) = run("chi2_event_weekday_independence")
    val (n, cells, dof, chi2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n === Tables.events(spark, sf()).count())
    // the grid is the full cross product of observed margins, so
    // n_cells = (#types)·(#dows) and dof = (#types-1)·(#dows-1):
    // with r rows and c cols, cells - dof = r + c - 1
    val types = Tables.events(spark, sf())
      .select("event_type").distinct().count()
    assert(cells % types === 0)
    val dows = cells / types
    assert(dof === (types - 1) * (dows - 1))
    // chi2 >= 0 up to per-cell floor slack
    assert(chi2 >= -cells)
  }

  test("ks_two_sample_value: statistic is a CDF distance in [0, 1e9]") {
    val Array(r) = run("ks_two_sample_value")
    val (n1, n2, ks) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n1 > 0 && n2 > 0)
    assert(ks >= 0 && ks <= 1000000000L)
    // both samples together cover every click/purchase event
    val byType = Tables.events(spark, sf())
      .filter("event_type IN ('click','purchase')")
      .groupBy("event_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(n1 === byType("click") && n2 === byType("purchase"))
  }

  test("ewma_control_chart: weights conserve mass; top-50 ordering holds") {
    val rows = run("ewma_control_chart")
    assert(rows.length === 50)
    // dev ordering is |dev| desc with (user_id, event_id) ties
    val devs = rows.map(r => math.abs(r.getLong(4)))
    assert(devs.sameElements(devs.sortBy(-_)))
    rows.foreach { r =>
      val (v, ewma, dev) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dev === 256 * v - ewma, "deviation replays from the weights")
      // weights sum to 256, so ewma_num/256 lies in the lagged value
      // range — bounded by the global fixture envelope [10, 490020]
      assert(ewma >= 10 * 256 && ewma <= 490020L * 256)
    }
  }

  test("theil_sen_nation_trend: pair counts are triangular; one median per nation") {
    val rows = run("theil_sen_nation_trend")
    assert(rows.length === Tables.nation(spark, sf()).count())
    rows.foreach { r =>
      val nPairs = r.getLong(1)
      // n_pairs = C(m, 2) for the nation's month count m => 8p+1 square
      val disc = 8 * nPairs + 1
      val root = math.sqrt(disc.toDouble).round
      assert(root * root === disc, s"n_pairs=$nPairs is not triangular")
    }
    val names = rows.map(_.getString(0))
    assert(names.distinct.length === names.length)
  }

  test("mutual_information_lang_source: MI >= 0; cells bound by margins") {
    val Array(r) = run("mutual_information_lang_source")
    val (n, cells, mi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n === Tables.documents(spark, sf()).count())
    val langs = Tables.documents(spark, sf()).select("lang").distinct().count()
    val srcs = Tables.documents(spark, sf()).select("source").distinct().count()
    assert(cells <= langs * srcs)
    assert(mi >= -cells, "MI >= 0 up to per-cell floor slack")
  }

  test("welch_t_value: moment replay, df bounds, and sign consistency") {
    import org.apache.spark.sql.functions._
    val Array(r) = run("welch_t_value")
    val (n1, n2, tFp, dfFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val vals = Tables.events(spark, sf())
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val (c, p) = (vals.filter(_._1 == "click").map(_._2),
      vals.filter(_._1 == "purchase").map(_._2))
    assert(n1 === c.length && n2 === p.length)
    // Welch–Satterthwaite df lies in [min(n)−1, n1+n2−2]
    assert(dfFp >= (math.min(n1, n2) - 1) * 1000000L)
    assert(dfFp <= (n1 + n2 - 2) * 1000000L)
    // full replay in IEEE doubles from exact BigInt moments
    def mom(xs: Array[Long]) = {
      val n = xs.length
      val sv = xs.sum
      val svv = xs.map(x => BigInt(x) * x).sum
      val vn = BigInt(n) * svv - BigInt(sv) * sv
      (n.toLong, sv, vn)
    }
    val (na, sva, vna) = mom(c)
    val (nb, svb, vnb) = mom(p)
    val a = vna.toDouble / (na.toDouble * (na - 1) * na)
    val b = vnb.toDouble / (nb.toDouble * (nb - 1) * nb)
    val t = (sva.toDouble / na - svb.toDouble / nb) / math.sqrt(a + b)
    val df = (a + b) * (a + b) / (a * a / (na - 1) + b * b / (nb - 1))
    assert(tFp === math.floor(t * 1e6).toLong, "t replay")
    assert(dfFp === math.floor(df * 1e6).toLong, "df replay")
    // sign agrees with the raw mean difference
    val meanDiff = sva.toDouble / na - svb.toDouble / nb
    if (meanDiff > 0) assert(tFp >= 0) else if (meanDiff < 0) assert(tFp < 0)
  }

  test("js_divergence_sources: ln2 bound, pair grid, one-pair replay") {
    import org.apache.spark.sql.functions._
    val rows = operators.InfoStatOps
      .queries("js_divergence_sources")(spark, sf()).collect()
    val nSrc = Tables.documents(spark, sf())
      .select("source").distinct().count()
    assert(rows.length.toLong === nSrc * (nSrc - 1) / 2, "C(S,2) pairs")
    val ln2fp = math.ceil(math.log(2.0) * 1e9).toLong
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      // JS ∈ [0, ln 2]; the four floors can only shave ≤ 4 fp units
      assert(r.getLong(5) >= -2L, "JS >= 0 up to floor slack")
      assert(r.getLong(5) <= ln2fp, "JS bounded by ln 2")
    }
    // full leaf-exact replay of the first pair
    val t = rows.head
    val (sa, sb) = (t.getString(0), t.getString(1))
    val wc = Tables.documents(spark, sf())
      .filter(col("source").isin(sa, sb))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ca = wc.filter(_._1 == sa).map(x => x._2 -> x._3).toMap
    val cb = wc.filter(_._1 == sb).map(x => x._2 -> x._3).toMap
    val na = ca.values.sum.toDouble; val nb = cb.values.sum.toDouble
    assert(t.getLong(2) === na.toLong && t.getLong(3) === nb.toLong)
    val sharedWs = ca.keySet.intersect(cb.keySet)
    assert(t.getLong(4) === sharedWs.size.toLong)
    var acc = 0L
    sharedWs.foreach { w =>
      val (x, y) = (ca(w).toDouble, cb(w).toDouble)
      acc += math.floor(x / na *
        math.log(2.0 * x * nb / (x * nb + y * na)) * 1e9).toLong
      acc += math.floor(y / nb *
        math.log(2.0 * y * na / (y * na + x * nb)) * 1e9).toLong
    }
    val shca = sharedWs.toSeq.map(ca).sum
    val shcb = sharedWs.toSeq.map(cb).sum
    acc += math.floor((na - shca) / na * math.log(2.0) * 1e9).toLong
    acc += math.floor((nb - shcb) / nb * math.log(2.0) * 1e9).toLong
    assert(t.getLong(5) === acc / 2, "leaf-exact JS replay")
  }

  test("qq_deciles_value: rank-defined decile replay; monotone columns") {
    val rows = run("qq_deciles_value").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .selectExpr("event_type", "CAST(round(value * 1000) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def deciles(g: String): Map[Long, Long] = {
      val vs = ev.filter(_._1 == g).map(_._2).sorted
      (1 to 9).flatMap { i =>
        val t = (i.toLong * vs.length) / 10
        if (t >= 1) Some(i.toLong -> vs((t - 1).toInt)) else None
      }.toMap
    }
    val (qc, qp) = (deciles("click"), deciles("purchase"))
    rows.foreach { case (i, c, p, gap) =>
      assert(c === qc(i) && p === qp(i), s"decile $i rank-defined pick")
      assert(gap === p - c)
    }
    // each column is non-decreasing in the decile index
    rows.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(1)._2 >= w(0)._2 && w(1)._3 >= w(0)._3, "monotone CDFs")
      }
    }
  }

  test("energy_distance_value: brute pairwise-|diff| replay; D2 >= 0") {
    val rows = run("energy_distance_value")
    val ev = Tables.events(spark, sf())
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("click", "purchase"))
      .selectExpr("event_type", "CAST(round(value * 1000) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val xs = ev.filter(_._1 == "click").map(_._2)
    val ys = ev.filter(_._1 == "purchase").map(_._2)
    if (xs.isEmpty || ys.isEmpty) assert(rows.isEmpty)
    else {
      // brute sums via sorted-merge per value (support-sized, honest)
      def absSum(as: Array[Long], bs: Array[Long]): BigInt = {
        val sorted = as.sorted
        val prefix = sorted.scanLeft(BigInt(0))(_ + _)
        val tot = prefix.last
        bs.map { v =>
          val k = sorted.count(_ <= v)
          BigInt(v) * k - prefix(k) + (tot - prefix(k)) -
            BigInt(v) * (sorted.length - k)
        }.sum
      }
      val sxy = absSum(xs, ys)
      val sxx = absSum(xs, xs)
      val syy = absSum(ys, ys)
      assert(rows.length === 1)
      val r = rows.head
      val (n1, n2) = (xs.length.toLong, ys.length.toLong)
      assert(r.getLong(0) === n1 && r.getLong(1) === n2)
      assert(BigInt(r.getLong(2)) === sxy && BigInt(r.getLong(3)) === sxx
        && BigInt(r.getLong(4)) === syy, "exact pairwise-|diff| sums")
      val num = 2 * sxy * n1 * n2 - sxx * n2 * n2 - syy * n1 * n1
      assert(num >= 0, "energy distance is non-negative (Szekely)")
      val den = BigInt(n1) * n1 * n2 * n2
      assert(r.getLong(5) === (num * 1000000 / den).toLong, "D2 ratio")
    }
  }

  test("bhattacharyya_hellinger_sources: bounds, H-from-BC leaf, one-pair replay") {
    import org.apache.spark.sql.functions._
    val rows = operators.InfoStatOps
      .queries("bhattacharyya_hellinger_sources")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bc = r.getLong(5); val h = r.getLong(6)
      assert(bc >= 0L && bc <= 1000000000000L, "BC in [0, 1]")
      assert(h >= 0L && h <= 1000000L, "Hellinger in [0, 1]")
      assert(h === math.floor(
        math.sqrt(math.max(0.0, 1.0 - bc.toDouble / 1e12)) * 1e6).toLong,
        "H is the pinned leaf over the exact BC sum")
    }
    // one-pair replay from raw token counts (the JS spec recipe)
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    val cnt = Tables.documents(spark, sf())
      .filter(col("source").isin(sa, sb))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val na = cnt.collect { case ((s, _), c) if s == sa => c }.sum
    val nb = cnt.collect { case ((s, _), c) if s == sb => c }.sum
    // toSeq: Map.keys is a Set — mapping a Set would DEDUPE equal
    // per-term floor values before the sum
    val shared = cnt.keys.toSeq.collect { case (s, w) if s == sa &&
      cnt.contains((sb, w)) => w }
    val bcExp = shared.map { w =>
      math.floor(math.sqrt((cnt((sa, w)).toDouble / na) *
        (cnt((sb, w)).toDouble / nb)) * 1e12).toLong
    }.sum
    assert(rows.head.getLong(2) === na && rows.head.getLong(3) === nb)
    assert(rows.head.getLong(5) === bcExp, "per-term BC replay")
  }
}
