package graft

/** Semantic pins for LexRichnessOps: full brute-force replay of every
  * statistic from the collected (source, word) counts at sf0.001 —
  * Herdan/Guiraud/Sichel/Honoré per source, the G² keyness top-20 cut,
  * and Gries' DP with its absent-source mass term.
  */
class LexRichnessSpec extends SparkSpec {
  private def run(key: String) =
    operators.LexRichnessOps.queries(key)(spark, sf()).collect()

  /** (source, word) → count, replaying the engines' split-on-space. */
  private lazy val counts: Map[(String, String), Long] =
    Tables.documents(spark, sf()).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  private lazy val bySource: Map[String, Map[String, Long]] =
    counts.groupBy(_._1._1).map { case (s, m) =>
      s -> m.map { case ((_, w), c) => w -> c }
    }

  test("herdan_guiraud_richness: replay; Herdan C in (0, 1] on a real corpus") {
    val rows = run("herdan_guiraud_richness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, n, v) = (r.getString(0), r.getLong(1), r.getLong(2))
      val m = bySource(src)
      assert(n === m.values.sum && v === m.size.toLong, s"$src counts")
      val c = math.floor(math.log(v.toDouble) / math.log(n.toDouble)
        * 1e6).toLong
      val g = math.floor(v.toDouble / math.sqrt(n.toDouble) * 1e6).toLong
      assert(r.getLong(3) === c, s"$src Herdan replay")
      assert(r.getLong(4) === g, s"$src Guiraud replay")
      // V ≤ N ⇒ C ≤ 1; a natural corpus has V ≥ 2 ⇒ C > 0
      assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L)
    }
  }

  test("sichel_honore_richness: spectrum replay; S + hapax share account types") {
    val rows = run("sichel_honore_richness")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, n, v, v1, v2) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val m = bySource(src)
      assert(n === m.values.sum && v === m.size.toLong)
      assert(v1 === m.values.count(_ == 1L).toLong, s"$src hapax")
      assert(v2 === m.values.count(_ == 2L).toLong, s"$src dis")
      assert(v1 + v2 <= v)
      assert(r.getLong(5) === v2 * 1000000L / v, "Sichel replay")
      if (v > v1) {
        val h = math.floor(100.0 * math.log(n.toDouble)
          / (1.0 - v1.toDouble / v.toDouble) * 1000.0).toLong
        assert(r.getLong(6) === h, s"$src Honoré replay")
      } else assert(r.isNullAt(6))
    }
  }

  test("dunning_g2_keyness: top-20 replays brute G²; true cut; min-freq respected") {
    val rows = run("dunning_g2_keyness")
    assert(rows.length === 20)
    val ns = bySource.map { case (s, m) => s -> m.values.sum }
    val nn = ns.values.sum
    val wf = counts.groupBy(_._1._2).map { case (w, m) =>
      w -> m.values.sum }
    def g2(a: Long, b: Long, n1: Long): Long = {
      val n2 = nn - n1
      val t1 = if (a > 0) a.toDouble *
        math.log(a.toDouble * nn / (n1.toDouble * (a + b))) else 0.0
      val t2 = if (b > 0) b.toDouble *
        math.log(b.toDouble * nn / (n2.toDouble * (a + b))) else 0.0
      val sign = if (a.toDouble * n2 >= b.toDouble * n1) 1.0 else -1.0
      math.floor(sign * 2.0 * (t1 + t2) * 1e6).toLong
    }
    val brute = counts.collect {
      case ((src, w), a) if wf(w) >= operators.LexRichnessOps.MinTermFreq =>
        ((src, w), g2(a, wf(w) - a, ns(src)))
    }
    rows.foreach { r =>
      val (src, w, a, b, g) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a === counts((src, w)) && b === wf(w) - a, s"cells $src/$w")
      assert(g === brute((src, w)), s"G²($src, $w) replay")
    }
    val cut = rows.map(_.getLong(4)).last
    val returned = rows.map(r => (r.getString(0), r.getString(1))).toSet
    brute.foreach { case (k, g) =>
      if (!returned(k)) assert(g <= cut, s"missed $k with G² $g > $cut")
    }
  }

  test("gries_dp_dispersion: replay incl. absent-source mass; DP in [0, 1e6)") {
    val rows = run("gries_dp_dispersion")
    assert(rows.length === 20)
    val ns = bySource.map { case (s, m) => s -> m.values.sum }
    val nn = ns.values.sum
    rows.foreach { r =>
      val (w, f, dp) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(f >= operators.LexRichnessOps.MinDispFreq)
      val sAbs = ns.map { case (src, nSrc) =>
        val c = counts.getOrElse((src, w), 0L)
        (BigInt(c) * nn - BigInt(nSrc) * f).abs
      }.sum
      assert(BigInt(dp) === sAbs * 1000000 / (2 * BigInt(f) * nn),
        s"DP($w) replay")
      assert(dp >= 0 && dp < 1000000L)
    }
    val scores = rows.map(_.getLong(2))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by DP")
  }
}
