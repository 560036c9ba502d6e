package graft

import org.apache.spark.sql.functions._

/** Semantic pins for SmoothingOps — the conservation laws and smoothing
  * identities the oracle hash can't name.
  */
class SmoothingSpec extends SparkSpec {
  private def run(key: String) =
    operators.SmoothingOps.queries(key)(spark, sf()).collect()

  test("good_turing_spectrum: conserves tokens, types, and the GT identity") {
    val rows = run("good_turing_spectrum")
    val words = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
    // Σ r·N_r = total tokens; Σ N_r = vocabulary size
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === words.count())
    assert(rows.map(_.getLong(1)).sum ===
      words.distinct().count())
    // spectrum rows are unique and sorted by r
    val rs = rows.map(_.getLong(0))
    assert(rs.distinct.length === rs.length && rs.sorted.sameElements(rs))
    // GT identity: r*·N_r = (r+1)·N_{r+1} to fixed-point truncation
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val next = byR.get(r.getLong(0) + 1)
        assert(next.isDefined, "r* present only when the successor exists")
        val expected = (r.getLong(0) + 1) * next.get.getLong(1) * 1000000L /
          r.getLong(1)
        assert(r.getLong(2) === expected)
      } else assert(!byR.contains(r.getLong(0) + 1))
    }
  }

  test("kneser_ney_continuation: contexts partition the bigram-type set") {
    val rows = run("kneser_ney_continuation")
    // each distinct bigram type contributes exactly one context to its
    // right word, so Σ n_contexts = n_bigram_types (the constant column)
    val tot = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) === tot), "type total is corpus-constant")
    assert(rows.map(_.getLong(1)).sum === tot)
    // p_cont is a probability: the fixed-point masses sum to 1e6 up to
    // per-row truncation (each row truncates < 1 unit)
    val mass = rows.map(_.getLong(3)).sum
    assert(mass <= 1000000L && mass > 1000000L - rows.length)
    // ordering is total: (n_contexts desc, w asc)
    val keys = rows.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sorted.sameElements(keys))
  }

  test("log_odds_informative_terms: z ranks src0-exclusive words on top") {
    val rows = run("log_odds_informative_terms")
    assert(rows.length <= 25 && rows.nonEmpty)
    // ordered by z desc (ties broken by word)
    val zs = rows.map(_.getLong(3))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    // counts reconcile with the corpus for the top word
    val top = rows.head
    val Array(cnt) = Tables.documents(spark, sf())
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === top.getString(0))
      .agg(count(when(col("source") === "src0", 1)).as("y1"),
        count(when(col("source") =!= "src0", 1)).as("y2"))
      .collect()
    assert(top.getLong(1) === cnt.getLong(0) && top.getLong(2) === cnt.getLong(1))
    // a word over-represented in src0 must outrank the same word's
    // mirror-image under-representation: z is monotone in y1 at fixed
    // totals — pin the direction with the top vs bottom rows
    assert(rows.head.getLong(3) >= rows.last.getLong(3))
  }

  test("chao1_vocab_richness: estimator dominance and spectrum accounting") {
    val rows = operators.SmoothingOps.queries("chao1_vocab_richness")(
      spark, sf()).collect()
    val nSources = Tables.documents(spark, sf())
      .select("source").distinct().count()
    assert(rows.length === nSources)
    rows.foreach { r =>
      val (n, sObs, f1, f2, chao1) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sObs <= n, "types ≤ tokens")
      assert(f1 + f2 <= sObs, "singletons+doubletons ⊆ observed types")
      // Chao1 never estimates FEWER types than observed
      assert(chao1 >= sObs * 1000000L, "Ŝ ≥ S_obs")
      // bias-corrected replay
      assert(chao1 === sObs * 1000000L +
        f1 * (f1 - 1) * 1000000L / (2 * (f2 + 1)))
    }
  }

  test("mkn_discount_estimation: spectrum accounting and CG98 replay") {
    val Array(r) = operators.SmoothingOps
      .queries("mkn_discount_estimation")(spark, sf()).collect()
    val (types, n1, n2, n3, n4) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n1 + n2 + n3 + n4 <= types, "spectrum ⊆ bigram types")
    assert(n1 > 0, "a natural corpus has singleton bigrams")
    // D1 = Y = n1/(n1+2n2) ∈ (0, 1); discounts must stay below the
    // count they are subtracted from (0 < D_r, D_r < r is the usable
    // regime; CG98's estimator can exit it only on degenerate spectra)
    val d1 = r.getLong(5)
    assert(d1 === n1 * 1000000L / (n1 + 2 * n2), "D1 rational replay")
    assert(d1 > 0 && d1 < 1000000L)
    if (!r.isNullAt(6)) {
      val d2 = r.getLong(6)
      val expect = 2000000L -
        (BigInt(3) * n1 * n3 * 1000000 / (BigInt(n1 + 2 * n2) * n2)).toLong
      assert(d2 === expect, "D2 rational replay")
    }
    if (!r.isNullAt(7)) {
      val d3 = r.getLong(7)
      val expect = 3000000L -
        (BigInt(4) * n1 * n4 * 1000000 / (BigInt(n1 + 2 * n2) * n3)).toLong
      assert(d3 === expect, "D3+ rational replay")
    }
    // independent spectrum recount from the raw corpus
    import org.apache.spark.sql.functions._
    val bi = Tables.documents(spark, sf())
      .select(split(col("text"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(a) - 1),
          |  i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"""
          .stripMargin)).as("bg"))
      .groupBy("bg").count().groupBy("count").count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(n1 === bi.getOrElse(1L, 0L) && n2 === bi.getOrElse(2L, 0L))
    assert(n3 === bi.getOrElse(3L, 0L) && n4 === bi.getOrElse(4L, 0L))
  }

  test("yule_k_richness: BigInt spectrum replay; K >= 0") {
    val rows = run("yule_k_richness").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6),
      if (r.isNullAt(7)) None else Some(r.getLong(7))))
    val docs = Tables.documents(spark, sf())
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum; val v = counts.size.toLong
      val f1 = counts.count(_ == 1L).toLong
      val f2 = counts.count(_ == 2L).toLong
      val s2 = counts.map(c => BigInt(c) * c).sum
      val k = (BigInt(10000) * (s2 - n) * 1000000 /
        (BigInt(n) * n)).toLong
      val honore = if (f1 == v) None else Some(math.floor(
        100.0 * math.log(n.toDouble) / (1.0 - f1.toDouble / v) * 1e6).toLong)
      (src, n, v, f1, f2, k, f2 * 1000000L / v, honore)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expect, "exact spectrum-panel replay")
    rows.foreach { case (_, n, v, f1, _, k, s, _) =>
      assert(k >= 0L, "Sum r^2*N_r >= N always")
      assert(s >= 0L && s <= 1000000L && f1 <= v && v <= n)
    }
  }

  test("powerlaw_alpha_mle: FLOOR'd-leaf replay; alpha > 1") {
    val rows = run("powerlaw_alpha_mle").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf())
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity)
        .map(_._2.length.toLong)
      val sumFp = counts.map(c =>
        math.floor(math.log(2.0 * c) * 1e6).toLong).sum
      val alpha = 1000000L +
        (BigInt(counts.size) * BigInt(1000000000000L) / sumFp).toLong
      (src, counts.size.toLong, counts.sum, alpha)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expect, "exact leaf-sum replay")
    rows.foreach { case (_, v, n, a) =>
      assert(a > 1000000L, "alpha > 1 by construction")
      assert(v <= n)
      // all-hapax floor: alpha <= 1 + 1/ln2 (every extra count only
      // raises the denominator)
      assert(a <= 1000000L + (BigInt(1000000000000L) / 693147L).toLong + 1)
    }
  }

  test("vocab_rank_churn: brute top-100 replay; footrule bounds") {
    val rows = run("vocab_rank_churn").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)))
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) % 2, r.getString(1).split(" ", -1)))
    def top100(h: Long): Map[String, Long] = {
      val c = docs.filter(_._1 == h).flatMap(_._2)
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      c.sortBy(t => (-t._2, t._1)).take(100).zipWithIndex
        .map { case ((w, _), i) => w -> (i + 1L) }.toMap
    }
    val (ta, tb) = (top100(0L), top100(1L))
    val union = (ta.keySet ++ tb.keySet).toSeq
    val ranksJ = union.map { w =>
      val ra = ta.getOrElse(w, 101L); val rb = tb.getOrElse(w, 101L)
      (w, ra, rb, math.abs(ra - rb))
    }
    val footrule = ranksJ.map(_._4).sum
    val nShared = union.count(w => ta.contains(w) && tb.contains(w)).toLong
    val expTop = ranksJ.sortBy(t => (-t._4, t._1)).take(10)
    assert(rows.map(t => (t._1, t._2, t._3, t._4)) === expTop,
      "top-10 movers replay")
    rows.foreach { case (_, _, _, _, fr, ns, nu) =>
      assert(fr === footrule && ns === nShared
        && nu === union.length.toLong)
      assert(fr <= 100L * nu, "each union word moves at most 100 ranks")
      assert(ns <= 100L && nu <= 200L
        && nu === ta.size.toLong + tb.size.toLong - ns,
        "union/shared accounting")
    }
  }

  test("renyi_entropy_spectrum: leaf replay; spectrum non-increasing") {
    val rows = run("renyi_entropy_spectrum").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7)))
    val docs = Tables.documents(spark, sf())
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity)
        .map(_._2.length.toLong)
      val n = counts.sum; val v = counts.size.toLong
      val cmax = counts.max
      val s2 = counts.map(c => BigInt(c) * c).sum
      val h1 = counts.map(c => math.floor(
        c.toDouble * math.log(n.toDouble / c) * 1e6).toLong).sum / n
      (src, n, v, cmax,
        math.floor(math.log(v.toDouble) * 1e6).toLong, h1,
        math.floor(math.log(n.toDouble * n / s2.toDouble) * 1e6).toLong,
        math.floor(math.log(n.toDouble / cmax) * 1e6).toLong)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expect, "bit-exact spectrum replay")
    rows.foreach { case (_, n, v, cmax, h0, h1, h2, hinf) =>
      // Rényi order monotonicity (within 1 fp unit of floor slack)
      assert(h0 >= h1 - 1 && h1 >= h2 - 1 && h2 >= hinf - 1,
        "H0 >= H1 >= H2 >= Hinf")
      assert(hinf >= 0 && cmax <= n && v <= n)
    }
  }
}
