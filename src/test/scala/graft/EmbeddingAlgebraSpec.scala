package graft

import org.apache.spark.sql.functions._

/** Semantic pins for EmbeddingAlgebraOps — the exact-arithmetic
  * reconciliation and PSD-iteration laws the oracle hash can't name.
  */
class EmbeddingAlgebraSpec extends SparkSpec {

  test("embedding_covariance_topk: the exact statistic reconciles with a direct fold") {
    val rows = operators.EmbeddingAlgebraOps.queries(
      "embedding_covariance_topk")(spark, sf()).collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getInt(0) < r.getInt(1), "upper triangle only"))
    // cov_num crosses the SELECT boundary as a canonical digit string
    // (r12 decimal ban); parse back to exact decimal for the law checks
    def cov(r: org.apache.spark.sql.Row) = new java.math.BigDecimal(r.getString(3))
    // ranking is by |cov_num| nonincreasing
    val mags = rows.map(r => cov(r).abs)
    mags.zip(mags.tail).foreach { case (a, b) => assert(a.compareTo(b) >= 0) }
    // direct recomputation of the top pair from the raw table
    val (i, j) = (rows.head.getInt(0), rows.head.getInt(1))
    val fx = Tables.embeddings(spark, sf())
      .select(expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT))")
        .as("fxs"))
      .select(expr(s"element_at(fxs, ${i + 1})").as("a"),
        expr(s"element_at(fxs, ${j + 1})").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(a AS DECIMAL(38,0)) * b")).as("sxy"),
        sum(col("a").cast("decimal(38,0)")).as("sa"),
        sum(col("b").cast("decimal(38,0)")).as("sb"))
      .select(expr("CAST(n AS DECIMAL(38,0)) * sxy - sa * sb").as("cov"))
      .collect()(0).getDecimal(0)
    assert(cov(rows.head).compareTo(fx) === 0)
  }

  test("GramUpperSum: merge law, limb flush, and variable-dim resize") {
    import graft.functions.{GramCell, GramUpperSum}
    val agg = new GramUpperSum
    // magnitudes force |p| = 4e18 ≥ the 4e18 flush threshold, so the
    // hi/lo limb path and its canonical re-split are exercised; one
    // short row exercises the buffer resize
    val rows = Seq(Array(2000000000L, -2000000000L, 1000000000L),
      Array(-2000000000L, 2000000000L, 2000000000L),
      Array(1500000000L, 1500000000L))
    def fold(rs: Seq[Array[Long]]) = rs.foldLeft(agg.zero)(agg.reduce)
    val whole = agg.finish(fold(rows))
    val split = agg.finish(agg.merge(fold(rows.take(1)), fold(rows.drop(1))))
    assert(whole === split, "reduce-then-merge = one-pass fold")
    // reference: exact BigInt gram over the same rows
    def ref(i: Int, j: Int): (Long, BigInt) = {
      val used = rows.filter(r => r.length > math.max(i, j))
      (used.size.toLong,
        used.map(r => BigInt(r(i)) * BigInt(r(j))).sum)
    }
    whole.foreach { case GramCell(i, j, n, hi, lo) =>
      val (rn, rv) = ref(i, j)
      assert(n === rn, s"cell ($i,$j) count")
      assert(BigInt(hi) * BigInt("1000000000000000000") + lo === rv,
        s"cell ($i,$j) value")
      // canonical toward-zero split: lo strictly inside the base and
      // sign-consistent with the value
      assert(math.abs(lo) < 1000000000000000000L)
      if (rv != 0) assert((rv.signum >= 0) === (if (hi != 0) hi > 0 else lo >= 0))
    }
    assert(whole.map(c => (c.i, c.j)).toSet ===
      (for (i <- 0 until 3; j <- i until 3) yield (i, j)).toSet)
  }

  test("embedding_pca_power_iter: normalized PSD iteration keeps direction") {
    val rows = operators.EmbeddingAlgebraOps.queries(
      "embedding_pca_power_iter")(spark, sf()).collect()
    val d = Tables.embeddings(spark, sf())
      .select(size(col("embedding"))).first().getInt(0)
    assert(rows.length === d, "one component per dimension")
    val v1 = rows.map(_.getLong(1))
    val v2 = rows.map(_.getLong(2))
    // normalization: components bounded by 1e6 and the bound attained
    Seq(v1, v2).foreach { v =>
      assert(v.forall(x => math.abs(x) <= 1000000L))
      assert(v.exists(x => math.abs(x) === 1000000L), "max component hits ±1e6")
    }
    // G is PSD (gram of real vectors): v·Gv ≥ 0 ⇒ successive iterates
    // cannot anti-align
    val dot = v1.zip(v2).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    assert(dot >= 0, s"iterates anti-aligned: dot=$dot")
  }

  test("embedding_clip_calibration: rank-defined pick replay; clip mass bounds") {
    val rows = operators.EmbeddingAlgebraOps.queries(
      "embedding_clip_calibration")(spark, sf()).collect()
    val byDim = Tables.embeddings(spark, sf())
      .selectExpr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)) AS fxs")
      .collect().map(_.getSeq[Long](0).toArray)
      .flatMap(a => a.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .groupBy(_._1)
    assert(rows.length === byDim.size)
    rows.foreach { r =>
      val (pos, n, lo, hi, rng, clipped) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val vs = byDim(pos).map(_._2).sorted
      assert(n === vs.length.toLong)
      val loT = (n + 99) / 100; val hiT = (99 * n + 99) / 100
      assert(lo === vs((loT - 1).toInt), "rank-defined P1 pick")
      assert(hi === vs((hiT - 1).toInt), "rank-defined P99 pick")
      assert(rng === hi - lo && rng >= 0)
      val expClip = vs.count(_ < lo) + vs.count(_ > hi)
      assert(clipped === expClip.toLong, "exact clip mass")
      // rank construction caps the clipped mass on both sides
      assert(clipped <= (loT - 1) + (n - hiT), "clip mass <= rank slack")
    }
  }

  test("embedding_anisotropy: sum-vector identity equals the brute all-pairs fold") {
    val rows = operators.EmbeddingAlgebraOps.queries(
      "embedding_anisotropy")(spark, sf()).collect()
    assert(rows.length === 1)
    val r = rows.head
    val vs = Tables.embeddings(spark, sf())
      .selectExpr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT)) AS fxs")
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vs.length
    // brute all-pairs ordered dot sum (the thing the identity avoids)
    var brute = BigInt(0)
    for (i <- vs.indices; j <- vs.indices if i != j) {
      var dot = BigInt(0)
      val d = math.min(vs(i).length, vs(j).length)
      var k = 0
      while (k < d) { dot += BigInt(vs(i)(k)) * vs(j)(k); k += 1 }
      brute += dot
    }
    assert(r.getLong(0) === n.toLong)
    assert(BigInt(r.getString(1)) === brute, "identity == brute all-pairs")
    val den = BigInt(n) * (n - 1) * 1000000
    val expectMean =
      (if (brute >= 0) brute / den else -((-brute) / den)).toLong
    assert(r.getLong(2) === expectMean, "truncating mean-dot ratio")
    val sq = vs.map(v => v.map(x => BigInt(x) * x).sum).sum
    assert(r.getLong(3) === (sq / (BigInt(n) * 1000000)).toLong)
    // Cauchy-Schwarz: |mean pair dot| <= max pair |dot| <= max sq norm
    assert(BigInt(r.getLong(2)).abs <= BigInt(r.getLong(3)) * n,
      "mean dot bounded by norms")
  }

  test("embedding_participation_ratio: brute covariance replay; 1 <= PR <= d") {
    val Array(r) = operators.EmbeddingAlgebraOps.queries(
      "embedding_participation_ratio")(spark, sf()).collect()
    val vs = Tables.embeddings(spark, sf())
      .select(expr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vs.length.toLong
    val dDim = vs.map(_.length).max
    assert(r.getLong(0) === n && r.getLong(1) === dDim.toLong)
    // brute covariance numerators + the pinned truncate-by-n cells
    val sx = Array.tabulate(dDim)(i =>
      vs.map(v => if (i < v.length) BigInt(v(i)) else BigInt(0)).sum)
    def cell(i: Int, j: Int): (Long, BigInt) = {
      val both = vs.filter(v => i < v.length && j < v.length)
      (both.length.toLong,
        both.map(v => BigInt(v(i)) * v(j)).sum)
    }
    def truncDiv(a: BigInt, b: BigInt): BigInt =
      if (a < 0) -((-a) / b) else a / b
    var tr = BigInt(0)
    var fro2 = BigInt(0)
    for (i <- 0 until dDim; j <- i until dDim) {
      val (cn, sxy) = cell(i, j)
      val cov = BigInt(cn) * sxy - sx(i) * sx(j)
      val cbar = truncDiv(cov, BigInt(cn))
      if (i == j) tr += cbar
      fro2 += (if (i == j) BigInt(1) else BigInt(2)) * cbar * cbar
    }
    assert(fro2 > 0)
    assert(BigInt(r.getLong(2)) === tr * tr * 1000000 / fro2, "PR replay")
    // PR is the participation ratio of a PSD spectrum: 1 <= PR <= d
    assert(r.getLong(2) >= 1000000L - 1 &&
      r.getLong(2) <= dDim * 1000000L + 1, "PR in [1, d]")
  }
}
