package graft

import org.apache.spark.sql.functions._

/** Structural guarantees of the learned-quantizer ANN path
  * (`ann_kmeans_ivf` is rows-only for the driver — cluster assignments
  * are model output, not SQL-expressible).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans IVF: 3 neighbors per query from ≤ nprobe cells, sorted") {
    val out = SparkEntry.queries("ann_kmeans_ivf")(spark, sf()).cache()
    val rows = out.select("q_id", "rank", "neighbor_id", "cell", "cosine")
      .as[(Long, Int, Long, Int, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty && byQuery.forall(_._2.length == 3))
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // similarity non-increasing with rank
      assert(sorted.sliding(2).forall(p => p.head._5 >= p.last._5 - 1e-9))
      // all candidates come from the probed cells (nprobe = 2)
      assert(sorted.map(_._4).distinct.length <= 2)
      // never returns the query itself
      assert(!sorted.exists(r => r._3 == r._1))
    }
  }

  test("kmeans IVF recall@3 vs exact top-k holds the fixture's ceiling") {
    // The fixture embeddings are directionally near-uniform: exact top-3
    // neighbors share the query's `label` only 2/30 times, and an IDEAL
    // spherical quantizer measures recall ceilings of ~0.70 (k=4,
    // nprobe=2) / ~0.47 (k=8, nprobe=2) on this corpus — no IVF recalls
    // 0.8+ here without probing most of the space. The operator runs
    // k=4/nprobe=2 (scores ~half the corpus) and must stay at that
    // structural ceiling; the planted-cluster test below proves ≥0.9 on
    // data that actually clusters.
    val exact = SparkEntry.queries("cosine_similarity_topk")(spark, sf())
      .filter(col("rank") <= 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@3 = $recall (${(ann intersect exact).size}/${exact.size})")
  }

  test("IVF on a clustered corpus: recall@3 ≥ 0.9 with nprobe=2 of k=8") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val data = (0 until 160).map { i =>
      (i.toLong, centers(i % 8).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    // exact cosine top-3 per query, computed independently of the engine
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val exact = (0 until 10).flatMap { q =>
      data.filter(_._1 != q)
        .map { case (id, v) => (id, cos(data(q)._2, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).map { case (id, _) => (q.toLong, id) }
    }.toSet
    val model = graft.functions.AnnIvf.fitQuantizer(spark, df, k = 8)
    val ann = graft.functions.AnnIvf
      .topk(spark, df, model, col("vec_id") < 10, topK = 3, nprobe = 2)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"clustered recall@3 = $recall")
  }

  test("partition-pruned serving layout returns exactly the in-memory answer") {
    val mem = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "rank", "neighbor_id", "cell")
      .as[(Long, Int, Long, Int)].collect().toSet
    val served = SparkEntry.queries("ann_ivf_partition_pruned")(spark, sf())
      .select("q_id", "rank", "neighbor_id", "cell")
      .as[(Long, Int, Long, Int)].collect().toSet
    assert(served === mem)
  }

  test("PQ: 8 small-int codes per vector; ADC self-score preserves most of the unit norm") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    graft.functions.VectorFunctions.register(spark)
    val ne = Tables.embeddings(spark, sf())
      .withColumn("__n", graft.functions.VectorFunctions.norm("embedding"))
      .select(expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) / __n AS FLOAT))"))
      .limit(100).collect().map(_.getSeq[Float](0).toArray)
    val cb = graft.functions.AnnPq.fitCodebooks(ne, m = 8, k = 16)
    assert(cb.length === 8 && cb.forall(_.length === 16))
    val selfScores = ne.map { v =>
      val arr = new GenericArrayData(v)
      val codes = graft.functions.AnnPq.encodeVec(arr, cb)
      assert(codes.numElements() === 8) // 64 floats (256 B) → 8 codes
      (0 until 8).foreach(j =>
        assert(codes.getInt(j) >= 0 && codes.getInt(j) < 16))
      graft.functions.AnnPq.adcDot(arr, codes, cb) / 1e15
    }
    // exact self-dot is 1.0 (unit vectors); the quantized reconstruction
    // must preserve well over half of it on average or the codebook
    // carries no signal
    val mean = selfScores.sum / selfScores.length
    assert(mean > 0.5, s"mean ADC self-score $mean — codebook too lossy")
    // determinism: refit from the same sample gives identical codebooks
    val cb2 = graft.functions.AnnPq.fitCodebooks(ne, m = 8, k = 16)
    assert(cb.flatten.flatten.toSeq === cb2.flatten.flatten.toSeq)
  }

  test("PQ codebook fit input is min(|corpus|, PQ_FIT_SAMPLE) — a fixed count, not a rate") {
    // Fixture side: the cap does not bind (500 < 8192) and the fit sees
    // the WHOLE corpus, deterministically md5-ordered.
    val n001 = Tables.embeddings(spark, sf()).count()
    val s001 = graft.operators.SemiStructuredOps.pqFitSample(spark, sf())
    assert(s001.length ==
      math.min(n001, graft.operators.SemiStructuredOps.PQ_FIT_SAMPLE.toLong))
    // Scale side: a corpus LARGER than the cap yields exactly
    // PQ_FIT_SAMPLE rows — the driver collect is constant in corpus
    // size (the r12 verdict's 100 TB flag: the old xxhash64%2 filter
    // collected a 50% *fraction*).
    val dir = tmpDir("graft_pqfit")
    val big = spark.range(0, graft.operators.SemiStructuredOps.PQ_FIT_SAMPLE * 2L)
      .selectExpr("id AS vec_id",
        // unit-scale components (the embeddings fixture's envelope):
        // fixed_dot's 1e15 fixed point overflows int64 past |x| ≈ 3
        "transform(sequence(1, 8), i -> CAST((pmod(id * i, 97) + 1) / 98.0 AS FLOAT)) AS embedding",
        "CAST(id % 4 AS INT) AS label")
    big.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val sBig = graft.operators.SemiStructuredOps.pqFitSample(spark, dir)
    assert(sBig.length == graft.operators.SemiStructuredOps.PQ_FIT_SAMPLE)
    // determinism of the capped sample under a different partitioning
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val sBig2 = graft.operators.SemiStructuredOps.pqFitSample(spark, dir)
      assert(sBig.map(_.toSeq).toSeq == sBig2.map(_.toSeq).toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("ivf_cell_balance: cells partition the corpus; imbalance >= 1") {
    val rows = SparkEntry.queries("ivf_cell_balance")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum === total, "cells partition the corpus")
    val mx = rows.map(_.getLong(1)).max
    val n = rows.length.toLong
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) * 1000000L / total, "share replay")
      assert(r.getLong(3) === mx * n * 1000000L / total, "imbalance replay")
    }
    assert(rows.head.getLong(3) >= 1000000L, "max/mean >= 1 by definition")
  }

  test("knn graph: per-node top-3 within the node's own cell, exact on cell-mates") {
    val edges = SparkEntry.queries("knn_graph_topk")(spark, sf())
      .as[(Long, Int, Long, Double)].collect()
    val layout = spark.read.parquet(
        operators.SemiStructuredOps.ivfLayout(spark, sf()))
      .select(col("vec_id"), col("cell").cast("int"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .as[(Long, Int, Seq[Double])].collect()
    val cellOf = layout.map(v => v._1 -> v._2).toMap
    val vec = layout.map(v => v._1 -> v._3.toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (s, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      s / math.sqrt(na * nb)
    }
    val byNode = edges.groupBy(_._1)
    // every non-singleton cell member has edges; ranks contiguous
    val cellSizes = layout.groupBy(_._2).map { case (c, m) => c -> m.length }
    layout.foreach { case (id, cell, _) =>
      val deg = byNode.get(id).map(_.length).getOrElse(0)
      assert(deg === math.min(3, cellSizes(cell) - 1), s"node $id degree")
    }
    byNode.foreach { case (srcId, es) =>
      assert(es.map(_._2).sorted.toSeq === (1 to es.length))
      es.foreach { case (src, _, dst, _) =>
        assert(cellOf(dst) === cellOf(src), "edges never cross cells")
        assert(dst !== src)
      }
      // the ranked list IS the exact within-cell top-k (driver brute force;
      // double-arithmetic cosine agrees with the fixed-point ranking far
      // beyond the fixture's similarity gaps)
      val mates = layout.filter(v => v._2 == cellOf(srcId) && v._1 != srcId)
      val exact = mates.map(m => (m._1, cos(vec(srcId), vec(m._1))))
        .sortBy { case (id2, c) => (-c, id2) }.take(es.length).map(_._1)
      assert(es.sortBy(_._2).map(_._3).toSeq === exact.toSeq,
        s"node $srcId top-${es.length} mismatch vs brute force")
    }
  }

  test("embedding outlier filter: flag ⇔ exact margin rule; bulk of every cell kept") {
    val rows = SparkEntry.queries("embedding_outlier_filter")(spark, sf())
      .as[(Long, Int, Long, Boolean)].collect()
    assert(rows.length === Tables.embeddings(spark, sf()).count())
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (cell, m) =>
      val sumFp = m.map(v => BigInt(v._3)).sum
      val n = m.length
      m.foreach { case (id, _, d2, flagged) =>
        assert(flagged === (BigInt(d2) * n * 100 > sumFp * 105),
          s"vec $id in cell $cell: flag disagrees with the margin rule")
      }
      assert(m.count(_._4) < n / 2, s"cell $cell: filter must keep the bulk")
    }
    assert(rows.exists(_._4), "the 5% margin flags a tail on the fixture")
  }

  test("outlier dist2 sidecar: persisted bits == fresh in-engine derivation == driver float replay") {
    // The oracle consumes the persisted `.dist2` BIGINTs, so the float
    // derivation is validated HERE instead: (a) a fresh run of the
    // in-engine expression must reproduce the persisted bits exactly
    // (determinism of the codegen'd FLOAT/fixed_dot chain), and (b) an
    // independent plain-Scala IEEE replay must agree bit-for-bit
    // (correctness of that chain — two implementations, one spec).
    val rows = SparkEntry.queries("embedding_outlier_filter")(spark, sf())
      .as[(Long, Int, Long, Boolean)].collect()
    val lp = operators.SemiStructuredOps.ivfLayout(spark, sf())
    val fresh = operators.SemiStructuredOps.outlierDistances(spark, lp)
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, cell, d2, _) =>
      assert(fresh(id) === ((cell, d2)),
        s"vec $id: persisted dist2 bits diverge from a fresh in-engine derivation")
    }
    val cents = spark.read.parquet(s"$lp.centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = spark.read.parquet(lp)
      .select(col("vec_id"), col("embedding"), col("cell").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def fdot(a: Array[Double], b: Array[Double]): Long =
      a.indices.foldLeft(0L)((acc, i) =>
        acc + math.floor(a(i) * b(i) * 1e15).toLong)
    val replay = vecs.map { case (id, v, cell) =>
      val vd = v.map(_.toDouble)
      val norm = math.sqrt(fdot(vd, vd).toDouble / 1e15)
      val c = cents(cell)
      val diff = v.indices.map(i => (vd(i) / norm - c(i)).toFloat.toDouble).toArray
      id -> fdot(diff, diff)
    }.toMap
    rows.foreach { case (id, _, d2, _) =>
      assert(replay(id) === d2,
        s"vec $id: persisted dist2 bits diverge from the driver-side IEEE replay")
    }
  }

  test("label propagation: distributed join-loop bit-identical to driver iterate; seeds clamped") {
    def runLp() = SparkEntry.queries("label_propagation_knn")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    val driver = runLp()
    spark.conf.set("graft.labelprop.smallThreshold", "0")
    val dist = try runLp()
      finally spark.conf.unset("graft.labelprop.smallThreshold")
    assert(driver.toSeq === dist.toSeq,
      "the two routing paths must agree bit-for-bit")
    val seedTruth = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 5 === 0)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labelVocab = seedTruth.values.toSet
    driver.foreach { case (id, isSeed, pred) =>
      assert(isSeed === seedTruth.contains(id))
      if (isSeed) assert(pred === Some(seedTruth(id)), s"seed $id must be clamped")
      pred.foreach(p => assert(labelVocab.contains(p),
        s"node $id predicted a label outside the seed vocabulary"))
    }
    val nonSeedLabeled = driver.count { case (_, s2, p) => !s2 && p.isDefined }
    assert(nonSeedLabeled > 0, "propagation must label some non-seed nodes")
  }

  test("embedding_dim_stats covers every dimension with exact moments") {
    val rows = SparkEntry.queries("embedding_dim_stats")(spark, sf()).collect()
    val emb = Tables.embeddings(spark, sf()).select("embedding").collect()
      .map(_.getSeq[Float](0))
    assert(rows.length === emb.map(_.length).max)
    val n = emb.length.toLong
    rows.foreach { r =>
      assert(r.getLong(1) === n, "every dimension sees the whole corpus")
      assert(r.getDouble(3) >= 0.0, "variance is non-negative")
      assert(r.getLong(4) <= r.getLong(5), "min <= max")
    }
    // driver replay of dimension 0's moments (same toward-zero leaf
    // fixed-pointing the operator declares)
    val fx0 = emb.map(v => (v(0).toDouble * 1e6).toLong)
    val r0 = rows.find(_.getInt(0) == 0).get
    assert(r0.getLong(4) === fx0.min && r0.getLong(5) === fx0.max)
    assert(math.abs(r0.getDouble(2) - fx0.sum.toDouble / n / 1e6) < 1e-5)
  }

  test("kcore_graph_prune reaches the true 2-core within its unroll budget") {
    val rows = SparkEntry.queries("kcore_graph_prune")(spark, sf()).collect()
    val knn = SparkEntry.queries("knn_graph_topk")(spark, sf())
      .select("src", "dst").as[(Long, Long)].collect()
    val und = (knn ++ knn.map(p => (p._2, p._1))).distinct
    val deg0 = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    // driver peel to the TRUE fixpoint (unbounded rounds)
    var alive = und.map(_._1).toSet
    var iters = 0
    var changed = true
    while (changed) {
      val next = und.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).collect { case (n, es) if es.length >= 2 => n }.toSet
      changed = next != alive
      alive = next
      iters += 1
    }
    assert(iters - 1 <= 4,
      "the fixture graph must reach its 2-core within the 4-round unroll")
    rows.foreach { r =>
      assert(r.getLong(1) === deg0.getOrElse(r.getLong(0), 0L),
        s"deg0 for node ${r.getLong(0)}")
      assert(r.getBoolean(2) === alive(r.getLong(0)),
        s"core membership for node ${r.getLong(0)}")
    }
    assert(rows.count(_.getBoolean(2)) > 0, "fixture keeps a non-empty core")
  }

  // r18: the collected driver peel (measured-small) and the distributed
  // join loop must agree bit-for-bit — threshold 0 forces the loop.
  test("kcore collected peel equals the distributed loop") {
    val small = SparkEntry.queries("kcore_graph_prune")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    spark.conf.set("graft.kcore.smallThreshold", "0")
    try {
      val dist = SparkEntry.queries("kcore_graph_prune")(spark, sf())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(small.toSeq === dist.toSeq)
    } finally spark.conf.unset("graft.kcore.smallThreshold")
  }

  test("ann_recall_eval agrees with the declared exact/IVF top-3 queries") {
    val rows = SparkEntry.queries("ann_recall_eval")(spark, sf()).collect()
    assert(rows.nonEmpty)
    // independent re-derivation from the two declared rankings
    val exact = SparkEntry.queries("cosine_similarity_topk")(spark, sf())
      .filter(col("rank") <= 3).select("q_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
    val ivf = SparkEntry.queries("ann_ivf_topk")(spark, sf())
      .select("q_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
    rows.foreach { r =>
      val (q, nExact, nHit, recFp) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val ex = exact(q).map(_._2).toSet
      assert(nExact === ex.size.toLong)
      assert(nHit ===
        ivf.get(q).fold(0L)(_.map(_._2).toSet.intersect(ex).size.toLong))
      assert(recFp === nHit * 1000000L / nExact)
      assert(recFp >= 0L && recFp <= 1000000L)
    }
  }

  test("kmeans IVF is deterministic across invocations (fixed seed)") {
    val a = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val b = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }

  test("ann_recall_at_k_curve: k=3 point equals the micro-average of ann_recall_eval") {
    val curve = SparkEntry.queries("ann_recall_at_k_curve")(spark, sf())
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(curve.keySet === Set(1, 3, 5))
    curve.values.foreach { case (nExact, nHit, recall) =>
      assert(nHit <= nExact)
      assert(recall === nHit * 1000000L / nExact)
      assert(recall >= 0 && recall <= 1000000L)
    }
    // cross-pin: the k=3 micro-average must replay ann_recall_eval's
    // per-query counts exactly
    val per = SparkEntry.queries("ann_recall_eval")(spark, sf()).collect()
    val (se, sh) = (per.map(_.getLong(1)).sum, per.map(_.getLong(2)).sum)
    assert(curve(3)._1 === se, "n_exact at k=3 matches")
    assert(curve(3)._2 === sh, "n_hit at k=3 matches")
  }

  test("pq_code_utilization: accounting + the uniform-entropy ceiling") {
    val rows = SparkEntry.queries("pq_code_utilization")(spark, sf())
      .collect()
    assert(rows.nonEmpty, "one row per subspace")
    val nVecs = Tables.embeddings(spark, sf()).count()
    rows.foreach { r =>
      val (j, n, k, used, dead, h) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n === nVecs, s"subspace $j covers the corpus")
      assert(used >= 1 && used <= k, s"subspace $j used $used of $k")
      assert(dead === k - used)
      // Shannon entropy of a distribution over `used` outcomes lives
      // in [0, ln(used)]; 1e9 fixed point, +used for per-term floors
      assert(h >= 0)
      assert(h <= (math.log(used.toDouble) * 1e9).toLong + used,
        s"subspace $j entropy $h above ln($used)")
    }
  }

  test("matryoshka_dim_recall: identity anchor; full-dim replay") {
    val rows = operators.TrainingDataOps
      .queries("matryoshka_dim_recall")(spark, sf()).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L, 64L))
    rows.foreach { r =>
      val (n, hit, rec) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 30L, "10 queries x top-3 per dim level")
      assert(hit <= n)
      assert(rec === hit * 1000000L / n, "recall replay")
    }
    val full = rows.find(_.getLong(0) == 64L).get
    assert(full.getLong(2) === 30L && full.getLong(3) === 1000000L,
      "d'=64 is the truth itself — recall exactly 1")
    // the truncated levels measure against the SAME truth set, so a
    // recall above 1 is structurally impossible
    assert(rows.forall(_.getLong(3) <= 1000000L))
  }

  test("ivf_nprobe_recall_curve: monotone in nprobe; all-cells anchor = 1") {
    val rows = SparkEntry.queries("ivf_nprobe_recall_curve")(spark, sf())
      .collect()
    assert(rows.length === 4, "nprobe grid 1..4")
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    val nQ = Tables.embeddings(spark, sf())
      .filter(org.apache.spark.sql.functions.col("vec_id") < 10).count()
    rows.foreach { r =>
      assert(r.getLong(1) <= 3L * nQ, "at most top-3 per query returned")
      assert(r.getLong(2) <= r.getLong(1), "hits bounded by returned")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / (3L * nQ),
        "recall replay against the exact-truth denominator")
    }
    // widening the probe set can only add candidates: recall and the
    // returned count are monotone non-decreasing in nprobe
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(3), "recall monotone in nprobe")
      assert(a.getLong(1) <= b.getLong(1), "returned monotone in nprobe")
    }
    // nprobe = k probes every cell: the probe IS the exact search
    val all = rows.last
    assert(all.getLong(1) === 3L * nQ && all.getLong(2) === 3L * nQ
      && all.getLong(3) === 1000000L, "all-cells probe recalls exactly 1")
  }

  test("ivf_probe_cost_curve: layout replay; monotone; full probe = 1") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("ivf_probe_cost_curve")(spark, sf())
      .collect()
    assert(rows.length === 4)
    val layout = operators.SemiStructuredOps.ivfLayout(spark, sf())
    val stored = spark.read.parquet(layout)
      .selectExpr("vec_id", "CAST(cell AS INT)",
        "transform(embedding, x -> CAST(x AS DOUBLE))").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val cents = spark.read.parquet(s"$layout.centroids")
      .selectExpr("CAST(cand_cell AS INT)", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val cellSz = stored.groupBy(_._2).map { case (c, g) =>
      c -> g.length.toLong }
    val nCorpus = stored.length.toLong
    // replay the probe ranking exactly as the query defines it
    val perQ = stored.filter(_._1 < 10).map { case (qid, qCell, emb) =>
      val norm = math.sqrt(emb.map(x =>
        math.floor(x * x * 1e15)).sum / 1e15)
      val ranked = cents.map { case (c, cen) =>
        val d2 = emb.zip(cen).map { case (x, y) =>
          val dd = x / norm - y; dd * dd }.sum
        (d2, c)
      }.sortBy(identity).map(_._2)
      (qid, qCell, ranked)
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      val np = i + 1
      assert(r.getInt(0) === np)
      val scanned = perQ.map { case (_, qCell, ranked) =>
        val probed = ranked.take(np)
        probed.map(cellSz).sum - (if (probed.contains(qCell)) 1L else 0L)
      }.sum
      assert(r.getLong(1) === perQ.length.toLong)
      assert(r.getLong(2) === scanned, s"scanned census at np=$np")
      assert(r.getLong(3) === (BigInt(scanned) * 1000000
        / (perQ.length.toLong * (nCorpus - 1))).toLong, "fraction replay")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) <= b.getLong(2), "scan cost monotone in nprobe")
    }
    assert(rows.last.getLong(3) === 1000000L,
      "probing every cell scans the whole corpus minus self")
  }
  test("ann_pareto_frontier: dominance + composition replay of the two curves") {
    val rec = operators.SemiStructuredOps.queries("ivf_nprobe_recall_curve")(
      spark, sf()).collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val cost = operators.SemiStructuredOps.queries("ivf_probe_cost_curve")(
      spark, sf()).collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val rows = operators.SemiStructuredOps.queries("ann_pareto_frontier")(
      spark, sf()).collect()
    assert(rows.length === rec.size)
    val pts = rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val np = r.getInt(0)
      assert(r.getLong(1) === rec(np) && r.getLong(2) === cost(np),
        s"np=$np composes the two curves verbatim")
      if (np > 1 && rec.contains(np - 1))
        assert(r.getLong(3) === rec(np) - rec(np - 1), "marginal recall")
      else assert(r.isNullAt(3))
      val expectEff = !pts.exists(q => q._2 >= rec(np) && q._3 < cost(np))
      assert(r.getBoolean(4) === expectEff, s"np=$np dominance flag")
    }
    assert(rows.exists(_.getBoolean(4)), "frontier is nonempty")
  }

  test("incremental IVF maintenance locality: a 1-vector batch touches only its cell") {
    // the r15 CDC law (VERDICT r14 ask #2): insert ONE vector through
    // the maintenance fold and pin that (a) every pre-existing serving
    // row is carried bit-identically, (b) exactly one row was added, in
    // the cell the frozen quantizer assigns, and (c) the additively-
    // maintained cell stats change at that cell ALONE.
    val d = sf()
    val baseP = operators.IncrementalIvfOps.baseServing(spark, d)
    val base = spark.read.parquet(baseP)
      .select(col("vec_id"), col("cell").cast("int").as("cell"),
        col("dist2_fp"), col("codes"))
    // one insert: copy the smallest vec_id under a fresh key
    val src = Tables.embeddings(spark, d)
      .orderBy("vec_id").limit(1)
      .select((col("vec_id") + 2000000000L).as("vec_id"), col("embedding"))
    val fresh = operators.IncrementalIvfOps.encodeOnFrozen(spark, d, src)
    val freshRow = fresh.collect() match {
      case Array(r) => r
      case other => fail(s"expected 1 encoded row, got ${other.length}")
    }
    val maintained = operators.IncrementalIvfOps.maintainServing(
      base, spark.emptyDataFrame.sparkSession
        .createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType)))),
      fresh)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getSeq[Any](3).mkString(","))
    val baseSet = base.collect().map(key).toSet
    val maintSet = maintained.collect().map(key).toSet
    assert(maintSet.size === baseSet.size + 1, "exactly one row added")
    assert(baseSet.subsetOf(maintSet), "every carried row bit-identical")
    assert((maintSet -- baseSet).head._1 === freshRow.getLong(0))
    // cell stats: one cell +1, every other cell untouched
    val baseStats = spark.read.parquet(s"$baseP.cellstats")
    val delta = fresh.groupBy("cell")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("dn"))
    val newStats = operators.IncrementalIvfOps
      .maintainCellStats(baseStats, delta)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val oldStats = baseStats.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val touched = freshRow.getInt(1)
    assert(newStats(touched) === oldStats.getOrElse(touched, 0L) + 1)
    (newStats.keySet ++ oldStats.keySet).filterNot(_ == touched)
      .foreach(c => assert(newStats.get(c) === oldStats.get(c),
        s"cell $c stats must not move for a foreign-cell batch"))
  }
}
