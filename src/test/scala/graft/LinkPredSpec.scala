package graft

/** Semantic pins for LinkPredOps: brute-force replay of both scores
  * from the collected edge list at sf0.001, the non-adjacency
  * contract (predicted pairs are NOT edges), the AA/CN consistency
  * law, and the assortativity range.
  */
class LinkPredSpec extends SparkSpec {
  private def run(key: String) =
    operators.LinkPredOps.queries(key)(spark, sf()).collect()

  /** Undirected adjacency + degrees from the declared kNN edges. */
  private lazy val graph: (Set[(Long, Long)], Map[Long, Long]) = {
    val e = operators.SemiStructuredOps.queries("knn_graph_topk")(
      spark, sf()).collect().map(r => (r.getLong(0), r.getLong(2)))
    val und = (e ++ e.map(p => (p._2, p._1))).toSet
    val deg = und.groupBy(_._1).map { case (n, s) => n -> s.size.toLong }
    (und, deg)
  }

  /** Brute-force capped two-hop candidate scores. */
  private lazy val bruteScores: Map[(Long, Long), (Long, Long)] = {
    val (und, deg) = graph
    val nbrs = und.groupBy(_._1).map { case (n, s) => n -> s.map(_._2) }
    val cands = scala.collection.mutable.HashMap[(Long, Long), (Long, Long)]()
    for {
      (z, dz) <- deg if dz <= operators.LinkPredOps.MaxHubDegree
      a <- nbrs(z); b <- nbrs(z) if a < b
      if !und.contains((a, b))
    } {
      val w = math.floor(1e9 / math.log(dz.toDouble)).toLong
      val (c, s) = cands.getOrElse((a, b), (0L, 0L))
      cands((a, b)) = (c + 1, s + w)
    }
    cands.toMap
  }

  test("common_neighbors_linkpred: top-20 replays brute force; non-adjacent") {
    val rows = run("common_neighbors_linkpred")
    assert(rows.nonEmpty && rows.length <= 20)
    val (und, _) = graph
    val scores = rows.map(_.getLong(2))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
    rows.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(!und.contains((a, b)), "predicted pair must not be an edge")
      assert(n === bruteScores((a, b))._1, s"CN($a,$b) replay")
    }
    // the 20th score is a true top-20 cut: no excluded pair beats it
    val cut = scores.last
    val returned = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    bruteScores.foreach { case (p, (c, _)) =>
      if (!returned(p)) assert(c <= cut, s"missed pair $p with score $c > $cut")
    }
  }

  test("adamic_adar_linkpred: weights replay; consistent with CN counts") {
    val rows = run("adamic_adar_linkpred")
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b, n, aa) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (bc, bs) = bruteScores((a, b))
      assert(n === bc && aa === bs, s"AA($a,$b) replay")
      // each intermediate has deg in [2, cap] so its weight lies in
      // [1e9/ln(cap), 1e9/ln(2)]
      val wMin = math.floor(1e9 /
        math.log(operators.LinkPredOps.MaxHubDegree.toDouble)).toLong
      val wMax = math.floor(1e9 / math.log(2.0)).toLong
      assert(aa >= n * wMin && aa <= n * wMax)
    }
  }

  test("jaccard_linkpred: replay from brute CN + degrees; bounded by 1e6") {
    val rows = run("jaccard_linkpred")
    assert(rows.nonEmpty && rows.length <= 20)
    val (_, deg) = graph
    rows.foreach { r =>
      val (a, b, n, da, db, j) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n === bruteScores((a, b))._1, s"CN($a,$b) replay")
      assert(da === deg(a) && db === deg(b))
      assert(n <= math.min(da, db), "intersection bounded by degrees")
      assert(j === n * 1000000L / (da + db - n), "fixed-point replay")
      assert(j >= 0 && j <= 1000000L)
    }
    val scores = rows.map(_.getLong(5))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
  }

  test("preferential_attachment_linkpred: degree-product replay over the candidate set") {
    val rows = run("preferential_attachment_linkpred")
    assert(rows.nonEmpty && rows.length <= 20)
    val (_, deg) = graph
    rows.foreach { r =>
      val (a, b, da, db, pa) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bruteScores.contains((a, b)), "pair from the brute candidate set")
      assert(da === deg(a) && db === deg(b))
      assert(pa === da * db, "PA is the degree product")
    }
    val scores = rows.map(_.getLong(4))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
  }

  test("resource_allocation_linkpred: pure-integer replay; hub discount bounds") {
    val (und, deg) = graph
    val nbrs = und.groupBy(_._1).map { case (n, s) => n -> s.map(_._2) }
    val brute = scala.collection.mutable.HashMap[(Long, Long), (Long, Long)]()
    for {
      (z, dz) <- deg if dz <= operators.LinkPredOps.MaxHubDegree
      a <- nbrs(z); b <- nbrs(z) if a < b
      if !und.contains((a, b))
    } {
      val (c, s) = brute.getOrElse((a, b), (0L, 0L))
      brute((a, b)) = (c + 1, s + 1000000000L / dz)
    }
    val rows = run("resource_allocation_linkpred")
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (a, b, n, ra) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (bc, bs) = brute((a, b))
      assert(n === bc && ra === bs, s"RA($a,$b) replay")
      // intermediates have deg in [2, cap]: weight in [1e9/cap, 5e8]
      assert(ra >= n * (1000000000L / operators.LinkPredOps.MaxHubDegree)
        && ra <= n * 500000000L)
    }
  }

  test("local_clustering_coefficient: triangles replay brute-force") {
    val rows = run("local_clustering_coefficient")
    assert(rows.nonEmpty)
    val (und, deg) = graph
    val nbrs = und.groupBy(_._1).map { case (n, s) => n -> s.map(_._2) }
    rows.foreach { r =>
      val (v, dg, tri, cc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dg === deg(v) && dg >= 2 &&
        dg <= operators.LinkPredOps.MaxHubDegree)
      val n = nbrs(v).toSeq.sorted
      val bt = (for {
        i <- n.indices; j <- (i + 1) until n.length
        if und.contains((n(i), n(j)))
      } yield 1).size.toLong
      assert(tri === bt, s"triangles at $v")
      assert(cc === 2 * tri * 1000000L / (dg * (dg - 1)))
      assert(cc >= 0 && cc <= 1000000L)
    }
    // every capped node with deg >= 2 appears exactly once
    val expected = deg.filter { case (_, dg) =>
      dg >= 2 && dg <= operators.LinkPredOps.MaxHubDegree }.keySet
    assert(rows.map(_.getLong(0)).toSet === expected)
  }

  test("degree_assortativity: one row, r in [-1, 1], edge count matches") {
    val Array(r) = run("degree_assortativity")
    val (und, _) = graph
    assert(r.getLong(0) === und.size, "directed edge count")
    if (!r.isNullAt(1)) {
      val v = r.getDouble(1)
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
    }
  }

  test("knn_hubness_skew: in-degree accounting + skew leaf replay") {
    val Array(r) = run("knn_hubness_skew")
    val edges = operators.SemiStructuredOps.queries("knn_graph_topk")(
      spark, sf()).collect().map(x => (x.getLong(0), x.getLong(2)))
    val nodes = Tables.embeddings(spark, sf())
      .select("vec_id").collect().map(_.getLong(0))
    val indeg = edges.groupBy(_._2).map { case (n, g) => n -> g.length.toLong }
    val ks = nodes.map(n => indeg.getOrElse(n, 0L))
    assert(r.getLong(0) === nodes.length.toLong, "node census")
    assert(r.getLong(1) === edges.length.toLong, "Σ in-degree = |edges|")
    assert(r.getLong(2) === ks.max, "max in-degree")
    assert(r.getLong(3) === ks.count(_ == 0L).toLong, "antihub count")
    val n = ks.length.toLong
    val s1 = ks.map(BigInt(_)).sum
    val s2 = ks.map(k => BigInt(k) * k).sum
    val s3 = ks.map(k => BigInt(k) * k * k).sum
    assert(n * s2 - s1 * s1 > 0, "fixture in-degrees vary")
    val mu = s1.toDouble / n
    val r2 = s2.toDouble / n
    val r3 = s3.toDouble / n
    val m2 = r2 - mu * mu
    val m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
    val skew = math.floor(m3 / math.pow(m2, 1.5) * 1e6).toLong
    assert(r.getLong(4) === skew, "skew leaf replay")
  }

  test("graph_modularity_labels: degree accounting + Q bounds + replay") {
    val rows = run("graph_modularity_labels")
    val m = operators.SemiStructuredOps.queries("knn_graph_topk")(
      spark, sf()).count()
    assert(rows.map(_.getLong(2)).sum === m, "out-degrees partition edges")
    assert(rows.map(_.getLong(3)).sum === m, "in-degrees partition edges")
    rows.foreach { r =>
      val (eIn, dOut, dIn, q) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(eIn <= dOut && eIn <= dIn,
        "intra-label edges bounded by both degree sums")
      val expect = eIn * 1000000000L / m -
        (BigInt(dOut) * dIn * 1000000000L / (BigInt(m) * m)).toLong
      assert(q === expect, s"label ${r.getLong(0)}: Q contribution replay")
    }
    val qTot = rows.map(_.getLong(4)).sum
    assert(qTot >= -1000000000L && qTot <= 1000000000L, "Q in [-1, 1]")
  }

  test("katz_index_bounded: brute-force walk-count replay of the top-20") {
    val edges = operators.SemiStructuredOps.queries("knn_graph_topk")(
      spark, sf()).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] =
      edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val katz = scala.collection.mutable.Map[(Long, Long), Long]()
    edges.foreach { case (a, b) => // walks of length 1..3, revisits count
      katz((a, b)) = katz.getOrElse((a, b), 0L) + 500000L }
    for ((a, ms) <- adj; m <- ms; b <- adj.getOrElse(m, Seq.empty))
      katz((a, b)) = katz.getOrElse((a, b), 0L) + 250000L
    for ((a, ms) <- adj; m <- ms; m2 <- adj.getOrElse(m, Seq.empty);
         b <- adj.getOrElse(m2, Seq.empty))
      katz((a, b)) = katz.getOrElse((a, b), 0L) + 125000L
    val expect = katz.toSeq.filter { case ((a, b), _) => a != b }
      .sortBy { case ((a, b), k) => (-k, a, b) }.take(20)
    val rows = run("katz_index_bounded")
    assert(rows.length === expect.length)
    rows.zip(expect).foreach { case (r, ((a, b), k)) =>
      assert((r.getLong(0), r.getLong(1)) === ((a, b)), "pair order")
      assert(r.getLong(5) === k, s"katz($a,$b) replay")
      // score decomposition is consistent
      assert(r.getLong(5) === 500000L * r.getLong(2)
        + 250000L * r.getLong(3) + 125000L * r.getLong(4))
    }
    // out-degree <= 3 bounds every walk count: w2 <= 9, w3 <= 27 per pair
    rows.foreach { r =>
      assert(r.getLong(2) <= 1 && r.getLong(3) <= 9 && r.getLong(4) <= 27)
    }
  }

  test("average_neighbor_degree: n_edges(k) = k·n_nodes(k); knn bounded by max degree") {
    val rows = operators.LinkPredOps
      .queries("average_neighbor_degree")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val maxK = rows.map(_.getLong(0)).max
    rows.foreach { r =>
      val (k, nNodes, nEdges, knn) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nEdges === k * nNodes,
        "every degree-k node contributes exactly k directed edges")
      assert(knn >= 1000000L && knn <= maxK * 1000000L,
        "mean neighbor degree lives in [1, max degree]")
    }
  }

  test("triangle_participation_rate: corner count bounded by 3·triangles and node count") {
    val Array(r) = operators.LinkPredOps
      .queries("triangle_participation_rate")(spark, sf()).collect()
    val (n, tri, corners, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(corners <= n && corners <= 3 * tri,
      "each triangle contributes at most 3 distinct corners")
    assert((tri > 0) === (corners >= 3), "triangles imply >= 3 corners")
    assert(rate === corners * 1000000L / n, "rate is the exact ratio")
  }

  test("knn_label_consistency: classes partition the node set; global row folds them") {
    val rows = operators.LinkPredOps
      .queries("knn_label_consistency")(spark, sf()).collect()
    val global = rows.filter(_.getLong(0) == -1L)
    assert(global.length === 1)
    val per = rows.filter(_.getLong(0) >= 0L)
    assert(per.map(_.getLong(1)).sum === global.head.getLong(1),
      "per-class node counts partition the voted node set")
    assert(per.map(_.getLong(2)).sum === global.head.getLong(2),
      "per-class consistent counts fold into the global row")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "consistent <= nodes")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
  }
}
