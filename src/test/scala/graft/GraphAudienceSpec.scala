package graft

/** Semantic pins for GraphAudienceOps: reciprocity replay from the
  * collected edge list, τ-sweep monotonicity (higher τ ⇒ fewer pairs
  * and fewer affected docs), and Jaccard bounds with audience
  * accounting.
  */
class GraphAudienceSpec extends SparkSpec {
  private def run(key: String) =
    operators.GraphAudienceOps.queries(key)(spark, sf()).collect()

  test("knn_edge_reciprocity: replays from the edge list") {
    val Array(r) = run("knn_edge_reciprocity")
    val (n, recip, fp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val edges = operators.SemiStructuredOps.queries("knn_graph_topk")(
      spark, sf()).collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(n === edges.size)
    assert(recip === edges.count(e => edges.contains((e._2, e._1))))
    assert(fp === recip * 1000000L / n)
  }

  test("semantic_tau_sweep: monotone decreasing in tau") {
    val rows = run("semantic_tau_sweep").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).sameElements(Seq(80L, 85L, 90L, 95L)))
    val pairs = rows.map(_.getLong(1))
    val docs = rows.map(_.getLong(2))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      "pair yield shrinks as tau rises")
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getLong(2) <= 2 * r.getLong(1),
      "affected docs bounded by 2 x pairs"))
  }

  test("audience_overlap_matrix: Jaccard bounds and pair shape") {
    val rows = run("audience_overlap_matrix")
    assert(rows.nonEmpty && rows.length <= 10, "at most C(5,2) pairs")
    rows.foreach { r =>
      val (nBoth, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      assert(nBoth <= math.min(na, nb), "intersection bounded")
      assert(j >= 0 && j <= 1000000L)
      assert(j === nBoth * 1000000L / (na + nb - nBoth))
    }
  }

  test("rich_club_knn: monotone threshold sets; φ replays") {
    val rows = run("rich_club_knn")
    assert(rows.nonEmpty && rows.length <= 8)
    val ks = rows.map(_.getLong(0))
    assert(ks.sameElements(ks.sorted), "k grid ordered")
    val nodes = rows.map(_.getLong(1))
    val edges = rows.map(_.getLong(2))
    // raising the degree threshold can only shrink both sets
    assert(nodes.zip(nodes.tail).forall { case (a, b) => a >= b })
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val (n, e) = (r.getLong(1), r.getLong(2))
      assert(e <= n * (n - 1) / 2, "edge count bounded by C(n,2)")
      if (n >= 2) {
        assert(r.getLong(3) === 2 * e * 1000000L / (n * (n - 1)),
          "φ replay")
        assert(r.getLong(3) <= 1000000L)
      } else assert(r.isNullAt(3))
    }
    // k=1 population replay against an independent degree recount
    val und = operators.SemiStructuredOps.queries("knn_graph_topk")(
        spark, sf())
      .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = und.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    assert(rows.head.getLong(1) === deg.count(_._2 > ks.head))
    assert(rows.head.getLong(2) === und.count(p =>
      math.min(deg(p._1), deg(p._2)) > ks.head))
  }
}
