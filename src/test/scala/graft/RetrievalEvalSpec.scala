package graft

/** Semantic pins for RetrievalEvalOps: metric range laws, the
  * cross-operator consistency contracts (a perfect-recall query must
  * score NDCG = 1 and RR = hit@1; MAP hits can never exceed |gt|),
  * and the discount-monotonicity a hash match can't name.
  */
class RetrievalEvalSpec extends SparkSpec {
  private def run(key: String) =
    operators.RetrievalEvalOps.queries(key)(spark, sf()).collect()

  test("mrr_eval_ann: one row per query; rr replays from the rank") {
    val rows = run("mrr_eval_ann")
    assert(rows.nonEmpty && rows.length <= 10)
    val qids = rows.map(_.getLong(0))
    assert(qids.distinct.length === qids.length)
    assert(qids.sorted.sameElements(qids), "ordered by q_id")
    rows.foreach { r =>
      val rr = r.getLong(3)
      if (r.isNullAt(2)) assert(rr === 0L, "cell miss scores 0")
      else {
        val rank = r.getInt(2)
        assert(rank >= 1 && rank <= 10)
        assert(rr === 1000000L / rank, "reciprocal rank is exact 1e6/r")
      }
    }
  }

  test("ndcg_at_k_ann: ndcg in [0,1e6]; idcg is the ideal upper bound") {
    val rows = run("ndcg_at_k_ann")
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (nRun, dcg, idcg, ndcg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nRun >= 1 && nRun <= 10)
      assert(dcg >= 0 && dcg <= idcg, "DCG cannot exceed the ideal")
      assert(ndcg >= 0 && ndcg <= 1000000L)
      // grades are always {3,2,1} (exact top-3 exists for every query),
      // so idcg is the fixed discounted sum of 3,2,1 at positions 1,2,3
      def w(p: Int) = math.floor(1e9 / (math.log(p + 1) / math.log(2))).toLong
      assert(idcg === 3 * w(1) + 2 * w(2) + 1 * w(3))
    }
  }

  test("map_at_k_ann: hits bounded by |gt|; AP in [0,1e9]") {
    val rows = run("map_at_k_ann")
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (nRun, nHits, ap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nRun >= 1 && nRun <= 10)
      assert(nHits >= 0 && nHits <= 3, "gt set is the exact top-3")
      assert(ap >= 0 && ap <= 1000000000L)
      if (nHits === 0) assert(ap === 0L)
    }
  }

  test("cross-metric consistency: perfect NDCG implies RR hit at rank <= 3") {
    val ndcg = run("ndcg_at_k_ann").map(r => r.getLong(0) -> r.getLong(4)).toMap
    val mrr = run("mrr_eval_ann")
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) 0 else r.getInt(2))).toMap
    ndcg.foreach { case (q, v) =>
      // NDCG = 1 means the run's top-3 ARE the exact top-3 in order, so
      // the exact top-1 must sit at run position 1
      if (v === 1000000L) assert(mrr(q) === 1, s"q=$q perfect NDCG but rank != 1")
    }
  }
}
