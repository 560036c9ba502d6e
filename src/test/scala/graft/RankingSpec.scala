package graft

import org.apache.spark.sql.Row

/** Semantic pins for the RankingOps group (the DuckDB oracle checks
  * hash-equality; these pin the properties the hash can't name).
  */
class RankingSpec extends SparkSpec {
  private def run(key: String) =
    operators.RankingOps.queries(key)(spark, sf()).collect()

  test("bm25_topk returns 10 distinct docs in strictly ranked order") {
    val rows = run("bm25_topk")
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).distinct.length === 10)
    assert(rows.map(_.getInt(1)).toSeq === (1 to 10))
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores === scores.sorted.reverse, "scores must be non-increasing")
    assert(scores.forall(_ > 0), "Lucene idf keeps contributions positive")
  }

  test("mixture_weighted_resample keeps ~budget·w/W per source, content-derived") {
    val rows = run("mixture_weighted_resample")
    assert(rows.length === 20, "every source must survive at fixture rates")
    val wSum = rows.map(_.getLong(1)).sum
    val tRows = rows.map(_.getLong(2)).sum
    val budget = tRows * 2 / 5
    rows.foreach { case Row(src: String, w: Long, nTotal: Long, nKept: Long) =>
      assert(nKept <= nTotal, s"$src kept more than it had")
      val target = budget.toDouble * w / wSum
      // md5 is uniform: binomial(n_total, rate) stays within ±35% of the
      // target at n_total=25 (sf0.001) with margin to spare
      assert(math.abs(nKept - target) <= target * 0.35 + 3,
        s"$src kept $nKept, target $target")
    }
    val total = rows.map(_.getLong(3)).sum
    assert(math.abs(total - budget) <= budget / 5, s"overall kept $total vs budget $budget")
  }

  test("hybrid rerank: candidates come from bm25 top-10; both rankings are sound") {
    val lexical = run("bm25_topk").map(_.getLong(0)).toSet
    val rows = run("hybrid_retrieval_rerank")
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_.getLong(0)).toSet.subsetOf(lexical),
      "dense stage may only rerank lexical survivors")
    val n = rows.length
    assert(rows.map(_.getInt(1)).sorted.toSeq === (1 to n),
      "bm25_rank is a permutation over the candidates")
    assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to n),
      "hybrid_rank is a permutation over the candidates")
    val byHybrid = rows.sortBy(_.getInt(2))
    assert(byHybrid.sliding(2).filter(_.length == 2).forall(p =>
      p(0).getDouble(4) >= p(1).getDouble(4) - 1e-9),
      "cosine non-increasing in hybrid rank")
    val byLex = rows.sortBy(_.getInt(1))
    assert(byLex.sliding(2).filter(_.length == 2).forall(p =>
      p(0).getLong(3) >= p(1).getLong(3)),
      "bm25 score non-increasing in bm25 rank")
  }

  test("pagerank_event_transitions conserves fixed-point mass and ranks all types") {
    val rows = run("pagerank_event_transitions")
    assert(rows.length === 5, "one row per event type")
    val mass = rows.map(_.getLong(1)).sum
    val scale = 1000000000000L
    // floors leak a few units per node per round; dangling mass none
    assert(mass <= scale && mass >= scale - scale / 100,
      s"mass $mass must stay within 1% of $scale")
    val prs = rows.map(_.getLong(1)).toSeq
    assert(prs === prs.sorted.reverse)
    assert(prs.forall(_ > 0))
  }

  test("pagerank distributed join-loop is bit-identical to the driver iterate") {
    // threshold 0 forces the GraphOps-style equi-join loop (the
    // beyond-driver-memory vocabulary path); default routes the 5-type
    // fixture driver-side. Same int64 recurrence ⇒ same bits.
    val driver = run("pagerank_event_transitions")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    spark.conf.set("graft.pagerank.smallThreshold", "0")
    val dist = try run("pagerank_event_transitions")
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    finally spark.conf.unset("graft.pagerank.smallThreshold")
    assert(dist === driver, "distributed iterate diverged from driver iterate")
  }

  test("pagerank is invariant to input partitioning") {
    val a = run("pagerank_event_transitions").map(r => (r.getString(0), r.getLong(1))).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run("pagerank_event_transitions").map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(a === b, "int64 fixed-point iterate must be partition-invariant")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
