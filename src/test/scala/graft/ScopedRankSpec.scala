package graft

/** Semantic pins for ScopedRankOps + media_shard_packing: scope
  * accounting (global top-3 revenue dominates every nation's), shard
  * byte conservation and the ≤-one-file overshoot law, and the
  * alignment correlation range.
  */
class ScopedRankSpec extends SparkSpec {

  test("rank_within_grouping_sets: scope shapes and dominance") {
    val rows = operators.ScopedRankOps
      .queries("rank_within_grouping_sets")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
    val global = rows.filter(_._1 == "global")
    assert(global.length === 3 && global.forall(r =>
      r._2 == "ALL" && r._3 == "ALL"))
    // per scope key: ranks are 1..k with descending revenue
    rows.groupBy(r => (r._1, r._2, r._3)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).sameElements(1 to sorted.length))
      val revs = sorted.map(_._6)
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
    // the global #1 revenue is >= every nation-scope #1 revenue
    val g1 = global.find(_._4 == 1).get._6
    rows.filter(r => r._1 == "nation" && r._4 == 1)
      .foreach(r => assert(r._6 <= g1, "global #1 dominates"))
  }

  test("media_shard_packing: byte conservation and overshoot bound") {
    val rows = operators.MultimodalOps
      .queries("media_shard_packing")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val totalBytes = rows.map(_.getLong(2)).sum
    val totalFiles = rows.map(_.getLong(1)).sum
    val direct = Tables.documents(spark, sf())
      .filter(org.apache.spark.sql.functions.expr("doc_id % 25 = 0"))
      .selectExpr("CAST(octet_length(text) AS BIGINT) AS b")
      .collect().map(_.getLong(0))
    assert(totalFiles === direct.length, "every media file in one shard")
    assert(totalBytes === direct.sum, "byte mass conserved")
    // prefix rule: a shard holds the files whose exclusive prefix lies
    // in [k*2048, (k+1)*2048) ⇒ bytes < 2048 + max file size
    val maxFile = direct.max
    rows.foreach { r =>
      assert(r.getLong(2) < 2048 + maxFile, "overshoot bounded by one file")
      assert(r.getLong(3) <= r.getLong(4), "doc range ordered")
    }
  }

  test("text_embedding_length_corr: |corr| <= 1 over the joined ids") {
    val Array(r) = operators.ScopedRankOps
      .queries("text_embedding_length_corr")(spark, sf()).collect()
    assert(r.getLong(0) > 0)
    if (!r.isNullAt(1))
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }
}
