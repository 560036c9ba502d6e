package graft

import org.apache.spark.sql.functions._

/** Semantic pins for MiningOps — negative-label exclusion and cluster
  * accounting laws.
  */
class MiningSpec extends SparkSpec {

  test("hard_negative_mining: negatives never share the query's label") {
    val rows = operators.MiningOps.queries("hard_negative_mining")(
      spark, sf()).collect()
    val labels = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      rs.foreach { r =>
        assert(labels(r.getLong(2)) !== labels(qid),
          s"negative ${r.getLong(2)} shares query $qid's label")
      }
      // dot scores weakly decrease down the rank
      val dots = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      dots.zip(dots.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("neardup_cluster_source_purity: pure + mixed partition the clusters") {
    val Array(r) = operators.MiningOps.queries(
      "neardup_cluster_source_purity")(spark, sf()).collect()
    assert(r.getLong(0) === r.getLong(1) + r.getLong(2),
      "pure + mixed = all multi-doc clusters")
    assert(r.getLong(3) >= 2L * r.getLong(2),
      "every mixed cluster holds ≥ 2 docs")
    if (r.getLong(0) > 0)
      assert(r.getLong(4) === r.getLong(2) * 1000000L / r.getLong(0))
  }
}
