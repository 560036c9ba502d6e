package graft

import org.apache.spark.sql.functions._

/** Structural guarantees of the learned-quantizer ANN path
  * (`ann_kmeans_ivf` is rows-only for the driver — cluster assignments
  * are model output, not SQL-expressible).
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans IVF: 3 in-cell neighbors per query, sorted by similarity") {
    val out = SparkEntry.queries("ann_kmeans_ivf")(spark, sf()).cache()
    val rows = out.select("q_id", "rank", "neighbor_id", "cell", "cosine")
      .as[(Long, Int, Long, Int, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.nonEmpty && byQuery.forall(_._2.length == 3))
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // similarity non-increasing with rank
      assert(sorted.sliding(2).forall(p => p.head._5 >= p.last._5 - 1e-9))
      // all candidates come from one cell (single-probe IVF)
      assert(sorted.map(_._4).distinct.length == 1)
      // never returns the query itself
      assert(!sorted.exists(r => r._3 == r._1))
    }
  }

  test("kmeans IVF is deterministic across invocations (fixed seed)") {
    val a = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val b = SparkEntry.queries("ann_kmeans_ivf")(spark, sf())
      .select("q_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(a === b)
  }
}
