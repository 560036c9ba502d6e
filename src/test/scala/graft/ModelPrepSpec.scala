package graft

import org.apache.spark.sql.functions._

/** Semantic pins for ModelPrepOps — greedy-farthest monotonicity, CUSUM
  * positivity/reset, and hashing pigeonhole laws.
  */
class ModelPrepSpec extends SparkSpec {
  private def run(key: String) =
    operators.ModelPrepOps.queries(key)(spark, sf()).collect()

  test("kcenter_farthest_seeds: greedy picks are distinct and non-increasing") {
    val rows = run("kcenter_farthest_seeds")
    assert(rows.length === 4)
    assert(rows.map(_.getLong(1)).distinct.length === 4, "seeds distinct")
    assert(rows.head.getLong(0) === 0L && rows.head.getLong(2) === 0L)
    // the farthest distance can only shrink as the seed set grows
    val d2s = rows.tail.map(_.getLong(2))
    d2s.zip(d2s.tail).foreach { case (a, b) => assert(a >= b) }
    // rank-1 pick is exactly the point farthest from seed 0
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT))")
          .as("fxs"))
    val s0 = emb.orderBy("vec_id").limit(1).collect()(0)
    val lit = s0.getSeq[Long](1).mkString("array(", "L,", "L)")
    val far = emb.withColumn("d2", expr(
        s"aggregate(zip_with(fxs, $lit, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
      .orderBy(col("d2").desc, col("vec_id")).limit(1).collect()(0)
    assert(rows(1).getLong(1) === far.getLong(0))
    assert(rows(1).getLong(2) === far.getLong(2))
  }

  test("cusum_drift_alarm: one-sided statistic is nonnegative and resets yearly") {
    val rows = run("cusum_drift_alarm")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 0, "CUSUM is one-sided"))
    // the first day of each year starts at 0 (P1 − min(P1) = 0)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      assert(rs.minBy(_.getLong(0)).getLong(3) === 0L)
    }
    // alarm ⇔ statistic over threshold is internally consistent
    val alarms = rows.count(_.getBoolean(4))
    assert(alarms < rows.length, "not every day alarms")
  }

  test("feature_hash_collision_audit: pigeonhole accounting holds") {
    val Array(r) = run("feature_hash_collision_audit")
    val vocab = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(r.getLong(0) === vocab, "n_vocab reconciles")
    assert(r.getLong(1) <= math.min(vocab, 1024L), "buckets bounded")
    assert(r.getLong(2) <= r.getLong(0), "collided ⊆ vocab")
    assert(r.getLong(3) >= (vocab + 1023) / 1024, "pigeonhole lower bound")
    assert(r.getLong(4) === r.getLong(2) * 1000000L / r.getLong(0))
  }

  test("gini_split_stump: conservation, impurity bounds, and the argmin pick") {
    val rows = run("gini_split_stump")
    assert(rows.length === 9, "nine candidate thresholds")
    val nOrders = Tables.orders(spark, sf()).count()
    val nF = Tables.orders(spark, sf())
      .filter(col("o_orderstatus") === "F").count()
    rows.foreach { r =>
      val (t, nl, pl, nr, pr, g) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(t % 50000 === 0 && t >= 50000 && t <= 450000)
      assert(nl + nr === nOrders, "split partitions the table")
      assert(pl + pr === nF, "positives conserved")
      assert(pl <= nl && pr <= nr)
      // binary Gini impurity caps at 1/2
      assert(g >= 0 && g <= 500000, s"weighted Gini $g out of range")
    }
    // the published best is the (gini, threshold)-lexicographic argmin
    val best = rows.map(_.getLong(6)).distinct
    assert(best.length === 1)
    val expect = rows.map(r => (r.getLong(5), r.getLong(0))).min._2
    assert(best.head === expect, "best_threshold = argmin of the curve")
    // prefix monotonicity of the cumulative split
    val nls = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(nls.zip(nls.tail).forall { case (a, b) => a <= b })
  }
}
