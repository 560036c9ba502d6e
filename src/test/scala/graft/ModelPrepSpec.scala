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
}
