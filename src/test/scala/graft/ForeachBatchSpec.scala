package graft

import org.apache.spark.sql.functions._

/** Semantic pins for stream_foreachbatch_upsert: the resolved table
  * equals the batch keep-latest (batching independence), one row per
  * key, and the recency rule actually picked the per-user maximum
  * (ts_us, event_id).
  */
class ForeachBatchSpec extends SparkSpec {
  test("stream_foreachbatch_upsert: resolve equals batch keep-latest") {
    val rows = operators.PipelineOps
      .queries("stream_foreachbatch_upsert")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length === keys.length, "one row per user")
    val slice = Tables.events(spark, sf())
      .filter(col("event_id") % 10 === 0)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
        "event_type", "CAST(round(value*100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val latest = slice.groupBy(_._1).map { case (u, g) =>
      u -> g.maxBy(e => (e._3, e._2))
    }
    assert(rows.length === latest.size)
    rows.foreach { r =>
      val e = latest(r.getLong(0))
      assert(r.getLong(1) === e._2 && r.getLong(2) === e._3 &&
        r.getString(3) === e._4 && r.getLong(4) === e._5,
        s"latest row replay for user ${r.getLong(0)}")
    }
  }
}
