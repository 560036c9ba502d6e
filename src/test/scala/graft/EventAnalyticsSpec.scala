package graft

/** Semantic pins for EventAnalyticsOps (oracle checks hash-equality;
  * these pin the invariants the hash can't name).
  */
class EventAnalyticsSpec extends SparkSpec {
  private def run(key: String) =
    operators.EventAnalyticsOps.queries(key)(spark, sf()).collect()

  test("sessionize covers every event exactly once, sessions respect the gap") {
    val sessions = run("sessionize_gap_batch")
    val nEvents = sessions.map(_.getLong(2)).sum
    val total = Tables.events(spark, sf()).count()
    assert(nEvents === total, "session event counts must partition the log")
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val idx = ss.map(_.getLong(1)).sorted
      assert(idx.toSeq === (1L to idx.length).toSeq, "session_idx must be dense from 1")
    }
    // within a session the span is consistent with its duration
    assert(sessions.forall(r => r.getLong(5) >= 0))
  }

  test("funnel stages are monotonically non-increasing") {
    val Array(row) = run("funnel_conversion")
    val (v, c, p) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0, "fixture log contains views")
  }

  test("cohort retention: offset-0 cell covers every user of its cohort") {
    val cells = run("cohort_retention")
    assert(cells.forall(_.getLong(1) >= 0), "offsets are non-negative")
    val firstSeen = Tables.events(spark, sf())
      .groupBy("user_id").count().count()
    val offset0 = cells.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(offset0 === firstSeen,
      "every user is active in their own cohort week (offset 0)")
  }
}
