package graft

/** Semantic pins for EventSequenceOps: user-count conservation for the
  * streak histogram, trigram-count conservation against the stream
  * length, and the median-rank contract (the reported dwell value has
  * as many transitions at-or-below it as the lower-median rank).
  */
class EventSequenceSpec extends SparkSpec {
  private def run(key: String) =
    operators.EventSequenceOps.queries(key)(spark, sf()).collect()

  test("activity_streak_histogram: users conserved; streaks within calendar") {
    val rows = run("activity_streak_histogram")
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers, "every user has a streak")
    val nDays = Tables.events(spark, sf())
      .selectExpr("CAST(ts AS DATE) AS d").distinct().count()
    rows.foreach { r =>
      val len = r.getLong(0)
      assert(len >= 1 && len <= nDays, "streak bounded by the calendar")
    }
  }

  test("event_type_trigrams: occurrence mass bounded; desc order") {
    val rows = run("event_type_trigrams")
    assert(rows.nonEmpty && rows.length <= 20)
    val occs = rows.map(_.getLong(1))
    assert(occs.sameElements(occs.sortBy(-_)))
    // Σ over ALL trigrams = Σ_users max(n_u − 2, 0); top-20 is a subset
    val perUser = Tables.events(spark, sf())
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val total = perUser.map(n => math.max(n - 2, 0L)).sum
    assert(occs.sum <= total)
    rows.foreach { r =>
      assert(r.getString(0).split(">").length === 3, "trigram shape")
    }
  }

  test("dwell_time_by_transition: median rank contract per pair") {
    val rows = run("dwell_time_by_transition")
    assert(rows.nonEmpty)
    // brute-force gaps per pair from the collected stream
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._4, e._2))
      s.sliding(2).collect { case Array(a, b) =>
        ((a._3, b._3), b._4 - a._4)
      }
    }.toSeq.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    rows.foreach { r =>
      val (p, t, n, med) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      val g = gaps((p, t))
      assert(n === g.length, s"transition count $p>$t")
      assert(med === g(((n + 1) / 2 - 1).toInt), s"lower median $p>$t")
    }
    assert(rows.length === gaps.size, "one row per observed transition pair")
  }
}
