package graft

import org.apache.spark.sql.functions.{col, to_date}

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

  test("rolling_active_users: WAU7 replays as the exact trailing-7-day distinct") {
    val rows = run("rolling_active_users")
    val au = Tables.events(spark, sf())
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = au.map(_._1).distinct
    assert(rows.length === days.length, "one row per active day")
    val byDay = rows.map(r =>
      r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2))).toMap
    days.foreach { d =>
      val dau = au.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = au.filter { case (ad, _) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7))
      }.map(_._2).distinct.length.toLong
      val (gotDau, gotWau) = byDay(d)
      assert(gotDau === dau, s"DAU for $d")
      assert(gotWau === wau, s"WAU7 for $d")
      assert(gotWau >= gotDau, "the window dominates its last day")
    }
  }

  test("winsorized_mean_value replays as the exact p05/p95-clipped mean") {
    val rows = run("winsorized_mean_value")
    val ev = Tables.events(spark, sf()).select("event_type", "value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    assert(rows.map(_.getString(0)).toSet === ev.map(_._1).toSet,
      "one row per event type")
    rows.foreach { r =>
      val cents = ev.filter(_._1 == r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) === cents.length.toLong)
      val lo = cents(math.ceil(cents.length * 0.05).toInt - 1)
      val hi = cents(math.ceil(cents.length * 0.95).toInt - 1)
      assert(lo <= hi)
      val clipped = cents.map(c => math.max(lo, math.min(hi, c)))
      val expected = clipped.map(BigInt(_)).sum * 10000 / cents.length
      assert(r.getLong(2) === expected.toLong,
        s"winsorized mean replay for ${r.getString(0)}")
      assert(r.getLong(2) >= lo * 10000L && r.getLong(2) <= hi * 10000L,
        "clipped mean confined to the clip bounds")
    }
  }

  test("event_transition_entropy replays per cell; bounded by ln(out_deg)") {
    val rows = run("event_transition_entropy")
    val seq = Tables.events(spark, sf())
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
    val trans = seq.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.toSeq
    val cells = trans.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val byType = cells.groupBy(_._1._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cs = byType(t).values.toSeq
      val tot = cs.sum
      assert(r.getLong(1) === cs.length.toLong, s"out-degree for $t")
      assert(r.getLong(2) === tot, s"transition count for $t")
      val expected = cs.map(c =>
        math.floor(-math.log(c.toDouble / tot) * c * 1000000.0 / tot).toLong).sum
      assert(r.getLong(3) === expected, s"entropy replay for $t")
      assert(r.getLong(3) >= 0 &&
        r.getLong(3) <= math.ceil(math.log(cs.length.toDouble) * 1e6).toLong,
        "0 <= H <= ln(out_deg)")
    }
  }
}
