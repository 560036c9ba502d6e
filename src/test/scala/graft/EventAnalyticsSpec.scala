package graft

import org.apache.spark.sql.functions.{col, count, countDistinct, expr, lead, lit, sum, to_date}

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

  test("rfm_segmentation: cells partition the user base; cube replays exactly") {
    val rows = run("rfm_segmentation")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "unix_micros(ts) AS us",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.map(_._2).max, es.length.toLong, es.map(_._3).sum)
    }.toArray
    val n = users.length
    def quint(rankOf: Array[(Long, Long)]): Map[Long, Long] = {
      // rankOf: (user, metric) ranked metric-DESC with user tiebreak
      val sorted = rankOf.sortBy { case (u, v) => (-v, u) }
      sorted.zipWithIndex.map { case ((u, _), i) =>
        u -> math.ceil((i + 1) * 5.0 / n).toLong
      }.toMap
    }
    val rq = quint(users.map(u => (u._1, u._2)))
    val fq = quint(users.map(u => (u._1, u._3)))
    val mq = quint(users.map(u => (u._1, u._4)))
    val expected = users.groupBy(u => (rq(u._1), fq(u._1), mq(u._1)))
      .map { case (k, us) => k -> (us.length.toLong, us.map(_._4).sum) }
    assert(rows.length === expected.size, "exactly the occupied cells")
    assert(rows.map(_.getLong(3)).sum === n.toLong,
      "cells partition the user base")
    rows.foreach { r =>
      val k = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(Seq(k._1, k._2, k._3).forall(q => q >= 1 && q <= 5))
      val (cnt, mon) = expected(k)
      assert(r.getLong(3) === cnt, s"cell count for $k")
      assert(r.getLong(4) === mon, s"cell monetary for $k")
    }
  }

  test("conversion_latency_by_entry replays the strict view->purchase chain") {
    val rows = run("conversion_latency_by_entry")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val lats = byUser.toSeq.flatMap { case (u, es) =>
      val entry = es.minBy(e => (e._3, e._4))._2
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else {
        val v = vs.min
        val ps = es.filter(e => e._2 == "purchase" && e._3 > v).map(_._3)
        if (ps.isEmpty) None else Some((entry, u, ps.min - v))
      }
    }
    val byEntry = lats.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byEntry.keySet)
    assert(rows.map(_.getLong(1)).sum === lats.length.toLong,
      "every converting user counted exactly once")
    rows.foreach { r =>
      val ls = byEntry(r.getString(0)).sortBy(l => (l._3, l._2)).map(_._3)
      assert(r.getLong(1) === ls.length.toLong)
      val med = ls(math.ceil(ls.length * 0.5).toInt - 1)
      assert(r.getLong(2) === med, s"median for ${r.getString(0)}")
      assert(r.getLong(3) === ls.min && r.getLong(4) === ls.max)
      assert(ls.forall(_ > 0), "strict ordering keeps latencies positive")
    }
  }

  test("pareto_revenue_concentration replays the rank-defined top decile") {
    val rows = run("pareto_revenue_concentration")
    assert(rows.length === 1)
    val m = Tables.events(spark, sf())
      .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sum) }.toArray
    val n = m.length
    val nTop = math.ceil(n * 0.1).toInt
    val top = m.sortBy { case (u, v) => (-v, u) }.take(nTop)
    val r = rows.head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === nTop.toLong)
    assert(r.getLong(2) === m.map(_._2).sum)
    assert(r.getLong(3) === top.map(_._2).sum, "top-decile monetary")
    assert(r.getLong(4) === r.getLong(3) * 1000000L / r.getLong(2))
    assert(r.getLong(4) >= 100000L,
      "top decile holds at least its uniform share")
  }

  test("session_duration_histogram partitions sessions and events") {
    val rows = run("session_duration_histogram")
    val gap = 1800000000L
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val durs = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      var cur = scala.collection.mutable.ArrayBuffer[Long]()
      o.foreach { t =>
        if (cur.nonEmpty && t - cur.last > gap) {
          sessions += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[Long]()
        }
        cur += t
      }
      sessions += cur.toSeq
      sessions.map(s => (s.max - s.min, s.length.toLong))
    }.toSeq
    def bucket(dur: Long): Long =
      if (dur == 0) -99L
      else math.floor(math.log(dur.toDouble / 60000000.0) / math.log(2.0)).toLong
    val expected = durs.groupBy(d => bucket(d._1))
      .map { case (b, ds) => b -> (ds.length.toLong, ds.map(_._2).sum) }
    assert(rows.length === expected.size)
    assert(rows.map(_.getLong(2)).sum === ev.length.toLong,
      "histogram partitions every event")
    rows.foreach { r =>
      val (ns, ne) = expected(r.getLong(0))
      assert(r.getLong(1) === ns, s"sessions in bucket ${r.getLong(0)}")
      assert(r.getLong(2) === ne, s"events in bucket ${r.getLong(0)}")
    }
  }

  test("gini_revenue_inequality replays the exact rank formula; 0 <= G < 1") {
    val Array(r) = run("gini_revenue_inequality")
    val m = Tables.events(spark, sf())
      .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT) AS cents")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sum) }.toArray
    val n = m.length
    val sorted = m.sortBy { case (u, v) => (v, u) }
    val s0 = sorted.map(x => BigInt(x._2)).sum
    val s1 = sorted.zipWithIndex
      .map { case ((_, v), i) => BigInt(i + 1) * v }.sum
    val gini = (2 * s1 - (BigInt(n) + 1) * s0) * 1000000 / (BigInt(n) * s0)
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === s0.toLong)
    assert(r.getLong(2) === gini.toLong, "Gini fixed-point replay")
    assert(gini >= 0 && gini < 1000000,
      "Gini of a non-degenerate distribution sits in [0, 1)")
  }

  test("churn_inactivity_by_entry: users partition; horizon rule replays") {
    val rows = run("churn_inactivity_by_entry")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val horizon = ev.map(_._3).max
    val users = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.minBy(e => (e._3, e._4))._2, es.map(_._3).max)
    }.toSeq
    val byEntry = users.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSet === byEntry.keySet)
    assert(rows.map(_.getLong(1)).sum === users.length.toLong,
      "channel rows partition the user base")
    rows.foreach { r =>
      val us = byEntry(r.getString(0))
      val churned =
        us.count(u => horizon - u._3 > 14L * 86400000000L).toLong
      assert(r.getLong(1) === us.length.toLong)
      assert(r.getLong(2) === churned, s"churned for ${r.getString(0)}")
      assert(r.getLong(3) === churned * 1000000L / us.length)
    }
  }

  test("markov_next_event_topk: exactly the top-3 by (c DESC, nxt); p exact") {
    val rows = run("markov_next_event_topk")
    val seq = Tables.events(spark, sf())
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = seq.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3)).map(_._4)
      o.zip(o.drop(1))
    }.toSeq
    val cells = trans.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    val byType = cells.groupBy(_._1._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val tot = byType(t).values.sum
      val exp = byType(t).toSeq.map { case ((_, nxt), c) => (nxt, c) }
        .sortBy { case (nxt, c) => (-c, nxt) }.take(3)
      val got = rs.sortBy(_.getLong(1))
      assert(got.map(_.getLong(1)).toSeq === (1L to exp.length).toSeq,
        s"dense ranks for $t")
      got.zip(exp).foreach { case (r, (nxt, c)) =>
        assert(r.getString(2) === nxt, s"successor order for $t")
        assert(r.getLong(3) === c)
        assert(r.getLong(4) === c * 1000000L / tot, s"probability for $t")
      }
    }
  }

  test("first_touch_attribution conserves purchase revenue across channels") {
    val rows = run("first_touch_attribution")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val purch = ev.filter(_._2 == "purchase")
    assert(rows.map(_.getLong(3)).sum === purch.map(_._3).sum,
      "attributed cents sum to total purchase revenue")
    assert(rows.map(_.getLong(2)).sum === purch.length.toLong,
      "every purchase attributed exactly once")
    assert(rows.map(_.getLong(1)).sum ===
      purch.map(_._1).distinct.length.toLong,
      "every buying user attributed to exactly one channel")
    val shareSum = rows.map(_.getLong(4)).sum
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L,
      "shares sum to 1e6 up to floor ulps")
  }

  test("late_arrival_audit replays the ingest-order running max") {
    val rows = run("late_arrival_audit")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_.getLong(1)).sum === ev.length.toLong,
      "type rows partition the log")
    val expected = ev.groupBy(_._1).values.flatMap { es =>
      var mx = Long.MinValue
      es.sortBy(_._2).map { e =>
        mx = math.max(mx, e._4)
        (e._3, e._4 < mx, mx - e._4)
      }
    }.toSeq
    val byType = expected.groupBy(_._1)
    rows.foreach { r =>
      val es = byType(r.getString(0))
      assert(r.getLong(1) === es.length.toLong)
      assert(r.getLong(2) === es.count(_._2).toLong,
        s"late count for ${r.getString(0)}")
      assert(r.getLong(4) === es.map(_._3).max,
        s"max lateness for ${r.getString(0)}")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("weekday_seasonality_profile: engine-free day index; χ²/n replays") {
    val rows = run("weekday_seasonality_profile")
    val ev = Tables.events(spark, sf())
      .selectExpr("event_type", "unix_micros(ts) AS us").collect()
      .map(r => (r.getString(0), (r.getLong(1) / 86400000000L + 4) % 7))
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val counts = byType(r.getString(0)).groupBy(_._2)
        .map { case (dw, xs) => dw -> xs.length.toLong }
      val n = counts.values.sum
      assert(r.getLong(1) === counts.size.toLong, "distinct weekdays")
      assert(r.getLong(2) === n)
      val mx = counts.values.max
      assert(r.getLong(3) === counts.collect {
        case (dw, c) if c == mx => dw
      }.min, "peak day = min dow among maxima")
      val ss = counts.values.map(o => (7 * o - n) * (7 * o - n)).sum
      assert(r.getLong(4) === ss * 1000000L / (7 * n * n), "χ²/n replay")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 6)
    }
  }

  test("markov_stationary_dist: probability mass, positivity, and convergence") {
    val rows = SparkEntry.queries("markov_stationary_dist")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val nTypes = Tables.events(spark, sf())
      .select("event_type").distinct().count()
    assert(rows.length === nTypes, "one π entry per type")
    rows.foreach { case (t, pi) =>
      assert(pi > 0 && pi < 1000000, s"π($t) = $pi degenerate")
    }
    // sum-then-truncate loses < 1 ppm per entry per iteration
    val mass = rows.map(_._2).sum
    assert(mass <= 1000000 && mass > 1000000 - nTypes * 21,
      s"π mass $mass drifted past the truncation envelope")
    // convergence: one more exact iteration moves nothing by > 1000 ppm
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pm = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("event_type", "nxt").agg(count(lit(1)).as("c"))
      .withColumn("tot", sum("c").over(
        Window.partitionBy("event_type")))
      .select(col("event_type"), col("nxt"),
        expr("c * 1000000 DIV tot").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val pi = rows.toMap
    val next = rows.map { case (b, _) =>
      b -> pm.filter(_._2 == b).map { case (a, _, p) => pi(a) * p }.sum / 1000000L
    }
    next.foreach { case (t, v) =>
      assert(math.abs(v - pi(t)) <= 1000, s"π($t) still moving: $v vs ${pi(t)}")
    }
  }

  test("dau_mau_stickiness: ratio identity and the DAU ≤ MAU dominance") {
    val rows = SparkEntry.queries("dau_mau_stickiness")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, mau, avgDau, st) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(avgDau <= mau, "a day's actives are a subset of the month's")
      assert(st > 0 && st <= 1000000)
      // replay: stickiness from the raw per-day distinct counts
      val days = Tables.events(spark, sf())
        .filter(expr(s"date_format(ts, 'yyyy-MM') = '${r.getString(0)}'"))
        .groupBy(expr("CAST(ts AS DATE)"))
        .agg(countDistinct("user_id").as("d")).collect()
      assert(days.length === nDays)
      val sumDau = days.map(_.getLong(1)).sum
      assert(st === sumDau * 1000000L / (nDays * mau), "ratio replay")
    }
  }

  test("markov_entropy_rate: pi matches the stationary op; bounds + replay") {
    val rows = run("markov_entropy_rate")
    val pis = run("markov_stationary_dist")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === pis.keySet,
      "same state set as the stationary operator")
    val maxH = math.ceil(math.log(pis.size.toDouble) * 1e9).toLong
    rows.foreach { r =>
      val (t, pi, h, c) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(pi === pis(t), "pi identical to markov_stationary_dist")
      assert(h >= 0L && h <= maxH,
        "branching entropy bounded by ln |types|")
      assert(c === pi * h / 1000000L, "contribution product replay")
    }
    // the rate (sum of contributions) cannot exceed the hottest state's
    // branching entropy (weights sum to <= 1 after truncation)
    assert(rows.map(_.getLong(3)).sum <= rows.map(_.getLong(2)).max)
  }

  test("markov_removal_attribution: removal shrinks reach; shares replay") {
    val rows = run("markov_removal_attribution")
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("click", "error", "signup", "view"))
    val pBase = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) === pBase), "base reach constant")
    assert(pBase > 0 && pBase <= 1000000L)
    rows.foreach { r =>
      val (pRem, re) = (r.getLong(2), r.getLong(3))
      assert(pRem >= 0 && pRem <= pBase,
        "removing a channel never raises conversion reach")
      assert(re === 1000000L - pRem * 1000000L / pBase, "RE replay")
      assert(re >= 0 && re <= 1000000L)
    }
    val reSum = rows.map(r => math.max(r.getLong(3), 0L)).sum
    assert(reSum > 0, "some channel carries conversion mass")
    rows.foreach { r =>
      assert(r.getLong(4) ===
        math.max(r.getLong(3), 0L) * 1000000L / reSum, "share replay")
    }
    // shares sum to 1 up to the 4 truncations
    val attSum = rows.map(_.getLong(4)).sum
    assert(attSum > 1000000L - 4 && attSum <= 1000000L)
  }

  test("kleinberg_burst_days: DP replay, path optimality, burst accounting") {
    val rows = run("kleinberg_burst_days").map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    val t = rows.length
    assert(t === Tables.events(spark, sf())
      .select(org.apache.spark.sql.functions.expr(
        "unix_micros(ts) DIV 86400000000")).distinct().count().toInt,
      "one row per observed day")
    val trans = math.floor(math.log(t.toDouble) * 1e6).toLong
    // forward DP replay from the emitted cost columns
    var p0 = 0L; var p1 = 0L
    rows.zipWithIndex.foreach { case ((_, _, _, c0, c1, a0, a1, _, _), i) =>
      if (i == 0) { assert(a0 === c0 && a1 === c1 + trans) }
      else {
        assert(a0 === c0 + math.min(p0, p1))
        assert(a1 === c1 + math.min(p0 + trans, p1))
      }
      p0 = a0; p1 = a1
    }
    // the reported path's total cost equals the DP optimum
    val states = rows.map(_._8)
    val nStarts = rows.map(_._9).sum
    val pathCost = rows.map { case (_, _, _, c0, c1, _, _, st, _) =>
      if (st == 0L) c0 else c1 }.sum + nStarts * trans
    assert(pathCost === math.min(p0, p1), "Viterbi path achieves the optimum")
    // burst accounting: starts mark exactly the 0->1 boundaries
    val expStarts = states.zipWithIndex.count { case (s, i) =>
      s == 1L && (i == 0 || states(i - 1) == 0L) }.toLong
    assert(nStarts === expStarts)
    // any all-one-state path is never cheaper than the optimum
    assert(math.min(p0, p1) <= rows.map(_._4).sum, "beats all-q0")
    assert(math.min(p0, p1) <= rows.map(_._5).sum + trans, "beats all-q1")
  }

  test("cochran_q_weekday: brute grid replay; Q >= 0") {
    val rows = run("cochran_q_weekday")
    val pres = Tables.events(spark, sf())
      .selectExpr("user_id",
        "(unix_micros(ts) DIV 86400000000 + 4) % 7 AS dow")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rSums = pres.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cSums = pres.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sumR = rSums.values.sum; val sumR2 = rSums.values.map(r => r * r).sum
    val sumC = cSums.values.sum
    val sumC2 = cSums.values.map(c => BigInt(c) * c).sum
    val den = 7L * sumR - sumR2
    if (den <= 0) assert(rows.isEmpty)
    else {
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(0) === rSums.size.toLong)
      assert(r.getLong(1) === sumR)
      val num = BigInt(6) * (7 * sumC2 - BigInt(sumC) * sumC) * 1000000
      assert(num >= 0, "Cauchy-Schwarz on the fixed column total")
      assert(r.getLong(2) === (num / den).toLong, "exact Q rational")
      assert(r.getLong(3) === 6L)
    }
  }
}
