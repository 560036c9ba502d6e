package graft

import org.apache.spark.sql.functions._

/** Semantic pins for DriftOps: PSI non-negativity and bin-mass
  * conservation, the Σbps = 10000 per-journey conservation law for
  * position-based attribution (checked across every journey shape),
  * and order-mass conservation for the aging report.
  */
class DriftSpec extends SparkSpec {
  private def run(key: String) =
    operators.DriftOps.queries(key)(spark, sf()).collect()

  test("psi_value_drift: 10 bins, mass conserved, PSI >= 0") {
    val rows = run("psi_value_drift")
    assert(rows.length === 10)
    assert(rows.map(_.getLong(0)).sorted.sameElements(0L to 9L))
    val nEvents = Tables.events(spark, sf()).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === nEvents,
      "every event lands in exactly one bin")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, "each PSI term is non-negative")
    }
    // reference deciles ⇒ reference bin counts are near-equal (each
    // within 1 of n_ref/10 by the rank-boundary construction, except
    // where ties merge bins)
    val nRef = rows.map(_.getLong(1)).sum
    assert(nRef > 0 && nRef < nEvents)
  }

  test("position_based_attribution: bps conservation per journey") {
    // replay journeys brute-force and check Σbps = 10000 exactly
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts) AS us", "CAST(round(value*100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    var totalAttr = 0L
    var nTouches = 0L
    ev.groupBy(_._1).values.foreach { g =>
      val s = g.toSeq.sortBy(e => (e._4, e._2))
      var jid = 1L
      val byJourney = scala.collection.mutable.HashMap[Long,
        (scala.collection.mutable.ArrayBuffer[String], Option[Long])]()
      s.foreach { e =>
        if (e._3 == "purchase") {
          val (ts, _) = byJourney.getOrElseUpdate(jid,
            (scala.collection.mutable.ArrayBuffer(), None))
          byJourney(jid) = (ts, Some(e._5))
          jid += 1
        } else {
          val (ts, p) = byJourney.getOrElseUpdate(jid,
            (scala.collection.mutable.ArrayBuffer(), None))
          ts += e._3
        }
      }
      byJourney.values.foreach { case (ts, p) =>
        if (p.isDefined && ts.nonEmpty) {
          val k = ts.length
          val bps = (1 to k).map { pos =>
            if (k == 1) 10000L
            else if (k == 2) 5000L
            else if (pos == 1 || pos == k) 4000L
            else 2000L / (k - 2) +
              (if (pos - 1 <= 2000 % (k - 2)) 1L else 0L)
          }
          assert(bps.sum === 10000L, s"journey of $k touches")
          totalAttr += bps.map(_ * p.get).sum
          nTouches += k
        }
      }
    }
    val rows = run("position_based_attribution")
    assert(rows.map(_.getLong(2)).sum === totalAttr,
      "attributed mass replays brute-force")
    assert(rows.map(_.getLong(1)).sum === nTouches)
  }

  test("open_order_aging: order mass conserved over non-final statuses") {
    val rows = run("open_order_aging")
    assert(rows.nonEmpty)
    val open = Tables.orders(spark, sf())
      .filter(col("o_orderstatus") =!= "F")
    assert(rows.map(_.getLong(2)).sum === open.count())
    val bands = rows.map(_.getString(0)).distinct
    assert(bands.forall(Set("0-030d", "031-090d", "091-180d",
      "181-365d", "365d+")))
  }

  test("sprt_conversion_monitor: prefix-sum + boundary-decision replay") {
    val rows = run("sprt_conversion_monitor")
    assert(rows.length === Tables.events(spark, sf())
      .select(expr("CAST(ts AS DATE)")).distinct().count(),
      "one row per observed day")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.events(spark, sf()).count(), "events partitioned by day")
    val up = math.floor(math.log(19.0) * 1e9).toLong
    val lo = math.floor(-math.log(19.0) * 1e9).toLong
    var cum = 0L
    rows.foreach { r =>
      val (n, k, llr, c, dec) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))
      assert(k <= n, "purchases are a subset of events")
      cum += llr
      assert(c === cum, "cumulative LLR is the running sum of increments")
      val expected = if (c >= up) "reject_h0"
        else if (c <= lo) "accept_h0" else "continue"
      assert(dec === expected, s"day ${r.get(0)}: boundary replay")
      // increment replay: same IEEE formula in Scala
      val exp2 = math.floor((k * math.log(0.25 / 0.20)
        + (n - k) * math.log((1.0 - 0.25) / (1.0 - 0.20))) * 1e9).toLong
      assert(llr === exp2, s"day ${r.get(0)}: LLR leaf replay")
    }
  }

  test("wasserstein_doclen_drift: brute CDF-integral replay; bounds") {
    val rows = run("wasserstein_doclen_drift").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf())
      .selectExpr("source", "CAST(size(split(text, ' ')) AS BIGINT) AS l")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val nAll = docs.length.toLong
    val allByLen = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val support = allByLen.keys.toSeq.sorted
    val expect = docs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (src, ds) =>
        val nSrc = ds.length.toLong
        val srcByLen = ds.groupBy(_._2).view.mapValues(_.length.toLong)
          .toMap.withDefaultValue(0L)
        var cumS = 0L; var cumA = 0L; var num = BigInt(0)
        support.zipWithIndex.foreach { case (v, i) =>
          cumS += srcByLen(v); cumA += allByLen(v)
          if (i < support.length - 1) {
            num += (BigInt(cumS) * nAll - BigInt(cumA) * nSrc).abs *
              (support(i + 1) - v)
          }
        }
        (src, nSrc, nAll, (num * 1000000 / (BigInt(nSrc) * nAll)).toLong)
    }
    assert(rows.toSeq === expect, "exact CDF-integral replay")
    // laws: W1 is bounded by the support range; mass totals add up
    val range = (support.max - support.min) * 1000000L
    rows.foreach { case (_, nSrc, na, w1) =>
      assert(w1 >= 0L && w1 <= range, "0 <= W1 <= support range")
      assert(na === nAll && nSrc <= na)
    }
    assert(rows.map(_._2).sum === nAll, "per-source masses partition")
  }

  test("total_variation_event_drift: exact L1 replay; TV in [0, 1e6]") {
    import org.apache.spark.sql.functions._
    val cells = Tables.events(spark, sf())
      .select(col("event_type"),
        expr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5").as("we"))
      .groupBy("event_type")
      .agg(sum(when(col("we"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("we"), 1L).otherwise(0L)).as("c2"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n1 = BigInt(cells.map(_._1).sum)
    val n2 = BigInt(cells.map(_._2).sum)
    val num = cells.map { case (c1, c2) =>
      (BigInt(c1) * n2 - BigInt(c2) * n1).abs }.sum
    val Array(row) = operators.DriftOps
      .queries("total_variation_event_drift")(spark, sf()).collect()
    assert(row.getLong(0) === cells.length.toLong)
    assert(BigInt(row.getLong(1)) === n1 && BigInt(row.getLong(2)) === n2)
    assert(BigInt(row.getLong(3)) === num * 1000000 / (2 * n1 * n2),
      "exact integer L1 replay")
    assert(row.getLong(3) >= 0L && row.getLong(3) <= 1000000L,
      "TV is a probability distance")
  }
}
