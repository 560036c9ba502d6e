package graft

import org.apache.spark.sql.functions._

/** Semantic pins for SeriesInfraOps — time-coverage conservation, SAX
  * threshold consistency, and the consistent-hashing movement bound.
  */
class SeriesInfraSpec extends SparkSpec {
  private def run(key: String) =
    operators.SeriesInfraOps.queries(key)(spark, sf()).collect()

  test("twap_by_event_type: segments tile each type's observed span") {
    val rows = run("twap_by_event_type")
    val spans = Tables.events(spark, sf())
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), (max("us") - min("us")).as("span"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, span) = spans(r.getString(0))
      assert(r.getLong(1) === n - 1, "n_segments = n_events − 1")
      assert(r.getLong(2) === span, "covered µs = last − first")
      // TWAP is a convex combination of observed values
      val mnmx = Tables.events(spark, sf())
        .filter(col("event_type") === r.getString(0))
        .agg(min(expr("CAST(round(value * 1000) AS BIGINT)")),
          max(expr("CAST(round(value * 1000) AS BIGINT)"))).collect()(0)
      assert(r.getLong(3) >= mnmx.getLong(0) && r.getLong(3) <= mnmx.getLong(1))
    }
  }

  test("sax_symbolic_week: symbols follow the z thresholds exactly") {
    val rows = run("sax_symbolic_week")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (z, sym) = (r.getLong(2), r.getString(3))
      val expected =
        if (z < -674490L) "a" else if (z < 0L) "b"
        else if (z < 674490L) "c" else "d"
      assert(sym === expected, s"week ${r.getLong(0)}")
    }
    // z-scores center: Σ z_fp is within per-row truncation of zero
    val zsum = rows.map(_.getLong(2)).sum
    assert(math.abs(zsum) <= rows.length.toLong * 2,
      s"z-scores not centered: $zsum")
    // both halves of the alphabet occur on real revenue data
    val syms = rows.map(_.getString(3)).toSet
    assert(syms.exists(Set("a", "b")) && syms.exists(Set("c", "d")))
  }

  test("consistent_hash_rebalance: the ring moves far fewer keys than mod-N") {
    val Array(r) = run("consistent_hash_rebalance")
    val n = r.getLong(0)
    assert(n === Tables.documents(spark, sf()).count())
    assert(r.getLong(2) < r.getLong(1),
      "consistent hashing must beat mod-N")
    // ring movement concentrates near the theoretical 8/24 = 1/3
    val ringRate = r.getLong(2).toDouble / n
    assert(ringRate > 0.15 && ringRate < 0.55, s"ring movement $ringRate")
    // mod movement: h%16 == h%24 ⇔ h%48 < 16, so exactly 1/3 of the
    // hash space stays put ⇒ expected movement 2/3
    val modRate = r.getLong(1).toDouble / n
    assert(modRate > 0.55 && modRate < 0.78, s"mod movement $modRate")
  }
}
