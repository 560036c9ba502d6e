package graft

import org.apache.spark.sql.functions._

/** Semantic pins for UpliftOps — split accounting, lift-table
  * conservation/monotonicity, and weight normalization.
  */
class UpliftSpec extends SparkSpec {
  private def run(key: String) =
    operators.UpliftOps.queries(key)(spark, sf()).collect()

  test("ab_srm_check: arms partition the user base, χ² symmetric") {
    val rows = run("ab_srm_check")
    assert(rows.length === 2)
    val nUsers = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    assert(rows.forall(_.getLong(2) === nUsers), "n is the shared total")
    // (2o−n)² is identical for both arms of a 2-cell split
    assert(rows.map(_.getLong(4)).distinct.length === 1)
    // shares sum to 1e6 up to truncation
    val sh = rows.map(_.getLong(3)).sum
    assert(sh <= 1000000L && sh > 1000000L - 2)
  }

  test("decile_lift_table: deciles conserve users and converge to lift 1") {
    val rows = run("decile_lift_table").sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    val nUsers = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    assert(rows.map(_.getLong(2)).sum >= 0)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    // cumulative lift over ALL deciles is exactly 1 (cum = base)
    assert(rows.last.getLong(4) === 1000000L,
      s"full-population lift must be 1, got ${rows.last.getLong(4)}")
  }

  test("class_balance_weights: rarer classes weigh more, normalized mean ≈ 1") {
    val rows = run("class_balance_weights")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sf()).count())
    // weight strictly decreases as freq increases
    val byFreq = rows.sortBy(_.getLong(1))
    byFreq.sliding(2).foreach { case Array(a, b) =>
      if (a.getLong(1) < b.getLong(1))
        assert(a.getLong(3) >= b.getLong(3), "monotone in 1/freq")
    }
    // Σ weight ≈ k·1e6 (mean weight 1) up to per-row truncation
    val k = rows.length
    val sw = rows.map(_.getLong(3)).sum
    assert(sw <= k * 1000000L && sw > k * 1000000L - 2L * k,
      s"normalization drift: $sw vs ${k * 1000000L}")
  }
  test("cohens_d_value: exact-moment replay + Hedges shrinkage law") {
    val vals = Tables.events(spark, sf())
      .filter(col("event_type").isin("click", "purchase"))
      .selectExpr("event_type = 'click' AS a1",
        "CAST(round(value * 100) AS BIGINT) AS x")
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val (c, p) = (vals.filter(_._1).map(t => BigInt(t._2)),
      vals.filterNot(_._1).map(t => BigInt(t._2)))
    def mom(xs: Array[BigInt]) =
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    val (n1, s1, q1) = mom(c); val (n2, s2, q2) = mom(p)
    val v1 = n1 * q1 - s1 * s1; val v2 = n2 * q2 - s2 * s2
    val dv = (s1.toDouble / n1 - s2.toDouble / n2) /
      math.sqrt((v1.toDouble / n1 + v2.toDouble / n2) / (n1 + n2 - 2.0))
    val corr = 1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)
    val Array(r) = run("cohens_d_value")
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    assert(r.getLong(2) === math.floor(dv * 1e6).toLong, "d leaf replay")
    assert(r.getLong(3) === math.floor(dv * corr * 1e6).toLong, "g leaf")
    assert(math.abs(r.getLong(3)) <= math.abs(r.getLong(2)) + 1,
      "Hedges correction shrinks |d|")
  }
}
