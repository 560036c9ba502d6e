package graft

/** Semantic pins for DistShapeOps: full driver-side replay of each
  * statistic from the collected event values at sf0.001 — exact BigInt
  * moments/cells, the identical shared-text IEEE leaf for JB, and the
  * pure-integer χ²/T rationals for Mood and Cramér–von Mises.
  */
class DistShapeSpec extends SparkSpec {
  private def run(key: String) =
    operators.DistShapeOps.queries(key)(spark, sf()).collect()

  private lazy val events: Array[(Boolean, String, Long)] =
    Tables.events(spark, sf())
      .selectExpr("(unix_micros(ts) DIV 86400000000 + 4) % 7 >= 5",
        "event_type", "CAST(round(value * 1000) AS BIGINT)")
      .collect()
      .map(r => (r.getBoolean(0), r.getString(1), r.getLong(2)))

  test("jarque_bera_value: BigInt-moment replay of skew/kurtosis/JB") {
    val Array(r) = run("jarque_bera_value")
    val vs = events.map(_._3)
    val n = vs.length.toLong
    assert(r.getLong(0) === n)
    val s1 = vs.map(BigInt(_)).sum
    val s2 = vs.map(v => BigInt(v) * v).sum
    val s3 = vs.map(v => BigInt(v) * v * v).sum
    val s4 = vs.map(v => BigInt(v) * v * v * v).sum
    val vn = BigInt(n) * s2 - s1 * s1
    assert(n >= 4 && vn > 0, "fixture has variance")
    // identical operation order to the shared SQL leaf text
    val mu = s1.toDouble / n
    val r2 = s2.toDouble / n
    val r3 = s3.toDouble / n
    val r4 = s4.toDouble / n
    val m2 = r2 - mu * mu
    val m3 = r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu
    val m4 = r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 -
      3.0 * mu * mu * mu * mu
    val skew = m3 / math.pow(m2, 1.5)
    val exk = m4 / (m2 * m2) - 3.0
    val jb = n.toDouble / 6.0 * (skew * skew + exk * exk / 4.0)
    assert(r.getLong(1) === math.floor(skew * 1e6).toLong, "skew replay")
    assert(r.getLong(2) === math.floor(exk * 1e6).toLong, "kurtosis replay")
    assert(r.getLong(3) === math.floor(jb * 1e6).toLong, "JB replay")
    assert(r.getLong(3) >= 0, "JB is a sum of squares")
  }

  test("mood_median_test: median/cell/χ² replay; margins account N") {
    val Array(r) = run("mood_median_test")
    val n1 = events.count(_._1).toLong
    val n2 = events.length - n1
    assert(r.getLong(1) === n1 && r.getLong(2) === n2)
    val sorted = events.map(_._3).sorted
    val med = sorted(((n1 + n2 + 1) / 2 - 1).toInt) // lower median
    assert(r.getLong(0) === med, "pooled lower median")
    val a = events.count(e => e._1 && e._3 > med).toLong
    val c = events.count(e => !e._1 && e._3 > med).toLong
    val (b, d) = (n1 - a, n2 - c)
    assert(r.getLong(3) === a && r.getLong(4) === b &&
      r.getLong(5) === c && r.getLong(6) === d)
    val num = BigInt(n1 + n2) * (BigInt(a) * d - BigInt(b) * c).pow(2) *
      1000000
    val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
    assert(BigInt(r.getLong(7)) === num / den, "χ² exact rational replay")
  }

  test("cramer_von_mises_value: support-ECDF replay; T ≥ 0") {
    val Array(r) = run("cramer_von_mises_value")
    val cl = events.filter(_._2 == "click").map(_._3)
    val pu = events.filter(_._2 == "purchase").map(_._3)
    val (n1, n2) = (cl.length.toLong, pu.length.toLong)
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    val sup = (cl ++ pu).distinct.sorted
    var (cum1, cum2) = (0L, 0L)
    var s = BigInt(0)
    sup.foreach { v =>
      val (c1, c2) = (cl.count(_ == v).toLong, pu.count(_ == v).toLong)
      cum1 += c1; cum2 += c2
      val gap = BigInt(cum1) * n2 - BigInt(cum2) * n1
      s += BigInt(c1 + c2) * gap * gap
    }
    val t = s * 1000000 / (BigInt(n1 + n2) * (n1 + n2) * n1 * n2)
    assert(BigInt(r.getLong(2)) === t, "T exact rational replay")
    assert(r.getLong(2) >= 0)
  }
}
