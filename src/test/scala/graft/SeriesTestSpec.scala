package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Independent driver-side replays for SeriesTestOps — each statistic
  * recomputed from the raw fixture in plain Scala/BigInt, so a rank or
  * moment regression fails here even if both engines drift together.
  */
class SeriesTestSpec extends SparkSpec {
  private def run(key: String) =
    operators.SeriesTestOps.queries(key)(spark, sf()).collect()

  /** (di, x) daily counts sorted by day, straight off the fixture. */
  private lazy val daily: Vector[(Long, Long)] =
    Tables.events(spark, sf())
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
        .as("di"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
      .sortBy(_._1).toVector

  test("cox_stuart_trend replays exactly") {
    val xs = daily.map(_._2)
    val n = xs.length
    val h = n - n / 2
    val pairs = (0 until n - h).map(i => (xs(i), xs(i + h)))
    val pos = pairs.count { case (a, b) => b > a }
    val neg = pairs.count { case (a, b) => b < a }
    val Array(row) = run("cox_stuart_trend")
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === pairs.length.toLong)
    assert(row.getLong(2) === pos.toLong)
    assert(row.getLong(3) === neg.toLong)
    if (pos + neg > 0)
      assert(row.getLong(4) ===
        math.floor((pos - neg).toDouble / math.sqrt((pos + neg).toDouble)
          * 1e6).toLong)
  }

  test("turning_points_test replays exactly") {
    val xs = daily.map(_._2)
    val n = xs.length
    val t = (1 until n - 1).count(i =>
      (xs(i) > xs(i - 1) && xs(i) > xs(i + 1)) ||
        (xs(i) < xs(i - 1) && xs(i) < xs(i + 1)))
    val z = (t - 2.0 * (n - 2) / 3.0) /
      math.sqrt((16.0 * n - 29.0) / 90.0)
    val Array(row) = run("turning_points_test")
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === t.toLong)
    assert(row.getLong(2) === math.floor(z * 1e6).toLong)
  }

  test("dixon_q_outlier replays exactly and Q stays in [0, 1e6]") {
    val sorted = daily.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length
    val (lo, lo2, hi2, hi) =
      (sorted(0), sorted(1), sorted(n - 2), sorted(n - 1))
    val Array(row) = run("dixon_q_outlier")
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) === ((n.toLong, lo, lo2, hi2, hi)))
    if (hi > lo) {
      val qMin = (lo2 - lo) * 1000000L / (hi - lo)
      val qMax = (hi - hi2) * 1000000L / (hi - lo)
      assert(row.getLong(5) === qMin && row.getLong(6) === qMax)
      assert(qMin >= 0 && qMin <= 1000000L && qMax >= 0 &&
        qMax <= 1000000L, "gap/range ratios bounded")
    }
  }

  test("bartlett_test_priority replays exactly in BigInt") {
    val vals = Tables.orders(spark, sf())
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = vals.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (sc, rows) =>
        val xs = rows.map(t => BigInt(t._2))
        val n = BigInt(xs.length)
        val v = n * xs.map(x => x * x).sum - xs.sum * xs.sum
        (sc, xs.length.toLong, v)
    }.filter { case (_, n, v) => n >= 2 && v > 0 }
    val k = groups.length
    val nTot = groups.map(_._2).sum
    val lnv = groups.map { case (sc, n, v) =>
      sc -> math.floor(math.log(v.toDouble / (n.toDouble * (n - 1)))
        * 1e9).toLong
    }.toMap
    val sw = groups.map { case (_, n, v) => (v * 1000000) / n }.sum
    val lnp = math.floor(math.log(sw.toDouble / (1e6 * (nTot - k)))
      * 1e9).toLong
    val t = BigInt(nTot - k) * lnp -
      groups.map { case (sc, n, _) => BigInt(n - 1) * lnv(sc) }.sum
    val sumH = groups.map { case (_, n, _) => 1000000000L / (n - 1) }.sum
    val c = 1000000000L + (sumH - 1000000000L / (nTot - k)) / (3 * (k - 1))
    val chi2 = if (t >= 0) (t * 1000000 / c).toLong
      else -((-t) * 1000000 / c).toLong
    val out = run("bartlett_test_priority")
    assert(out.length === k, "one row per variance-bearing group")
    out.foreach { case Row(sc: Long, nG: Long, lnvFp: Long, kk: Long,
        nT: Long, lnpFp: Long, cFp: Long, chi2Fp: Long) =>
      val g = groups.find(_._1 == sc).get
      assert(nG === g._2 && lnvFp === lnv(sc))
      assert(kk === k.toLong && nT === nTot && lnpFp === lnp)
      assert(cFp === c && chi2Fp === chi2)
    }
    // Bartlett ≥ 0 up to the documented 1e-9 ln-floor noise
    assert(chi2 >= -10L, "statistic non-negative within floor tolerance")
  }

  test("wilcoxon_signed_rank_daily replays exactly with midranks") {
    val xs = daily.map(_._2)
    val diffs = xs.sliding(2).map(p => p(1) - p(0)).filter(_ != 0).toVector
    val byAbs = diffs.groupBy(math.abs)
    val sortedAbs = byAbs.keys.toVector.sorted
    var cum = 0L
    var w2 = 0L
    var tt = BigInt(0)
    sortedAbs.foreach { ad =>
      val g = byAbs(ad)
      val c = g.length.toLong
      val mid2 = 2 * cum + c + 1 // doubled midrank of this tie group
      w2 += g.count(_ > 0) * mid2
      tt += BigInt(c) * c * c - c
      cum += c
    }
    val n = diffs.length.toLong
    val Array(row) = run("wilcoxon_signed_rank_daily")
    assert(row.getLong(0) === n && row.getLong(1) === w2)
    assert(row.getLong(2) === tt.toLong)
    val v12 = 2.0 * n * (n + 1) * (2 * n + 1) - tt.toDouble
    if (v12 > 0)
      assert(row.getLong(3) === math.floor(
        (w2 - n.toDouble * (n + 1) / 2.0) / math.sqrt(v12 / 12.0) * 1e6)
        .toLong)
    // W2+ bounded by the total doubled rank mass n(n+1)
    assert(w2 >= 0 && w2 <= n * (n + 1), "doubled rank-sum bounds")
  }

  test("page_hinkley_drift replays exactly; PH nonnegative and peak-dated") {
    val xs = daily.map(_._2)
    val n = xs.length.toLong
    val s = xs.sum
    val m = xs.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (pre, i) => n * pre - (i + 1) * s }
    val ph = m.zipWithIndex.map { case (mt, t) =>
      mt - m.take(t + 1).min }
    val phMax = ph.max
    val alarmDay = daily(ph.indexOf(phMax))._1
    val Array(row) = run("page_hinkley_drift")
    assert(row.getLong(0) === n && row.getLong(1) === phMax)
    assert(row.getLong(2) === alarmDay, "first day attaining the max")
    assert(row.getLong(3) === (BigInt(phMax) * 1000000 / n).toLong)
    assert(ph.forall(_ >= 0), "PH is a nonnegative excursion")
  }

  test("variance_ratio_weekly replays exactly in BigInt") {
    val xs = daily.map(t => BigInt(t._2))
    val n = xs.length
    val ws = xs.sliding(7).map(_.sum).toVector
    def mom(v: Vector[BigInt]) = (v.length.toLong, v.sum,
      v.map(x => x * x).sum)
    val (nd, sx, qx) = mom(xs)
    val (nw, sw, qw) = mom(ws)
    val v1 = nd * qx - sx * sx
    val vw = nw * qw - sw * sw
    val vr = (vw.toDouble / (nw.toDouble * (nw - 1))) /
      (7.0 * v1.toDouble / (nd.toDouble * (nd - 1)))
    val Array(row) = run("variance_ratio_weekly")
    assert(row.getLong(0) === nd && row.getLong(1) === nw)
    assert(row.getLong(1) === (n - 6).toLong, "overlapping window count")
    assert(row.getLong(2) === math.floor(vr * 1e6).toLong, "VR leaf replay")
    assert(row.getLong(2) > 0, "VR is a positive ratio")
  }

  test("von_neumann_ratio_daily replays exactly in BigInt; eta in (0, 4e6]") {
    val xs = daily.map(t => BigInt(t._2))
    val n = BigInt(xs.length)
    val sd2 = xs.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
    val vn = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val Array(row) = run("von_neumann_ratio_daily")
    assert(row.getLong(0) === xs.length.toLong)
    assert(BigInt(row.getLong(1)) ===
      sd2 * n * n * 1000000 / ((n - 1) * vn), "pure-integer eta replay")
    // η ∈ (0, 4] hard bounds: Σd² ≤ 4·max-spread·variance mass
    assert(row.getLong(1) > 0L && row.getLong(1) <= 4000000L)
  }
}
