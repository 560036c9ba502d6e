package graft

/** Semantic pins for AgreementOps: κ's closed-form replay against the
  * confusion matrix, the knee geometry (chord endpoints score zero,
  * exactly one elbow, first-max tie rule), and burn-table identities
  * (cumulative consumption is monotone and ends at the whole-period
  * burn).
  */
class AgreementSpec extends SparkSpec {
  private def run(key: String) =
    operators.AgreementOps.queries(key)(spark, sf()).collect()

  test("cohens_kappa_langid: closed form replays from the confusion") {
    val Array(r) = run("cohens_kappa_langid")
    val (n, agree, pe, kappa) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n === Tables.documents(spark, sf()).count())
    assert(agree <= n && pe <= n * n)
    assert(kappa <= 1000000L, "kappa <= 1")
    val num = n * agree - pe
    val den = n * n - pe
    val expect =
      if (num >= 0) num * 1000000L / den else -((-num) * 1000000L / den)
    assert(kappa === expect)
    // range law: κ ∈ [−1, 1] (the fixture's heuristic can sit on
    // either side of chance at tiny scales — no direction assumed)
    assert(kappa >= -1000000L && kappa <= 1000000L)
  }

  test("kneedle_cell_elbow: endpoints score zero; exactly one elbow") {
    val rows = run("kneedle_cell_elbow")
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getLong(2))
    assert(sizes.sameElements(sizes.sortBy(-_)), "curve sorted desc")
    val k = rows.length
    assert(rows.head.getLong(3) === 0L, "chord start has zero cross")
    assert(rows.last.getLong(3) === 0L, "chord end has zero cross")
    val elbows = rows.filter(_.getBoolean(4))
    assert(elbows.length === 1, "exactly one elbow")
    val mx = rows.map(r => math.abs(r.getLong(3))).max
    assert(math.abs(elbows.head.getLong(3)) === mx)
    // first-max tie rule
    val firstMax = rows.find(r => math.abs(r.getLong(3)) == mx).get
    assert(firstMax.getLong(0) === elbows.head.getLong(0))
    assert(k === rows.map(_.getInt(1)).distinct.length, "one row per cell")
  }

  test("slo_error_budget_burn: monotone consumption ending at total burn") {
    val rows = run("slo_error_budget_burn")
    assert(rows.nonEmpty)
    val cums = rows.map(_.getLong(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
      "cumulative consumption is monotone")
    val totEvents = rows.map(_.getLong(1)).sum
    val totErrors = rows.map(_.getLong(2)).sum
    assert(cums.last === totErrors * 1000000L * 1000000L /
      (totEvents * 10000L), "final consumption is the whole-period burn")
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(3) <= 1000000L)
    }
  }

  test("mcnemar_langid_pair: grid partitions the corpus; χ² replays") {
    val Array(r) = run("mcnemar_langid_pair")
    val (maj, n, both, b, c) = (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val chi2 = r.getLong(5)
    assert(n === Tables.documents(spark, sf()).count())
    assert(both + b + c <= n, "both-wrong cell absorbs the rest")
    // majority label replay from the stored column directly
    val counts = Tables.documents(spark, sf())
      .groupBy("lang").count().collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val expectMaj = counts.sortBy { case (l, cnt) => (-cnt, l) }.head._1
    assert(maj === expectMaj, "deterministic majority tie-break")
    // continuity-corrected χ² replay in BigInt
    val expect =
      if (b + c > 0)
        ((BigInt((b - c).abs - 1).pow(2) * 1000000) / BigInt(b + c)).toLong
      else 0L
    assert(chi2 === expect)
    // direction law: more ngram-only wins than baseline-only wins
    // exactly when ngram accuracy beats the majority baseline
    val ngramAcc = both + b
    val baseAcc = both + c
    assert((ngramAcc > baseAcc) === (b > c))
  }

  test("lin_ccc_daily: exact moment replay; |CCC| <= Pearson bound <= 1") {
    import org.apache.spark.sql.functions._
    val xy = Tables.events(spark, sf())
      .groupBy(expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')")
        .as("di"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .collect().map(r => (BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(xy.length)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val qx = xy.map(t => t._1 * t._1).sum
    val qy = xy.map(t => t._2 * t._2).sum
    val qxy = xy.map(t => t._1 * t._2).sum
    val num = 2 * (n * qxy - sx * sy)
    val den = (n * qx - sx * sx) + (n * qy - sy * sy) + (sx - sy) * (sx - sy)
    def sdiv(a: BigInt, b: BigInt): BigInt =
      if (a >= 0) a * 1000000 / b else -((-a) * 1000000 / b)
    val Array(row) = operators.AgreementOps
      .queries("lin_ccc_daily")(spark, sf()).collect()
    assert(row.getLong(0) === xy.length.toLong)
    assert(BigInt(row.getLong(1)) === sx && BigInt(row.getLong(2)) === sy)
    assert(BigInt(row.getLong(3)) === sdiv(num, den), "signed CCC replay")
    // |ρc| ≤ 1 always (den ≥ |num| by AM-GM on the variance terms)
    assert(math.abs(row.getLong(3)) <= 1000000L)
  }
}
