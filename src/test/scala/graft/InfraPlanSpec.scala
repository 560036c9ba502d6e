package graft

/** Semantic pins for InfraPlanOps: salt-plan arithmetic replay, Bloom
  * sizing monotonicity laws, CI ordering/coverage sanity, and the
  * pricing-ladder inequality chain.
  */
class InfraPlanSpec extends SparkSpec {
  private def run(key: String) =
    operators.InfraPlanOps.queries(key)(spark, sf()).collect()

  test("salt_factor_planner: top-20 by count; salt covers the key") {
    val rows = run("salt_factor_planner")
    val nKeys = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(rows.length === math.min(20L, nKeys))
    val cnts = rows.map(_.getLong(1))
    assert(cnts.sameElements(cnts.sortBy(-_)), "descending by count")
    rows.foreach { r =>
      val (cnt, target, salt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(salt >= 1)
      assert(salt * target >= cnt, "salted sub-keys cover the key")
      assert((salt - 1) * target < cnt, "salt is the minimal cover")
    }
  }

  test("bloom_filter_sizing_plan: tighter fpp costs more bits; k sane") {
    val rows = run("bloom_filter_sizing_plan")
    assert(rows.length === 6, "3 tables x 2 fpps")
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val byFpp = g.map(r => r.getLong(2) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val (m1, k1) = byFpp(10000L) // 1% fpp
      val (m2, k2) = byFpp(1000L)  // 0.1% fpp
      assert(m2 > m1, "tighter fpp needs more bits")
      assert(k1 >= 1 && k2 >= 1 && k2 >= k1)
      // ~9.6 bits/key at 1%, ~14.4 at 0.1%
      val n = g.head.getLong(1)
      assert(m1 / n >= 9 && m1 / n <= 10)
      assert(m2 / n >= 14 && m2 / n <= 15)
    }
  }

  test("half_sample_ci: lo <= mean <= hi and resample count") {
    val Array(r) = run("half_sample_ci")
    val (nd, nb, mean, lo, hi) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nd > 0 && nb >= 60 && nb <= 64)
    assert(lo <= hi, "CI ordered")
    // the point estimate should sit inside the half-sample CI for a
    // well-behaved (non-degenerate) revenue series
    assert(lo <= mean && mean <= hi, s"mean $mean outside [$lo, $hi]")
  }

  test("brand_margin_rollup: discount then tax ordering per brand") {
    val rows = run("brand_margin_rollup")
    assert(rows.nonEmpty)
    val nLi = Tables.lineitem(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum === nLi, "every lineitem counted once")
    rows.foreach { r =>
      val (gross, disc, charged) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(disc <= gross, "discount can only reduce")
      assert(charged >= disc, "tax can only add")
    }
  }
}
