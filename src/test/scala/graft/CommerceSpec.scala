package graft

/** Semantic pins for CommerceOps: the fill curve is a CDF (monotone,
  * ends at 1), elasticity is a bounded correlation over every brand,
  * and share shifts conserve (full-population shifts sum to zero, so
  * the top-10's |shift| ordering is pinned instead).
  */
class CommerceSpec extends SparkSpec {
  private def run(key: String) =
    operators.CommerceOps.queries(key)(spark, sf()).collect()

  test("order_fill_curve: monotone CDF ending at full coverage") {
    val rows = run("order_fill_curve")
    assert(rows.length === 9)
    val within = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(within.zip(within.tail).forall { case (a, b) => a <= b },
      "CDF is monotone")
    val total = rows.head.getLong(2)
    assert(total === Tables.lineitem(spark, sf()).count())
    assert(within.last === total, "k=120 bucket (clamped) covers all")
    assert(rows.sortBy(_.getLong(0)).last.getLong(3) === 1000000L)
  }

  test("price_elasticity_brand: one row per brand, |corr| <= 1") {
    val rows = run("price_elasticity_brand")
    val nBrands = Tables.part(spark, sf())
      .select("p_brand").distinct().count()
    assert(rows.length === nBrands)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) {
        val c = r.getDouble(2)
        assert(math.abs(c) <= 1.0 + 1e-9)
      }
    }
  }

  test("supplier_share_shift: ordered by |shift|; shares replay") {
    val rows = run("supplier_share_shift")
    assert(rows.nonEmpty && rows.length <= 10)
    val shifts = rows.map(r => math.abs(r.getLong(5)))
    assert(shifts.zip(shifts.tail).forall { case (a, b) => a >= b },
      "descending by |shift|")
    rows.foreach { r =>
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3),
        "shift replays from the two shares")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000L)
    }
  }

  test("time_decay_revenue: decay never amplifies; orders conserved") {
    val rows = run("time_decay_revenue")
    assert(rows.length === Tables.nation(spark, sf()).count(),
      "one row per nation")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf()).count(), "orders partitioned by nation")
    rows.foreach { r =>
      val (raw, dec, share) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dec >= 0L && dec <= raw, "exp(ln½·age/90) ≤ 1 per order")
      assert(share >= 0L && share <= 1000000L)
      assert(share === dec * 1000000L / raw, "share replay")
      assert(share < 1000000L, "a multi-year corpus must decay")
    }
  }
}
