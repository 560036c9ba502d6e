package graft

/** Semantic pins for StorageLayoutOps: byte-accounting identities for
  * the dictionary estimator, block-count conservation for the
  * bit-pack histogram, and the layout-dominance law (a shipdate-sorted
  * layout can never skip FEWER blocks for a shipdate predicate than
  * the natural order).
  */
class StorageLayoutSpec extends SparkSpec {
  private def run(key: String) =
    operators.StorageLayoutOps.queries(key)(spark, sf()).collect()

  test("dict_encoding_gain: byte accounting replays per column") {
    val rows = run("dict_encoding_gain")
    assert(rows.length === 3)
    rows.foreach { r =>
      val (name, n, nd, raw, dict, gain) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nd >= 1 && nd <= n)
      assert(raw > 0 && dict > 0)
      // low-cardinality fixture columns must actually win
      assert(gain > 0, s"$name: dictionary should shrink $raw -> $dict")
      // gain replays from the byte counts (toward-zero division)
      assert(gain === (raw - dict) * 1000000L / raw)
    }
    val Array(evt) = rows.filter(_.getString(0) == "events.event_type")
    assert(evt.getLong(1) === Tables.events(spark, sf()).count())
    assert(evt.getLong(2) === 5, "five event types in the fixture")
  }

  test("delta_bitpack_estimate: delta count conservation; widths in 1..64") {
    val rows = run("delta_bitpack_estimate")
    assert(rows.nonEmpty)
    val nEvents = Tables.events(spark, sf()).count()
    val totalDeltas = rows.map(_.getLong(2)).sum
    assert(totalDeltas === nEvents - 1, "one delta per row after the first")
    rows.foreach { r =>
      val w = r.getLong(0)
      assert(w >= 1 && w <= 64)
    }
    val widths = rows.map(_.getLong(0))
    assert(widths.sorted.sameElements(widths) &&
      widths.distinct.length === widths.length)
  }

  test("minmax_prune_simulation: partition identity and layout dominance") {
    val rows = run("minmax_prune_simulation")
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nb, skip, full, part, ratio) =>
      assert(skip + full + part === nb, "every block classified once")
      assert(ratio === skip * 1000000L / nb)
    }
    // same block count across cut years within a layout
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).distinct.length === 1)
    }
    // dominance: for every cut year, the sorted layout skips at least
    // as many blocks as the natural order (min/max pruning is exactly
    // what sort clustering buys)
    val byCut = rows.groupBy(_._2)
    byCut.foreach { case (cy, g) =>
      val sorted = g.find(_._1 == "shipdate_sorted").get._4
      val natural = g.find(_._1 == "orderkey_sorted").get._4
      assert(sorted >= natural, s"cut $cy: sorted layout must dominate")
    }
  }
}
