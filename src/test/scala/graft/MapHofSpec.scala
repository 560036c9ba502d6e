package graft

/** Semantic pins for map_hof_ops: the map-derived scalars must agree
  * with direct aggregation of the same deduped entries (the map is a
  * faithful container, not a lossy one).
  */
class MapHofSpec extends SparkSpec {
  test("map_hof_ops: map-derived scalars replay from direct aggregation") {
    val rows = operators.ExtendedOps.queries("map_hof_ops")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    val direct = Tables.lineitem(spark, sf())
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(round(l_quantity) AS BIGINT) AS q")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val k = r.getLong(0)
      val lines = direct(k).groupBy(_._2)
        .map { case (ln, g) => ln -> g.map(_._3).sum }
      assert(r.getInt(1) === lines.size, s"n_lines at $k")
      assert(r.getInt(2) === lines.keys.max, s"max_line at $k")
      val q3 = lines.get(3)
      if (q3.isEmpty) assert(r.isNullAt(3) && r.isNullAt(5))
      else {
        assert(r.getLong(3) === q3.get)
        assert(r.getLong(5) === 2 * q3.get, "transform_values doubles")
      }
      assert(r.getLong(4) === lines.values.sum, s"total_qty at $k")
      assert(r.getInt(6) === lines.values.count(_ >= 30))
    }
  }
}
