package graft

/** Semantic pins for CurriculumOps: stage accounting + quality-envelope
  * monotonicity, flag-rate replay bounds, and the Gini range law.
  */
class CurriculumSpec extends SparkSpec {
  private def run(key: String) =
    operators.CurriculumOps.queries(key)(spark, sf()).collect()

  test("curriculum_stage_plan: stages partition docs, envelopes ascend") {
    val rows = run("curriculum_stage_plan").sortBy(_.getLong(0))
    assert(rows.length === 10)
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "every doc in one stage")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3)))
    // stages ascend by quality: stage k's max <= stage k+1's min
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"stage ${a.getLong(0)} overlaps ${b.getLong(0)}")
    }
  }

  test("blocklist_flag_rate: per-term counts bound the any-term flag") {
    val rows = run("blocklist_flag_rate")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val flagged = r.getLong(2)
      val perTerm = (3 to 7).map(r.getLong)
      assert(flagged <= n)
      assert(flagged <= perTerm.sum, "any-term <= sum of per-term")
      assert(flagged >= perTerm.max, "any-term >= max per-term")
      assert(r.getLong(8) === flagged * 1000000L / n)
    }
  }

  test("vocab_gini_by_source: G in [0, 1) and token accounting") {
    val rows = run("vocab_gini_by_source")
    assert(rows.nonEmpty)
    val totTokens = rows.map(_.getLong(2)).sum
    val direct = Tables.documents(spark, sf())
      .selectExpr("size(split(text, ' ')) AS n").collect()
      .map(_.getInt(0).toLong).sum
    assert(totTokens === direct, "token mass conserved across sources")
    rows.foreach { r =>
      val g = r.getLong(3)
      assert(g >= 0 && g < 1000000L, s"Gini in [0,1): $g")
      assert(r.getLong(1) <= r.getLong(2), "vocab <= tokens")
    }
  }
}
