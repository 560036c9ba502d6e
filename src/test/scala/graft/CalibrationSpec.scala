package graft

import org.apache.spark.sql.functions.col

/** Semantic pins for CalibrationOps — conservation, monotone tuning
  * curves, and percentile-rank bounds the oracle hash can't name.
  */
class CalibrationSpec extends SparkSpec {
  private def run(key: String) =
    operators.CalibrationOps.queries(key)(spark, sf()).collect()

  test("lang_confusion_matrix: cells conserve the corpus; shares sum per row") {
    val rows = run("lang_confusion_matrix")
    assert(rows.map(_.getLong(2)).sum ===
      Tables.documents(spark, sf()).count(), "every doc lands in one cell")
    rows.foreach { r =>
      assert(r.getBoolean(5) === (r.getString(0) == r.getString(1)))
      assert(r.getLong(2) <= r.getLong(3))
    }
    // per-stored-lang: cell counts sum to the row total, shares to ~1e6
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      val total = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum === total)
      val shareSum = cells.map(_.getLong(4)).sum
      assert(shareSum > 1000000L - cells.length && shareSum <= 1000000L,
        "floor-truncated shares sum to 1e6 within per-cell slack")
    }
  }

  test("dedup_threshold_sweep: yields decrease monotonically in the threshold") {
    val rows = run("dedup_threshold_sweep")
    assert(rows.nonEmpty && rows.length <= 5)
    val ths = rows.map(_.getLong(0))
    assert(ths.sorted.sameElements(ths))
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getLong(1) >= b.getLong(1), "pair yield non-increasing")
        assert(a.getLong(2) >= b.getLong(2), "doc yield non-increasing")
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(2) <= 2 * r.getLong(1),
      "a pair touches at most two docs"))
  }

  test("column_entropy_profile: four columns, entropy within [0, ln(n_values)]") {
    val rows = run("column_entropy_profile")
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq(
      "customer.c_mktsegment", "documents.lang", "documents.source",
      "events.event_type"))
    val counts = Map(
      "events.event_type" -> Tables.events(spark, sf()).count(),
      "documents.lang" -> Tables.documents(spark, sf()).count(),
      "documents.source" -> Tables.documents(spark, sf()).count(),
      "customer.c_mktsegment" -> Tables.customer(spark, sf()).count())
    rows.foreach { r =>
      val (cn, n, nv, h) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === counts(cn), s"row count for $cn")
      assert(nv >= 1 && nv <= n)
      // each -p ln p term is >= 0 after negation (FLOOR only adds mass),
      // and H <= ln(n_values) + per-term slack
      assert(h >= 0, s"entropy must be non-negative for $cn")
      assert(h <= math.floor(math.log(nv.toDouble) * 1e9).toLong + nv,
        s"entropy bounded by ln(n_values) for $cn")
    }
  }

  test("percentile_rank_normalize: bounds, coverage, and in-type monotonicity") {
    val rows = run("percentile_rank_normalize")
    assert(rows.length === Tables.events(spark, sf()).count())
    rows.foreach(r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
    rows.groupBy(_.getString(1)).foreach { case (t, rs) =>
      if (rs.length >= 2) {
        assert(rs.map(_.getLong(3)).min === 0L, s"min pct for $t")
        assert(rs.map(_.getLong(3)).max === 1000000L, s"max pct for $t")
        // pct ordering agrees with value ordering (ties broken by id)
        val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
        val pcts = sorted.map(_.getLong(3))
        assert(pcts.toSeq === pcts.sorted.toSeq, s"monotone pct for $t")
      }
    }
  }

  test("quantile_normalize_doclen: ECDF mapping laws") {
    val rows = run("quantile_normalize_doclen")
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === docs.size, "every doc normalized")
    val corpus = docs.values.toSeq.sorted
    rows.foreach { r =>
      assert(corpus.contains(r.getLong(3)),
        "normalized value drawn from the corpus distribution")
    }
    // within each source the mapping is monotone in the raw value
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(0)))
      val qns = sorted.map(_.getLong(3))
      assert(qns.toSeq === qns.sorted.toSeq, s"$src mapping not monotone")
      // the source's longest doc maps to the corpus maximum
      assert(qns.last === corpus.last, s"$src top rank → corpus max")
    }
  }

  test("langid_calibration_ece: coverage, bounds, and the weighted-ECE identity") {
    val rows = run("langid_calibration_ece")
    assert(rows.nonEmpty)
    val covered = operators.TrainingDataOps.queries("lang_id_ngram")(
        spark, sf())
      .filter(col("lang_pred") =!= "unknown").count()
    assert(rows.map(_.getLong(1)).sum === covered,
      "bins partition the confidently-predicted docs")
    rows.foreach { r =>
      val (bin, n, conf, acc, gap) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0 && bin <= 9)
      assert(n > 0)
      // smoothed confidence (best+1)/(Σ+4) lives in (0.25, 1)
      assert(conf > 250000 && conf < 1000000, s"bin $bin conf $conf")
      assert(acc >= 0 && acc <= 1000000)
      assert(gap === math.abs(conf - acc))
      // bin membership: mean confidence falls in its own bin (value-
      // fixed bins + means of members)
      assert(conf / 100000 === bin.toLong || (bin == 9 && conf >= 900000))
    }
    val eces = rows.map(_.getLong(5)).distinct
    assert(eces.length === 1, "ECE constant across rows")
    val expect = rows.map(r => r.getLong(1) * r.getLong(4)).sum /
      rows.map(_.getLong(1)).sum
    assert(eces.head === expect, "ECE = Σ n·gap / N")
  }

  test("eb_shrinkage_rates: shrinkage pulls toward the prior mean") {
    val rows = run("eb_shrinkage_rates")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.lineitem(spark, sf()).count(), "lines partitioned by brand")
    val pbar = rows.map(_.getLong(3)).sum / rows.length
    rows.foreach { r =>
      val (n, k, raw, shrunk) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(k <= n)
      assert(raw === k * 1000000L / n, "raw rate replay")
      assert(shrunk >= 0L && shrunk <= 1000000L)
      // posterior mean lies between the raw rate and the prior mean
      // (within 1 fp of each end for floor truncation)
      assert(shrunk >= math.min(raw, pbar) - 1 &&
        shrunk <= math.max(raw, pbar) + 1,
        s"${r.getString(0)}: $shrunk outside [$raw, $pbar]")
      // strict contraction for any brand away from the mean
      if (math.abs(raw - pbar) > 1000)
        assert(math.abs(shrunk - pbar) < math.abs(raw - pbar),
          s"${r.getString(0)}: no contraction")
    }
  }

  test("bowker_symmetry_langid: transpose-pair replay; chi2 >= 0") {
    val rows = run("bowker_symmetry_langid")
    assert(rows.length === 1)
    val r = rows.head
    val cm = run("lang_confusion_matrix").map(m =>
      ((m.getString(0), m.getString(1)), m.getLong(2))).toMap
    val langs = cm.keySet.flatMap(k => Seq(k._1, k._2)).toSeq.sorted
    val terms = for {
      i <- langs; j <- langs if i < j
      a = cm.getOrElse((i, j), 0L); b = cm.getOrElse((j, i), 0L)
      if a + b > 0
    } yield (a - b) * (a - b) * 1000000L / (a + b)
    assert(r.getLong(0) === terms.length.toLong, "dof = discordant pairs")
    if (terms.nonEmpty) {
      assert(r.getLong(1) === terms.sum, "exact per-pair rationals")
      assert(r.getLong(1) >= 0L)
    } else assert(r.isNullAt(1))
  }

  test("mcc_langid: moments reconcile with the confusion matrix; |MCC| <= 1") {
    val rows = run("mcc_langid")
    assert(rows.length === 1)
    val r = rows.head
    val cm = run("lang_confusion_matrix").map(m =>
      (m.getString(0), m.getString(1), m.getLong(2)))
    val sTot = cm.map(_._3).sum
    val c = cm.filter(t => t._1 == t._2).map(_._3).sum
    val tk = cm.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pk = cm.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val langs = (tk.keySet ++ pk.keySet).toSeq
    val sumPt = langs.map(l =>
      tk.getOrElse(l, 0L) * pk.getOrElse(l, 0L)).sum
    val sumT2 = langs.map(l => math.pow(tk.getOrElse(l, 0L).toDouble, 2))
      .sum.toLong
    val sumP2 = langs.map(l => math.pow(pk.getOrElse(l, 0L).toDouble, 2))
      .sum.toLong
    assert(r.getLong(0) === sTot && r.getLong(1) === c)
    assert(r.getLong(2) === sumPt && r.getLong(3) === sumT2
      && r.getLong(4) === sumP2, "margins reconcile")
    if (sTot * sTot - sumT2 > 0 && sTot * sTot - sumP2 > 0) {
      val exp = BigDecimal((c.toDouble * sTot - sumPt.toDouble) /
        (math.sqrt(sTot.toDouble * sTot - sumP2.toDouble) *
         math.sqrt(sTot.toDouble * sTot - sumT2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - exp) < 1e-6, "R_K leaf replay")
      assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9, "|MCC| <= 1")
    } else assert(r.isNullAt(5))
  }
}
