package graft

/** Semantic pins for QualityOps (the oracle hash-checks the queries;
  * these pin the invariants a hash match can't name — scorecard
  * completeness, lift replay, temperature flattening, Heaps monotonicity).
  */
class QualitySpec extends SparkSpec {
  private def run(key: String) =
    operators.QualityOps.queries(key)(spark, sf()).collect()

  test("dq_rule_scorecard: 7 rules, consistent counts, exact pass rates") {
    val rows = run("dq_rule_scorecard")
    assert(rows.length === 7, "one row per declared rule")
    assert(rows.map(_.getString(0)).distinct.length === 7)
    val nLi = Tables.lineitem(spark, sf()).count()
    val nO = Tables.orders(spark, sf()).count()
    rows.foreach { r =>
      val (rule, checked, viol, rate) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(checked === (if (rule.startsWith("lineitem.")) nLi else nO),
        s"n_checked covers the whole table for $rule")
      assert(viol >= 0 && viol <= checked)
      assert(rate === (checked - viol) * 1000000L / checked,
        s"pass-rate replay for $rule")
    }
    // the fixture satisfies referential integrity and null-free shipdates
    val byRule = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byRule("lineitem.orderkey_in_orders") === 0L)
    assert(byRule("lineitem.shipdate_not_null") === 0L)
    assert(byRule("lineitem.quantity_in_1_50") === 0L)
  }

  test("market_basket_affinity: lift replays from co-order sets; ranked desc") {
    val rows = run("market_basket_affinity")
    assert(rows.length <= 20)
    val ob = Tables.lineitem(spark, sf())
      .join(Tables.part(spark, sf()),
        Tables.lineitem(spark, sf())("l_partkey") ===
          Tables.part(spark, sf())("p_partkey"))
      .select("l_orderkey", "p_brand").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // r10: N is the transaction-universe size — ALL orders, read from
    // footer stats in the operator — not just orders observed in the
    // joined basket stream
    val n = Tables.orders(spark, sf()).count()
    val nb = ob.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val pairCount = ob.groupBy(_._1).values.flatMap { es =>
      val bs = es.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val lifts = rows.map(_.getLong(3)).toSeq
    assert(lifts === lifts.sorted.reverse, "rows ranked by lift desc")
    rows.foreach { r =>
      val (b1, b2, c) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(b1 < b2, "oriented pair")
      assert(c === pairCount((b1, b2)), s"co-order count for ($b1,$b2)")
      val lift = (BigInt(c) * n * 1000000) / (BigInt(nb(b1)) * nb(b2))
      assert(r.getLong(3) === lift.toLong, s"lift replay for ($b1,$b2)")
    }
  }

  test("mixture_temperature_weights: weights normalize; temperature flattens") {
    val rows = run("mixture_temperature_weights")
    val srcMass = Tables.documents(spark, sf())
      .groupBy("source").sum("n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet === srcMass.keySet)
    rows.foreach(r => assert(r.getLong(2) === srcMass(r.getString(0))))
    // both fixed-point distributions sum to 1e6 up to |sources| floor ulps
    val rawSum = rows.map(_.getLong(3)).sum
    val tempSum = rows.map(_.getLong(4)).sum
    assert(rawSum > 1000000L - rows.length && rawSum <= 1000000L)
    assert(tempSum > 1000000L - rows.length && tempSum <= 1000000L)
    // τ<1 compresses the distribution toward uniform: the heaviest
    // source loses share, the lightest gains (strictly, unless the
    // distribution is exactly uniform)
    val byRaw = rows.sortBy(_.getLong(3))
    val (lo, hi) = (byRaw.head, byRaw.last)
    if (lo.getLong(3) != hi.getLong(3)) {
      assert(hi.getLong(4) < hi.getLong(3), "head source is down-weighted")
      assert(lo.getLong(4) > lo.getLong(3), "tail source is up-weighted")
    }
  }

  test("cross_source_contamination: oriented pairs, bounded containment") {
    val rows = operators.CurationOps
      .queries("cross_source_contamination")(spark, sf()).collect()
    val srcs = Tables.documents(spark, sf())
      .select("source").distinct().count().toInt
    assert(rows.length <= srcs * (srcs - 1) / 2, "at most the upper triangle")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "oriented pair")
      val (shared, t1, t2, cont) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(shared >= 1 && shared <= math.min(t1, t2),
        "shared shingles bounded by the smaller set")
      assert(cont === shared * 1000000L / math.min(t1, t2))
      assert(cont > 0 && cont <= 1000000L)
    }
    // symmetry of the underlying measure: (s1,s2) appears at most once
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      === rows.length)
  }

  test("embedding_centroid_drift: weighted drift identity over labels") {
    val rows = operators.TrainingDataOps
      .queries("embedding_centroid_drift")(spark, sf()).collect()
    val total = Tables.embeddings(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum === total, "labels partition the vectors")
    assert(rows.forall(_.getLong(2) >= 0), "squared distance is non-negative")
    // replay one label's drift from first principles
    val vecs = Tables.embeddings(spark, sf())
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val dims = vecs.head._2.length
    val fx = vecs.map { case (l, v) =>
      (l, v.map(x => (x.toDouble * 1e6).toLong))
    }
    val labels = fx.map(_._1).distinct.sorted
    val gSum = Array.ofDim[BigInt](dims).map(_ => BigInt(0))
    fx.foreach { case (_, v) =>
      (0 until dims).foreach(i => gSum(i) += v(i))
    }
    val nG = fx.length
    val expected = labels.map { l =>
      val vs = fx.filter(_._1 == l)
      val nL = vs.length
      val drift = (0 until dims).map { i =>
        val sL = vs.map(v => BigInt(v._2(i))).sum
        val mu = sL.toDouble / nL - gSum(i).toDouble / nG
        math.floor(mu * mu / 1000.0).toLong
      }.sum
      l -> drift
    }.toMap
    rows.foreach(r =>
      assert(r.getLong(2) === expected(r.getInt(0)),
        s"drift replay for label ${r.getInt(0)}"))
  }

  test("heaps_law_vocab_growth: dense deciles, exact cumulative vocabulary") {
    val rows = run("heaps_law_vocab_growth")
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length),
      "deciles are dense from 1")
    val cum = rows.map(_.getLong(2)).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_.getLong(3)).toSeq === cum,
      "vocab_size is the running sum of new_words")
    assert(rows.map(_.getLong(3)).toSeq === rows.map(_.getLong(3)).sorted,
      "vocabulary never shrinks")
    // the curve ends at the true distinct-shingle count
    val total = Tables.documents(spark, sf())
      .selectExpr("split(text, ' ') AS ws")
      .where("size(ws) >= 3")
      .selectExpr("explode(array_distinct(transform(sequence(1, size(ws) - 2)," +
        " i -> concat_ws(' ', slice(ws, i, 3))))) AS w")
      .select("w").distinct().count()
    assert(rows.last.getLong(3) === total, "final vocab = corpus shingle count")
    val nd = Tables.documents(spark, sf()).count()
    rows.foreach(r => assert(r.getLong(1) === nd * r.getLong(0) / 10))
  }

  test("curation_pipeline_e2e: funnel is monotone, stages bite, shares normalize") {
    val df = operators.CurationOps
      .queries("curation_pipeline_e2e")(spark, sf())
    val rows = df.collect()
    // the funnel taps reference the gate→dedup chain from four
    // consumers; at runtime AQE must REUSE those exchanges, not
    // re-execute the corpus subplan per tap (the no-materialization-
    // cliff claim of SURVEY §2.K Q5)
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "diamond subplans re-executed — AQE exchange reuse did not fire")
    assert(rows.nonEmpty, "one funnel row per source")
    rows.foreach { r =>
      val (nRaw, nGate, nDedup, nClean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nRaw >= nGate && nGate >= nDedup && nDedup >= nClean &&
        nClean >= 0, s"funnel not monotone for ${r.getString(0)}")
    }
    // the corpus totals must shrink at the gate (a p95 cap always cuts
    // the tail) and at decontamination (the eval slice alone guarantees
    // removals) — a stage that never fires is silently disconnected
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum > 0,
      "quality gate dropped nothing corpus-wide")
    assert(rows.map(r => r.getLong(3) - r.getLong(4)).sum > 0,
      "decontamination + eval-slice removal dropped nothing corpus-wide")
    // floored fixed-point shares: sum in (1e6 - #sources, 1e6]
    val shareSum = rows.map(_.getLong(7)).sum
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L,
      s"share_fp sum $shareSum outside the floored-normalization window")
  }
}
