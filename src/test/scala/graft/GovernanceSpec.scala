package graft

/** Semantic pins for GovernanceOps (the DuckDB oracle hash-checks the
  * queries; these pin conservation laws, monotonicity, and bounds a
  * hash match can't name).
  */
class GovernanceSpec extends SparkSpec {
  private def run(key: String) =
    operators.GovernanceOps.queries(key)(spark, sf()).collect()

  test("k_anonymity_audit: rows conserve to the customer count; buckets disjoint") {
    val rows = run("k_anonymity_audit")
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    assert(rows.map(_.getLong(2)).sum ===
      Tables.customer(spark, sf()).count(), "every customer in one class")
    rows.foreach { r =>
      val (bucket, nCls, nRows, atRisk) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(nCls > 0 && nRows >= nCls)
      assert(atRisk === (bucket == "1" || bucket == "2-4"))
      if (bucket == "1") assert(nRows === nCls, "singleton classes")
    }
  }

  test("shard_balance_planner: shards partition the corpus contiguously and evenly") {
    val rows = run("shard_balance_planner").sortBy(_.getLong(0))
    val docs = Tables.documents(spark, sf())
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(2)).sum ===
      docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
        .collect()(0).getLong(0))
    // contiguity: shard ranges do not interleave
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.getLong(4) < b.getLong(3),
        "last_doc of shard i precedes first_doc of shard i+1")
      case _ =>
    }
    // balance: every shard within [0, 2/8] byte share (greedy cut bound:
    // a shard holds its target 1/8 plus at most one straddling doc)
    rows.foreach(r => assert(r.getLong(5) <= 250000,
      s"shard ${r.getLong(0)} exceeds 25% of corpus bytes"))
  }

  test("kaplan_meier_survival: at-risk ladder decreases; log-survival non-increasing") {
    val rows = run("kaplan_meier_survival")
    assert(rows.nonEmpty)
    val ts = rows.map(_.getLong(0))
    assert(ts.sorted.sameElements(ts) && ts.distinct.length === ts.length)
    // n_risk strictly decreases across death times
    val risks = rows.map(_.getLong(1))
    risks.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a > b, "at-risk count must shrink")
      case _ =>
    }
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)))
    // log S is non-increasing where defined (NULL only on a terminal
    // all-die row)
    val logs = rows.map(r => if (r.isNullAt(3)) None else Some(r.getLong(3)))
    logs.flatten.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "survival cannot increase")
      case _ =>
    }
    logs.zipWithIndex.foreach { case (v, i) =>
      if (v.isEmpty) assert(i === rows.length - 1,
        "NULL log-survival only at the terminal row")
    }
  }

  test("engagement_pipeline_e2e: funnel monotone; sessions conserve; rates replay") {
    val rows = run("engagement_pipeline_e2e")
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(0))
    assert(types.distinct.length === types.length &&
      types.sorted.sameElements(types))
    // stage totals conserve the sessionize_gap_batch session count
    val nSess = operators.EventAnalyticsOps
      .queries("sessionize_gap_batch")(spark, sf()).count()
    assert(rows.map(_.getLong(1)).sum === nSess,
      "every session claims exactly one entry type")
    rows.foreach { r =>
      val (n, gated, conv) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(conv <= gated && gated <= n, "funnel stages are monotone")
      if (gated == 0) {
        assert(r.isNullAt(4) && r.isNullAt(5), "rates NULL when no gated")
      } else {
        assert(r.getLong(4) === conv * 1000000L / gated, "conv rate replay")
        assert(r.getLong(5) >= 0L)
      }
    }
    // the gate bites somewhere and some conversion exists at sf0.001+
    assert(rows.map(_.getLong(2)).sum < nSess || nSess == 0,
      "the >=3-event gate must exclude at least one session")
  }

  test("session_sequence_rules: confidence >= support; bounded by 1e6; ordered") {
    val rows = run("session_sequence_rules")
    assert(rows.nonEmpty && rows.length <= 15)
    val counts = rows.map(_.getLong(2))
    assert(counts.sorted.reverse.sameElements(counts))
    rows.foreach { r =>
      val (a, b, supp, conf) =
        (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4))
      assert(a !== b, "a type cannot precede itself in the distinct set")
      assert(supp >= 0 && supp <= 1000000L)
      assert(conf >= supp, "antecedent sessions are a subset of all sessions")
      assert(conf <= 1000000L)
    }
  }

  test("nelson_aalen_hazard: monotone hazard + increment replay vs KM ladder") {
    val rows = run("nelson_aalen_hazard")
    assert(rows.nonEmpty)
    var prevT = -1L; var prevH = Long.MinValue; var prevS = Long.MaxValue
    var prevRisk = Long.MaxValue
    rows.foreach { r =>
      val (t, nRisk, d, h, sB) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(t > prevT, "death times strictly increase"); prevT = t
      assert(d >= 1 && d <= nRisk, "deaths bounded by the at-risk set")
      assert(nRisk <= prevRisk, "at-risk set shrinks"); prevRisk = nRisk
      assert(h >= prevH, "cumulative hazard is nondecreasing"); prevH = h
      assert(sB <= prevS, "Breslow survival is nonincreasing"); prevS = sB
      assert(sB >= 0L && sB <= 1000000L, "survival is a probability")
      assert(sB === math.floor(math.exp(-h / 1e9) * 1e6).toLong,
        "Breslow replay from the truncated cumulative")
    }
    // increment replay: consecutive output diffs equal this row's
    // d/n leaf (censor-only support rows contribute exactly 0)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val leaf = math.floor(
          b.getLong(2).toDouble / b.getLong(1) * 1e9).toLong
        assert(b.getLong(3) - a.getLong(3) === leaf, "hazard increment")
      case _ => ()
    }
  }

  test("logrank_test_arms: A/A split is unremarkable; accounting holds") {
    val Array(r) = run("logrank_test_arms")
    val (n0, n1, o1, e1, v1, chi2) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val users = Tables.events(spark, sf())
      .select("user_id").distinct().count()
    assert(n0 + n1 === users, "arms partition the user population")
    assert(n0 > 0 && n1 > 0, "md5 bit splits both ways")
    assert(o1 >= 0 && o1 <= n1, "observed deaths bounded by the arm")
    assert(e1 > 0L && v1 > 0L, "expected deaths and variance positive")
    // E1 cannot exceed total deaths (it allocates each death's mass)
    assert(e1 <= (o1 + n0) * 1000000L)
    // the arms are an A/A hash split of the same population: χ²₁
    // should be far below the p=0.001 line (10.8)
    assert(chi2 >= 0L && chi2 < 10800000L, s"A/A logrank chi2=$chi2")
  }

  test("l_diversity_audit: partition + entropy-bound laws") {
    val rows = run("l_diversity_audit")
    assert(rows.map(_.getLong(2)).sum ===
      Tables.customer(spark, sf()).count(),
      "customers partitioned by QI class")
    rows.foreach { r =>
      val (n, l, h) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(l >= 1 && l <= 5 && l <= n, "1 <= l <= |segments| and <= n")
      // uniform maximizes entropy: H <= ln l; leaf floors only lower it
      assert(h <= math.ceil(math.log(l.toDouble) * 1e9).toLong, "H <= ln l")
      assert(h >= 0L)
      assert((r.getLong(5) == 1L) === (l >= 3L), "distinct-l flag replay")
      assert((r.getLong(6) == 1L) === (h >= 1098612288L),
        "entropy flag replay against floor(ln(3)*1e9)")
      if (l == 1) assert(h === 0L, "single sensitive value => zero entropy")
    }
  }

  test("t_closeness_audit: TVD bounds, flag replay, BigInt group replay") {
    import org.apache.spark.sql.functions._
    val rows = operators.GovernanceOps
      .queries("t_closeness_audit")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val lRows = operators.GovernanceOps
      .queries("l_diversity_audit")(spark, sf()).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet ===
      lRows.map(r => (r.getString(0), r.getLong(1))).toSet,
      "same QI group set as l_diversity")
    rows.foreach { r =>
      val t = r.getLong(3)
      assert(t >= 0L && t <= 1000000L, "TVD lives in [0, 1]")
      assert((r.getLong(4) == 1L) === (t <= 200000L), "flag replay")
    }
    // independent BigInt replay of the largest group's TVD
    val cells = Tables.customer(spark, sf())
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").as("band"),
        col("c_mktsegment").as("seg"))
      .count().collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getString(2), x.getLong(3)))
    val nn: Long = cells.map(_._3).sum
    val segTot: Map[String, Long] =
      cells.groupBy(_._2).map { case (k, cs) => k -> cs.map(_._3).sum }
    val nations = Tables.nation(spark, sf())
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val target = rows.maxBy(_.getLong(2))
    val grpKey = cells.filter(c => nations(c._1._1) == target.getString(0)
      && c._1._2 == target.getLong(1))
    val nG = grpKey.map(_._3).sum
    assert(nG === target.getLong(2))
    val byKSeg: Map[String, Long] = grpKey.map(c => c._2 -> c._3).toMap
    val dev: BigInt = segTot.keys.map { s =>
      (BigInt(nn) * BigInt(byKSeg.getOrElse(s, 0L))
        - BigInt(nG) * BigInt(segTot(s))).abs
    }.sum
    assert(target.getLong(3) ===
      (dev * 1000000 / (2 * BigInt(nG) * nn)).toLong, "TVD replay")
  }

  test("rmst_survival: full Scala replay of the step-curve integral; bounds") {
    val Seq(row) = run("rmst_survival").toSeq
    val (tau, dTotal, nSteps, rmst) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nSteps >= 1 && dTotal >= nSteps, "each step has >= 1 death")
    assert(rmst > 0 && rmst <= tau * 1000000L,
      "RMST inside (0, tau] — survival is a sub-distribution")

    // independent replay: rebuild the KM ladder from raw events with
    // the same FLOOR'd leaves (Java libm == Spark's codegen math)
    import org.apache.spark.sql.functions._
    val u = Tables.events(spark, sf())
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts)")).as("f"),
        max(expr("unix_micros(ts)")).as("l"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val maxUs = u.map(_._2).max
    val durs = u.map { case (f, l) =>
      ((l - f) / 3600000000L, maxUs - l > 86400000000L) }
    val perT = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val nUsers = durs.length.toLong
    var cumAll = 0L; var logS = 0L
    case class Step(t: Long, d: Long, sPrev: Long, sCur: Long)
    val steps = perT.flatMap { case (t, d, cns) =>
      cumAll += d + cns
      val nRisk = nUsers - (cumAll - d - cns)
      val term = if (d > 0 && d < nRisk)
        math.floor(math.log((nRisk - d).toDouble / nRisk) * 1e6).toLong
      else 0L
      val prev = logS; logS += term
      if (d > 0) {
        def ef(x: Long) = math.floor(math.exp(x / 1e6) * 1e6).toLong
        Some(Step(t, d, ef(prev), if (d == nRisk) 0L else ef(logS)))
      } else None
    }
    val dTot = steps.map(_.d).sum
    assert(dTotal === dTot && nSteps === steps.length.toLong)
    var cumD = 0L
    val tauExp = steps.find { st => cumD += st.d; cumD * 4 >= dTot * 3 }.get.t
    assert(tau === tauExp, "rank-defined P75 death time")
    val loss = steps.filter(_.t < tauExp)
      .map(st => (st.sPrev - st.sCur) * (tauExp - st.t)).sum
    assert(rmst === tauExp * 1000000L - loss, "exact integral replay")
  }

  test("dp_laplace_count_release: deterministic inverse-CDF replay; release = n + noise") {
    val rows = operators.GovernanceOps
      .queries("dp_laplace_count_release")(spark, sf()).collect()
    assert(rows.nonEmpty && rows.length % 2 === 0, "two eps rows per source")
    rows.foreach { r =>
      val (src, eps, b, n, noise, released, within) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6))
      // driver-side inverse-CDF replay from the same md5 uniform
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp|$src|$eps".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val h = java.lang.Long.parseLong(hex, 16)
      val x2 = 2 * h + 1 - 16777216L
      val sgn = if (x2 >= 0) 1.0 else -1.0
      val exp = math.floor(-b.toDouble * sgn *
        math.log((16777216.0 - math.abs(x2)) / 16777216.0) * 1e6).toLong
      assert(noise === exp, s"$src/$eps noise replay")
      assert(released === n * 1000000L + noise, "release is exact once noised")
      assert(within === (math.abs(noise) <=
        math.floor(b.toDouble * math.log(200.0) * 1e6).toLong),
        "Laplace 99.5% tail verdict replays")
    }
    // scale law: eps=0.1 noise magnitudes are 10x the eps=1.0 QUANTILE
    // family (b=10 vs b=1); pointwise hashes differ, so check the mean
    val m01 = rows.filter(_.getString(1) == "eps_0.1")
      .map(r => math.abs(r.getLong(4))).sum
    val m10 = rows.filter(_.getString(1) == "eps_1.0")
      .map(r => math.abs(r.getLong(4))).sum
    assert(m01 > m10, "weaker privacy budget => more total noise")
  }

  test("right_to_erasure_audit: every maintained layout is clean of the delete set") {
    import org.apache.spark.sql.functions._
    val rows = operators.GovernanceOps
      .queries("right_to_erasure_audit")(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("1_minhash_signatures",
      "2_bm25_postings", "3_bm25_doclen", "4_ivf_serving",
      "5_phash_signatures", "6_knn_edges"),
      "all six serving layouts audited (r16 added phash + knn edges)")
    val nDocDel = Tables.documents(spark, sf())
      .filter(col("doc_id") % 10 === 7).count()
    val nVecDel = Tables.embeddings(spark, sf())
      .filter(col("vec_id") % 10 === 7).count()
    val nMediaDel = Tables.documents(spark, sf())
      .filter(col("doc_id") % 25 === 0 &&
        expr("(doc_id DIV 25) % 10") === 7).count()
    rows.foreach { r =>
      val expected = r.getString(0) match {
        case "4_ivf_serving" | "6_knn_edges" => nVecDel
        case "5_phash_signatures" => nMediaDel
        case _ => nDocDel
      }
      assert(r.getLong(1) === expected, s"${r.getString(0)} key count")
      assert(r.getLong(2) === 0L && r.getBoolean(3),
        s"${r.getString(0)} must be clean — a residual row is a leak")
    }
  }
}
