package graft

import org.apache.spark.sql.Row

/** Semantic pins for LangModelOps and StatOps (round-5 widening). The
  * DuckDB oracle hash-checks these queries; the tests here pin the
  * properties a hash match can't name — score monotonicity, blocking
  * soundness, full-outer completeness, statistical invariants.
  */
class LangModelSpec extends SparkSpec {
  private def runL(key: String) =
    operators.LangModelOps.queries(key)(spark, sf()).collect()
  private def runS(key: String) =
    operators.StatOps.queries(key)(spark, sf()).collect()

  test("bigram_lm_perplexity ranks 20 docs by non-increasing positive NLL") {
    val rows = runL("bigram_lm_perplexity")
    assert(rows.length === 20)
    assert(rows.map(_.getLong(0)).distinct.length === 20)
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores === scores.sorted.reverse, "avg NLL must be non-increasing")
    // add-one smoothing keeps every P(w2|w1) < 1 => NLL strictly positive
    assert(scores.forall(_ > 0))
    assert(rows.forall(_.getLong(1) >= 1), "every ranked doc has bigrams")
  }

  test("bpe_top_pairs yields 2-char pairs with non-increasing weighted counts") {
    val rows = runL("bpe_top_pairs")
    assert(rows.length === 20)
    assert(rows.forall(_.getString(0).length === 2))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse)
    assert(counts.forall(_ > 0))
  }

  test("bpe_apply_encode: lossless per word, merge fixpoint reached, merges used") {
    val rows = runL("bpe_apply_encode")
    // the word dictionary, re-derived on the driver
    val vocab = Tables.documents(spark, sf())
      .select("text").collect()
      .flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    assert(rows.length === vocab.size, "one output row per distinct word")
    // the mined merge table the operator applied (same ordering rule)
    val merges = vocab.toSeq
      .flatMap { case (w, c) => w.sliding(2).filter(_.length == 2).map(_ -> c) }
      .groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).sum }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(8).map(_._1).toSet
    var multiCharTokens = 0
    rows.foreach { case Row(word: String, freq: Long, n: Int, tokens: String) =>
      assert(freq === vocab(word), s"word $word frequency")
      val ts = tokens.split(" ")
      assert(ts.length === n, s"word $word n_tokens consistent with tokens")
      assert(ts.mkString === word, s"word $word: encoding must be lossless")
      // fixpoint: no adjacent token pair is itself a mined merge
      ts.sliding(2).filter(_.length == 2).foreach { ab =>
        assert(!merges.contains(ab(0) + ab(1)) ||
            ab(0).length > 1 || ab(1).length > 1,
          s"word $word: adjacent char pair ${ab.mkString} is an unapplied merge")
      }
      multiCharTokens += ts.count(_.length > 1)
    }
    assert(multiCharTokens > 0, "the merge table must actually merge something")
  }

  test("fuzzy_pairs_blocked: pairs share a block, lev <= 3, multiplicity > 0") {
    val rows = runL("fuzzy_pairs_blocked")
    assert(rows.nonEmpty)
    rows.foreach { case Row(blk: String, n1: String, n2: String, lev: Int, np: Long) =>
      assert(n1 <= n2)
      assert(n1.endsWith(blk) && n2.endsWith(blk), "blocking key is the head noun")
      assert(lev >= 0 && lev <= 3)
      assert(lev == 0 == (n1 == n2), "lev 0 iff identical (diagonal) name")
      assert(np > 0, "diagonal pairs require a repeated name")
    }
  }

  test("cooc_triangle_count: triangles bounded by oriented-edge composition") {
    val Array(Row(edges: Long, tris: Long)) = runL("cooc_triangle_count")
    assert(edges > 0, "fixture vocabulary co-occurs above threshold")
    assert(tris >= 0 && tris <= edges.toLong * edges, "loose wedge bound")
    // every triangle consumes 3 oriented edges; a graph with e edges has
    // at most C(e over ...) — cheap necessary condition: tris <= e^1.5+1
    assert(tris <= math.pow(edges.toDouble, 1.5).toLong + 1,
      "triangle count exceeds the e^{3/2} extremal bound")
  }

  test("cooc_triangle_count df-cap: lossless vs an uncapped replay; candidate volume reduced") {
    val Array(Row(edges: Long, tris: Long)) = runL("cooc_triangle_count")
    // driver replay WITHOUT the cap: exact pair document-counts over every
    // distinct term — the O(L²) build the cap replaces must yield the
    // same edge set, because an edge needs ndoc >= 0.4·nd and
    // ndoc <= min(df(u), df(v)) makes the term-level filter lossless
    val docsW = Tables.documents(spark, sf()).select("text").collect()
      .map(_.getString(0).split(" ", -1).distinct.sorted)
    val nd = docsW.length
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Int]()
    docsW.foreach { ws =>
      var i = 0
      while (i < ws.length) {
        var j = i + 1
        while (j < ws.length) {
          val k = (ws(i), ws(j))
          pairCounts.update(k, pairCounts.getOrElse(k, 0) + 1)
          j += 1
        }
        i += 1
      }
    }
    // NB: .filter + .keySet, not .collect { case (p, c) => p } — a
    // pair-producing collect on a Map rebuilds a MAP and silently
    // collapses edges sharing a left endpoint
    val exactEdges = pairCounts
      .filter { case (_, c) => c * 5 >= nd * 2 }.keySet.toSet
    assert(edges === exactEdges.size.toLong,
      "df-cap must be lossless on the edge set")
    val bySrc = exactEdges.groupBy(_._1)
    var t = 0L
    exactEdges.foreach { case (u, v) =>
      bySrc.getOrElse(v, Set.empty).foreach { case (_, w2) =>
        if (exactEdges.contains((u, w2))) t += 1
      }
    }
    assert(tris === t, "df-cap must be lossless on the triangle count")
    // the promised scale bound: per-doc pairs run over the df-qualified
    // vocabulary only, and that vocabulary is corpus-bounded
    val dfm = docsW.flatten.groupBy(identity).map { case (w, o) => w -> o.length }
    val hot = dfm.collect { case (w, c) if c * 5 >= nd * 2 => w }.toSet
    val capped = docsW.map { ws =>
      val h = ws.count(hot); h.toLong * (h - 1) / 2
    }.sum
    val uncapped = docsW.map(ws => ws.length.toLong * (ws.length - 1) / 2).sum
    assert(capped < uncapped,
      s"the cap must shrink candidate volume (capped=$capped uncapped=$uncapped)")
    assert(hot.size.toLong * 2 * nd <= 5L * dfm.values.map(_.toLong).sum,
      "qualified vocabulary exceeds the Σdf/(0.4·nd) envelope")
  }

  test("pmi_cooc_topk: fixed-point PMI replays from the edge counts, ranked desc") {
    val rows = runL("pmi_cooc_topk")
    assert(rows.length === 30)
    val nd = Tables.documents(spark, sf()).count()
    val fps = rows.map(_.getLong(5)).toSeq
    assert(fps === fps.sorted.reverse, "rows ranked by PMI")
    rows.foreach { r =>
      val (u, v) = (r.getString(0), r.getString(1))
      val (ndoc, dfu, dfv, fp) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(u < v, "edges oriented u < v")
      assert(ndoc * 5 >= nd * 2, "edge passes the df threshold")
      assert(ndoc <= math.min(dfu, dfv), "pair count bounded by each df")
      val expected = math.floor(
        math.log(ndoc.toDouble * nd / (dfu.toDouble * dfv)) * 1e6).toLong
      assert(fp === expected, s"PMI replay mismatch for ($u,$v)")
    }
  }

  test("oov_rate_by_source partitions the token stream; OOV = below-cutoff vocabulary") {
    val rows = runL("oov_rate_by_source")
    val toks = Tables.documents(spark, sf()).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
    val tot = toks.length.toLong
    val vocab = toks.groupBy(_._2).collect {
      case (w, os) if os.length.toLong * 32 >= tot => w
    }.toSet
    val bySrc = toks.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val st = bySrc(r.getString(0))
      assert(r.getLong(1) === st.length.toLong, "token count per source")
      assert(r.getLong(2) === st.count(t => !vocab(t._2)).toLong,
        "OOV tokens are exactly those outside the cutoff vocabulary")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
    assert(rows.map(_.getLong(1)).sum === tot,
      "per-source token counts partition the corpus")
    assert(rows.exists(_.getLong(2) > 0), "fixture corpus has OOV mass")
  }

  test("lexical_diversity_by_source replays as exact type/token/hapax counts") {
    val rows = runL("lexical_diversity_by_source")
    val toks = Tables.documents(spark, sf()).select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
    val bySrc = toks.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val freq = bySrc(r.getString(0)).groupBy(_._2).map {
        case (w, os) => w -> os.length.toLong
      }
      val (nTok, nTyp, nHap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTok === freq.values.sum)
      assert(nTyp === freq.size.toLong)
      assert(nHap === freq.values.count(_ == 1L).toLong)
      assert(r.getLong(4) === nTyp * 1000000L / nTok)
      assert(r.getLong(5) === nHap * 1000000L / nTyp)
      assert(nHap <= nTyp && nTyp <= nTok, "count hierarchy")
    }
  }

  test("mad_robust_outliers: rank-defined median/MAD replay; outliers exact") {
    val rows = runS("mad_robust_outliers")
    val ev = Tables.events(spark, sf()).select("event_type", "value").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    assert(rows.map(_.getString(0)).toSet === ev.map(_._1).toSet)
    rows.foreach { r =>
      val cents = ev.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) === cents.length.toLong)
      def rankPick(xs: Array[Long]): Long = {
        val s = xs.sorted
        s(math.ceil(s.length * 0.5).toInt - 1)
      }
      val med = rankPick(cents)
      val mad = rankPick(cents.map(c => math.abs(c - med)))
      assert(r.getLong(2) === med, s"median for ${r.getString(0)}")
      assert(r.getLong(3) === mad, s"MAD for ${r.getString(0)}")
      assert(r.getLong(4) ===
        cents.count(c => math.abs(c - med) > 3 * mad).toLong)
      assert(r.getLong(4) < cents.length / 2,
        "MAD's 0.5 breakdown point: outliers are a strict minority")
    }
  }

  test("interarrival_burstiness: exact BigInt moment replay; Poisson-adjacent CV²") {
    val rows = runS("interarrival_burstiness")
    val ev = Tables.events(spark, sf())
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._2, e._3))
      o.drop(1).zip(o).map { case (cur, prev) => (cur._4, cur._2 - prev._2) }
    }.toSeq
    val byType = gaps.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val gs = byType(r.getString(0)).map(_._2)
      val n = gs.length.toLong
      val sx = gs.map(BigInt(_)).sum
      val sxx = gs.map(g => BigInt(g) * BigInt(g)).sum
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === (sx / n).toLong, "integer mean gap")
      val cv2 = math.floor((n.toDouble * sxx.toDouble / sx.toDouble / sx.toDouble
        - 1.0) * 1000000).toLong
      assert(r.getLong(3) === cv2, s"CV² replay for ${r.getString(0)}")
      // uniform-random arrival fixture: CV² within a loose Poisson band
      assert(r.getLong(3) > 500000L && r.getLong(3) < 2000000L)
    }
  }

  test("benford_first_digit_audit: digits partition positive values; replay exact") {
    val rows = runS("benford_first_digit_audit")
    val cents = Tables.events(spark, sf())
      .selectExpr("CAST(round(value * 100) AS BIGINT) AS c").collect()
      .map(_.getLong(0)).filter(_ > 0)
    val counts = cents.groupBy(c => c.toString.head.asDigit.toLong)
      .map { case (dg, xs) => dg -> xs.length.toLong }
    val n = cents.length.toLong
    assert(rows.map(_.getLong(0)).toSet === counts.keySet)
    assert(rows.map(_.getLong(1)).sum === n,
      "digit counts partition the positive values")
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(d >= 1 && d <= 9)
      assert(r.getLong(1) === counts(d))
      assert(r.getLong(2) === counts(d) * 1000000L / n)
      assert(r.getLong(3) ===
        math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1000000).toLong)
    }
    // Benford expectations are a fixed distribution summing to ~1
    assert(math.abs(rows.map(_.getLong(3)).sum - 1000000L) < 10L)
  }

  test("zipf_rank_frequency: exact moment replay; slope strictly negative") {
    val Array(r) = runL("zipf_rank_frequency")
    val freqs = Tables.documents(spark, sf())
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
    val top = freqs.toSeq.sortBy { case (w, f) => (-f, w) }.take(1000)
    val pts = top.zipWithIndex.map { case ((_, f), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1000000).toLong,
        math.floor(math.log(f.toDouble) * 1000000).toLong)
    }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val slopeNeg = (sx * sy - n * sxy) * 1000000 / (n * sxx - sx * sx)
    assert(r.getLong(0) === pts.length.toLong)
    assert(r.getLong(1) === top.map(t => BigInt(t._2)).sum.toLong)
    assert(r.getLong(2) === slopeNeg.toLong, "normal-equation replay")
    assert(r.getLong(2) > 0, "Zipfian text slopes negative (negated > 0)")
  }

  test("hhi_supplier_concentration: bounds and single-supplier degenerate case") {
    val rows = runS("hhi_supplier_concentration")
    // every nation with a supplier that shipped something appears once
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val ns = r.getLong(1)
      val hhi = r.getLong(2)
      // HHI is bounded below by the uniform allocation 10^4/n and above
      // by the single-supplier monopoly 10^4 (integer floor may shave
      // at most 1 off the lower bound)
      assert(hhi <= 10000L, s"HHI above monopoly for ${r.getString(0)}")
      assert(hhi >= 10000L / ns - 1, s"HHI below uniform for ${r.getString(0)}")
      if (ns == 1) assert(hhi === 10000L, "monopoly nation scores exactly 10^4")
    }
  }

  test("event_value_percentile_grid: monotone grid, quantiles bracket data") {
    val rows = runS("event_value_percentile_grid")
    val ev = Tables.events(spark, sf())
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val cents = byType(r.getString(0)).map(_._2).sorted
      assert(r.getLong(1) === cents.length.toLong)
      val grid = (2 to 6).map(r.getLong)
      assert(grid === grid.sorted, "percentiles are monotone")
      val qs = Seq(0.10, 0.25, 0.50, 0.75, 0.90)
      grid.zip(qs).foreach { case (v, q) =>
        assert(v === cents(math.ceil(cents.length * q).toInt - 1),
          s"rank-defined p$q for ${r.getString(0)}")
      }
      assert(grid.head >= cents.min && grid.last <= cents.max)
    }
  }

  test("doc_length_quality_corr: exact moment replay; r in [0, 1e6]") {
    val Array(r) = runS("doc_length_quality_corr")
    val xs = Tables.documents(spark, sf())
      .select("text").collect().map { row =>
        val ws = row.getString(0).split(" ", -1)
        (ws.length.toLong, ws.distinct.length.toLong)
      }
    val n = xs.length.toLong
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val expected = math.floor(
      (n.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
          math.sqrt(n.toDouble * syy - sy.toDouble * sy)) * 1000000).toLong
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === expected, "Pearson moment replay")
    assert(r.getLong(1) >= -1000000L && r.getLong(1) <= 1000000L)
  }

  test("rolling_zscore_outliers only flags |z| >= 2 on full windows") {
    val rows = runS("rolling_zscore_outliers")
    assert(rows.nonEmpty, "planted variance yields at least one outlier")
    rows.foreach { r => assert(math.abs(r.getLong(3)) >= 20000) }
  }

  test("ols_trend_fixed returns 25 customers with non-increasing slopes") {
    val rows = runS("ols_trend_fixed")
    assert(rows.length === 25)
    assert(rows.map(_.getLong(1)).forall(_ >= 8), "min-support filter")
    val slopes = rows.map(_.getLong(2)).toSeq
    assert(slopes === slopes.sorted.reverse)
  }

  test("tokenizer_vocab_coverage conserves occurrences vs the encoded dictionary") {
    val enc = runL("bpe_apply_encode") // word, freq, n_tokens, tokens
    val totalTok = enc.map(r => r.getLong(1) * r.getInt(2)).sum
    // unlimited per-token aggregation re-derived on the driver
    val perTokOcc = enc
      .flatMap(r => r.getString(3).split(" ").map(t => t -> r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val perTokWords = enc
      .flatMap(r => r.getString(3).split(" ").distinct.map(t => t -> r.getString(0)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.length.toLong }
    val rows = runL("tokenizer_vocab_coverage")
    assert(rows.length === math.min(30, perTokOcc.size))
    rows.foreach { r =>
      val tok = r.getString(0)
      assert(r.getInt(1) === tok.length)
      assert(r.getLong(2) === perTokWords(tok), s"n_words mismatch for '$tok'")
      assert(r.getLong(3) === perTokOcc(tok), s"occurrences mismatch for '$tok'")
      assert(r.getLong(4) === r.getLong(3) * 1000000L / totalTok,
        s"share must divide by TOTAL token occurrences, not the top-30's")
    }
    val occs = rows.map(_.getLong(3)).toSeq
    assert(occs === occs.sorted.reverse, "rows ranked by occurrences")
  }

  test("typed_cogroup_reconcile is full-outer complete and exact") {
    val rows = runS("typed_cogroup_reconcile")
    val orders = Tables.orders(spark, sf()).select("o_orderkey")
      .distinct().count()
    val lineKeys = Tables.lineitem(spark, sf()).select("l_orderkey")
      .distinct().count()
    assert(rows.length >= orders && rows.length >= lineKeys,
      "cogroup must cover every key from both sides")
    val withOrder = rows.count(!_.isNullAt(3))
    assert(withOrder === orders, "exactly the order rows carry total_fp")
    rows.filter(_.getLong(1) == 0).foreach(r =>
      assert(r.getLong(2) === 0L, "childless orders have zero gross"))
  }

  test("cross_entropy_by_source: NLL bounds and bigram-mass conservation") {
    val rows = runL("cross_entropy_by_source")
    val expected = Tables.documents(spark, sf())
      .select("text").collect()
      .map(_.getString(0).split(" ").length.toLong - 1).filter(_ >= 1).sum
    assert(rows.map(_.getLong(1)).sum === expected,
      "per-source bigram counts partition the corpus bigram stream")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) >= 0, "add-one smoothing keeps NLL >= 0")
    }
    val srcs = rows.map(_.getString(0))
    assert(srcs.distinct.length === srcs.length)
  }

  test("doremi_excess_loss_reweight: weights normalize; order tracks excess") {
    val rows = runL("doremi_excess_loss_reweight")
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getLong(4)).sum
    assert(wSum > 1000000L - rows.length && wSum <= 1000000L,
      "floor-truncated weights sum to 1e6 within per-source slack")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 4000000L, "excess capped")
      assert(r.getLong(4) >= 0)
    }
    // a strictly larger excess must never get a smaller weight
    for (a <- rows; b <- rows if a.getLong(3) > b.getLong(3))
      assert(a.getLong(4) >= b.getLong(4),
        s"monotone upweight: ${a.getString(0)} vs ${b.getString(0)}")
    // zero-excess sources share the minimum weight
    val zero = rows.filter(_.getLong(3) == 0L).map(_.getLong(4))
    if (zero.nonEmpty) assert(zero.max === rows.map(_.getLong(4)).min ||
      zero.min === rows.map(_.getLong(4)).min)
  }

  test("vocab_coverage_curve: monotone coverage, mass bounds") {
    val rows = runL("vocab_coverage_curve")
    assert(rows.nonEmpty && rows.length <= 3)
    val cuts = rows.map(_.getLong(0))
    assert(cuts.sorted.sameElements(cuts))
    assert(cuts.toSet.subsetOf(Set(10L, 100L, 1000L)))
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "cumulative mass <= total")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
      assert(r.getLong(3) === r.getLong(1) * 1000000L / r.getLong(2))
    }
    rows.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.getLong(1) <= b.getLong(1), "coverage grows with cutoff")
      case _ =>
    }
  }

  test("tokenizer_fertility_by_lang replays from the encoded dictionary") {
    val enc = runL("bpe_apply_encode") // word, freq, n_tokens, tokens
      .map(r => r.getString(0) -> r.getInt(2).toLong).toMap
    val lwc = Tables.documents(spark, sf())
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(w => (r.getString(0), w)))
      .filter { case (_, w) => enc.contains(w) }
      .groupBy(_._1)
    val rows = runL("tokenizer_fertility_by_lang")
    assert(rows.map(_.getString(0)).toSet === lwc.keySet)
    rows.foreach { r =>
      val (lang, nWords, nTok, fert) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val words = lwc(lang)
      assert(nWords === words.length.toLong, s"word count for $lang")
      assert(nTok === words.map(p => enc(p._2)).sum, s"token count for $lang")
      assert(fert === nTok * 1000000L / nWords)
      assert(fert >= 1000000L, "every word encodes to >= 1 token")
    }
  }

  test("rho_loss_selection: top-20 by signed reducible gap; sums replay") {
    val rows = operators.LangModelOps
      .queries("rho_loss_selection")(spark, sf()).collect()
    assert(rows.length === 20)
    val gaps = rows.map(_.getLong(4))
    assert(gaps.zip(gaps.tail).forall { case (a, b) => a >= b },
      "descending by reducible loss")
    rows.foreach { r =>
      val (n, uni, bi, red) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n >= 1 && uni >= 0 && bi >= 0,
        "add-one NLL leaves are nonnegative")
      val expect = if (uni - bi >= 0) (uni - bi) / n else -((bi - uni) / n)
      assert(red === expect, "signed toward-zero division replay")
    }
    // the selected head must expose a genuinely positive gap: the
    // bigram model beats the unigram on its own training corpus for
    // at least the top doc
    assert(gaps.head > 0, "context reduces loss on the top selection")
  }

  test("rake_keyphrases: full brute-force RAKE replay of the top-15") {
    val rows = operators.LlmOps
      .queries("rake_keyphrases")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 15)
    val stops = Set("the", "a", "of", "and", "in", "der", "die", "das",
      "und", "ist", "el", "los", "de", "y", "es", "le", "la", "et",
      "les", "est")
    rows.foreach { case (phrase, nWords, nOcc, _) =>
      val ws = phrase.split(" ")
      assert(ws.length.toLong === nWords, "n_words matches the text")
      assert(ws.forall(w => !stops(w)), "no stopword inside a phrase")
      assert(nOcc >= 1)
    }
    val scores = rows.map(_._4)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // independent full recompute in Scala from the raw corpus
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val phraseRuns = docs.flatMap { case (_, text) =>
      val runs = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      var cur = Vector.empty[String]
      text.split(" ").foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    phraseRuns.foreach { run =>
      run.foreach { w =>
        deg(w) = deg.getOrElse(w, 0L) + run.length
        freq(w) = freq.getOrElse(w, 0L) + 1
      }
    }
    val wscore = deg.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val byPhrase = phraseRuns.groupBy(_.mkString(" ")).map {
      case (p, occ) =>
        (p, occ.head.length.toLong, occ.length.toLong,
          occ.head.map(wscore).sum)
    }
    val expect = byPhrase.toSeq.sortBy { case (p, _, _, s) => (-s, p) }
      .take(15)
    assert(rows.toSeq === expect, "bit-exact top-15 replay")
  }

  test("mattr_lexical_diversity: brute per-doc replay; window accounting") {
    val rows = runL("mattr_lexical_diversity").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val W = 25
    val docs = Tables.documents(spark, sf())
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val fps = ds.map { case (_, a) =>
        if (a.length < W) a.distinct.length.toLong * 1000000L / a.length
        else {
          val nw = a.length - W + 1
          val sumD = (0 until nw)
            .map(i => a.slice(i, i + W).distinct.length.toLong).sum
          sumD * 1000000L / (W.toLong * nw)
        }
      }
      val nShort = ds.count(_._2.length < W).toLong
      (src, ds.length.toLong, nShort, fps.sum, fps.sum / ds.length)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expect, "bit-exact per-source replay")
    rows.foreach { case (_, nDocs, nShort, _, mean) =>
      assert(nShort <= nDocs && mean > 0 && mean <= 1000000L,
        "MATTR is a ratio in (0, 1]")
    }
  }

  test("token_bigram_cond_entropy: bit-exact per-source replay; H bounds") {
    val rows = runL("token_bigram_cond_entropy").map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = Tables.documents(spark, sf())
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val bigrams = ds.flatMap(d => d._2.sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val n = bigrams.length.toLong
      val sumFp = c12.map { case ((w1, _), c) =>
        math.floor(c.toDouble * math.log(c1(w1).toDouble / c) * 1e6).toLong
      }.sum
      val det = c12.collect { case ((w1, _), c) if c1(w1) == c => c }.sum
      (src, n, c12.size.toLong, det, sumFp / n)
    }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expect, "bit-exact replay")
    rows.foreach { case (_, n, types, det, h) =>
      assert(h >= 0L, "conditional entropy is non-negative")
      assert(types <= n && det <= n)
      // H <= ln(max branching) <= ln(n)
      assert(h <= math.ceil(math.log(n.toDouble) * 1e6).toLong)
    }
  }
}
