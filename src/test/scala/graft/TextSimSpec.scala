package graft

import graft.functions.TextSim
import org.apache.spark.sql.functions._

/** Near-dup pair semantics for the hash-based operators (no SQL oracle —
  * hash values are engine-specific): MinHash banding recall on planted
  * duplicates, SimHash Hamming locality, and the D3 approximate-distinct
  * error bound.
  */
class TextSimSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("table", "scan", "join", "filter", "agg", "sort",
    "spark", "query", "row", "column", "batch", "stream", "hash", "merge",
    "key", "value", "fast", "slow", "big", "small")

  /** Deterministic word-soup docs + planted near-duplicates. */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val base = (0L until 30L).map { i =>
      i -> Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val nearDups = (0L until 5L).map { i =>
      val words = base(i.toInt)._2.split(" ")
      words(7) = "mutated" // one token changed out of 40
      (100L + i) -> words.mkString(" ")
    }
    base ++ nearDups
  }

  test("MinHash banding recovers all planted near-dup pairs") {
    val df = corpus.toDF("doc_id", "text")
    val cand = TextSim.minhashCandidates(df, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(cand.contains((i, 100L + i)),
        s"planted pair ($i, ${100 + i}) missed by LSH banding")
    }
  }

  test("identical text hashes to identical MinHash signature slots") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val cand = TextSim.minhashCandidates(df, "doc_id", "text", numHashes = 16)
      .as[(Long, Long, Double)].collect()
    assert(cand.length === 1 && cand.head._3 === 1.0)
  }

  test("SimHash: planted near-dups land within Hamming 16, self-distance 0") {
    val df = corpus.toDF("doc_id", "text")
    val sims = TextSim.simhash(df, "doc_id", "text").cache()
    val pairs = TextSim.simhashPairs(sims, "doc_id", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { i =>
      assert(pairs.contains((i, 100L + i)),
        s"planted pair ($i, ${100 + i}) missed by SimHash bands")
    }
    // identical docs → identical simhash
    val dup = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val two = TextSim.simhash(dup, "doc_id", "text")
      .select("simhash").as[Long].collect()
    assert(two(0) === two(1))
  }

  test("MinHashSignature Aggregator: signatures invariant under partitioning") {
    val minhash = udaf(new graft.functions.MinHashSignature(8))
    val shingles = corpus.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("sh"))
    def sigs(parts: Int): Map[Long, Seq[Long]] = shingles.repartition(parts)
      .groupBy("doc_id").agg(minhash(col("sh")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // merge() is a commutative monoid ⇒ any physical partitioning (and so
    // any cluster layout) yields identical signatures
    assert(sigs(1) === sigs(8))
  }

  test("jaccard df cap drops saturating tokens and bounds candidate fan-out") {
    // 120 docs all sharing one stop-word; real overlap only via rare tokens
    val docs = (0 until 120)
      .map(i => (i.toLong, "src", Seq("stopword", s"tok$i", s"tok${i + 1}")))
      .toDF("doc_id", "source", "ws")
    val cap = 50 // = operators.LlmOps.JaccardDfCap
    val capped = TextSim.jaccardPairs(docs, "doc_id", "source", "ws", cap)
    val uncapped = TextSim.jaccardPairs(docs, "doc_id", "source", "ws", Int.MaxValue)
    val nCapped = capped.count()
    val nUncapped = uncapped.count()
    // stopword (df=120 > cap) would pair every doc with every other
    assert(nUncapped === 120L * 119 / 2,
      s"uncapped should be all-pairs, got $nUncapped")
    // with the cap only adjacent docs (sharing tok_{i+1}) remain
    assert(nCapped === 119, s"capped should keep only true overlaps, got $nCapped")
    // the structural bound the cap guarantees: Σ_w df(w)² ≤ cap × Σ_w df(w)
    val keptTokens = docs
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
      .agg(sum("df")).as[Long].head()
    assert(nCapped <= cap * keptTokens)
    // and na/nb count kept tokens only (stopword excluded from set sizes)
    val row = capped.orderBy("doc_a", "doc_b").limit(1)
      .select("na", "nb", "inter").as[(Long, Long, Long)].head()
    assert(row === ((2L, 2L, 1L)))
  }

  test("band bucket cap bounds hyperplane-LSH candidate fan-out") {
    // the lsh_hyperplane_near_dup shape: one band value per slot
    // (rowsPerBand=1). A degenerate bucket — every vector agreeing on
    // band 0 — must be skipped before the self-join; discrimination
    // survives via the other bands.
    val n = 40
    val stored = (0L until n).map(i =>
      // band 0 constant (degenerate); band 1 pairs ids (i, i+1 with i
      // even) into 2-element buckets; bands 2-3 unique per id
      (i, Seq(7L, i / 2, 100L + i, 200L + i)))
      .toDF("doc_id", "sig")
    val capped = TextSim.signatureBandPairs(stored,
      numBands = 4, rowsPerBand = 1, bucketCap = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // only the band-1 pair buckets survive: (0,1), (2,3), ...
    val expected = (0L until n by 2).map(i => (i, i + 1)).toSet
    assert(capped === expected,
      s"cap must drop the degenerate band-0 bucket: got ${capped.size} pairs")
    // without the cap the degenerate bucket goes quadratic (all pairs)
    val uncapped = TextSim.signatureBandPairs(stored,
      numBands = 4, rowsPerBand = 1, bucketCap = Int.MaxValue).count()
    assert(uncapped === n * (n - 1) / 2)
  }

  test("approx_percentile tracks the exact rank-picked percentiles") {
    // the declared query now emits the ε-bound verdicts directly
    // (oracled as TRUE by DuckDB); assert them here too, plus the raw
    // sketch laws the booleans compress away: per-flag monotonicity
    // p25 ≤ p50 ≤ p75 of the sketch values themselves.
    val verdicts = SparkEntry.queries("percentile_approx_scale")(spark, sf())
      .select("l_returnflag", "p25_ok", "p50_ok", "p75_ok")
      .as[(String, Boolean, Boolean, Boolean)].collect()
    assert(verdicts.nonEmpty)
    verdicts.foreach { case (flag, ok25, ok50, ok75) =>
      assert(ok25 && ok50 && ok75,
        s"$flag: sketch drifts > 2% from exact rank-picked percentile")
    }
    val raw = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
        .as("pcts"))
      .select(col("l_returnflag"),
        element_at(col("pcts"), 1), element_at(col("pcts"), 2),
        element_at(col("pcts"), 3))
      .as[(String, Double, Double, Double)].collect()
    raw.foreach { case (flag, a25, a50, a75) =>
      assert(a25 <= a50 && a50 <= a75,
        s"$flag: sketch percentiles not monotone: $a25, $a50, $a75")
    }
  }

  test("D3: approx_count_distinct within documented HLL++ error of exact") {
    val li = Tables.lineitem(spark, sf())
    val (approx, exact) = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a"),
      countDistinct(col("l_orderkey")).as("e"))
      .as[(Long, Long)].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.1, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("crosslingual_near_dup is the confirmed-dup subset annotated with langs") {
    val pairs = operators.LlmOps.queries("crosslingual_near_dup")(spark, sf())
      .collect()
    // minhash_near_dedup: (doc_a, doc_b, n_match, est_jaccard, is_dup)
    val dups = operators.LlmOps.queries("minhash_near_dedup")(spark, sf())
      .collect().filter(_.getBoolean(4))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === dups,
      "pair set must be exactly the is_dup candidates")
    val langs = Tables.documents(spark, sf()).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { r =>
      assert(r.getString(2) === langs(r.getLong(0)), "lang_a from documents")
      assert(r.getString(3) === langs(r.getLong(1)), "lang_b from documents")
      assert(r.getBoolean(4) === (r.getString(2) != r.getString(3)),
        "flag is exactly lang_a <> lang_b")
    }
  }

  test("dedup_rate_by_source counts exactly the docs on confirmed pairs") {
    val rows = operators.LlmOps.queries("dedup_rate_by_source")(spark, sf())
      .collect()
    val docs = Tables.documents(spark, sf()).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rows.map(_.getLong(1)).sum === docs.length.toLong,
      "per-source doc counts partition the corpus")
    val dupIds = operators.LlmOps.queries("minhash_near_dedup")(spark, sf())
      .collect().filter(_.getBoolean(4))
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val bySource = docs.groupBy(_._2)
    rows.foreach { r =>
      val (src, n, nDup, rateFp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val ids = bySource(src).map(_._1)
      assert(n === ids.length.toLong)
      assert(nDup === ids.count(dupIds).toLong, s"dup docs for $src")
      assert(rateFp === nDup * 1000000L / n)
    }
  }

  test("containment_near_dup dominates Jaccard on the shared candidate set") {
    // containment >= jaccard pointwise (min <= union), so every pair the
    // Jaccard op keeps at >= 0.5 must appear in the containment output
    val cont = operators.LlmOps.queries("containment_near_dup")(spark, sf())
      .collect()
    val jac = operators.LlmOps.queries("ngram_jaccard_pairs")(spark, sf())
      .collect()
    val contByPair = cont.map(r => (r.getLong(0), r.getLong(1)) ->
      r.getDouble(3)).toMap
    cont.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "oriented pair")
      assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0)
    }
    jac.filter(_.getDouble(3) >= 0.5).foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(contByPair.contains(k), s"jaccard>=0.5 pair $k missing")
      assert(contByPair(k) >= r.getDouble(3),
        "containment must dominate jaccard on a shared pair")
    }
  }

  test("chapman_dedup_estimate: set algebra and the dominance law") {
    val Array(r) = operators.LlmOps
      .queries("chapman_dedup_estimate")(spark, sf()).collect()
    val (nA, nB, m, u) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val est = r.getLong(4)
    assert(m <= math.min(nA, nB), "overlap bounded by both captures")
    assert(u === nA + nB - m, "inclusion-exclusion union")
    assert(est === (nA + 1) * (nB + 1) / (m + 1) - 1, "Chapman replay")
    // (nA+1)(nB+1) - (m+1)(union+1) = (nA-m)(nB-m) >= 0, so the
    // estimator can never fall below the observed union (floor slack 0:
    // the difference is an exact integer multiple argument)
    assert(est >= u, "estimated population dominates the observed union")
    if (est > 0)
      assert(r.getLong(5) === u * 1000000L / est, "coverage replay")
    // both detectors see the SAME confirmed-dup criterion, so each
    // capture is a subset of the full 4-band candidate dup set
    val full = operators.LlmOps.queries("minhash_near_dedup")(spark, sf())
      .filter(org.apache.spark.sql.functions.col("is_dup")).count()
    assert(nA <= full && nB <= full && u <= full,
      "2-band captures are subsets of the 4-band dup set")
  }

  test("neardup_transitivity_audit: brute wedge/triangle replay") {
    val rows = operators.LlmOps
      .queries("neardup_transitivity_audit")(spark, sf()).collect()
    assert(rows.length === 1)
    val r = rows.head
    // rebuild the exact edge set from the jaccard candidates
    val cand = operators.LlmOps.queries("ngram_jaccard_pairs")(spark, sf())
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // ngram_jaccard_pairs already applies the >= 0.3 cut (rounded); the
    // audit uses the exact integer form of the same threshold, so the
    // edge COUNT may differ only on exact-boundary pairs — recompute
    // independently from the raw documents instead
    val docs = Tables.documents(spark, sf())
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .select("doc_id", "source", "text").collect()
      .map(x => (x.getLong(0), x.getString(1),
        x.getString(2).split(" ", -1).distinct.toSet))
    val df = docs.flatMap(d => d._3.map(w => w))
      .groupBy(identity).view.mapValues(_.size).toMap
    val kept = docs.map(d => (d._1, d._2, d._3.filter(w => df(w) <= 50)))
    val edges = (for {
      a <- kept; b <- kept
      if a._2 == b._2 && a._1 < b._1
      inter = (a._3 & b._3).size
      if inter > 0 && 10 * inter >= 3 * (a._3.size + b._3.size - inter)
    } yield (a._1, b._1)).toSet
    assert(r.getLong(0) === edges.size.toLong, "exact edge count")
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(dg => dg * (dg - 1) / 2).sum
    val verts = deg.size.toLong
    val edgeSeq = edges.toSeq
    val tri = (for {
      e1 <- edgeSeq; e2 <- edgeSeq if e1._2 == e2._1
      if edges.contains((e1._1, e2._2))
    } yield 1).size.toLong
    assert(r.getLong(1) === verts && r.getLong(2) === wedges)
    assert(r.getLong(3) === tri, "exact triangle count")
    if (wedges > 0) {
      assert(r.getLong(4) === 3 * tri * 1000000L / wedges)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L,
        "transitivity in [0, 1]")
    } else assert(r.isNullAt(4))
    assert(r.getLong(5) === wedges - 3 * tri && r.getLong(5) >= 0L,
      "open wedges accounting")
    assert(cand.nonEmpty || edges.isEmpty, "candidate family consistent")
  }
}
