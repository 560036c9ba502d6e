package graft

/** Semantic pins for ScopedRankOps + media_shard_packing: scope
  * accounting (global top-3 revenue dominates every nation's), shard
  * byte conservation and the ≤-one-file overshoot law, and the
  * alignment correlation range.
  */
class ScopedRankSpec extends SparkSpec {

  test("rank_within_grouping_sets: scope shapes and dominance") {
    val rows = operators.ScopedRankOps
      .queries("rank_within_grouping_sets")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getLong(5)))
    val global = rows.filter(_._1 == "global")
    assert(global.length === 3 && global.forall(r =>
      r._2 == "ALL" && r._3 == "ALL"))
    // per scope key: ranks are 1..k with descending revenue
    rows.groupBy(r => (r._1, r._2, r._3)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).sameElements(1 to sorted.length))
      val revs = sorted.map(_._6)
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
    // the global #1 revenue is >= every nation-scope #1 revenue
    val g1 = global.find(_._4 == 1).get._6
    rows.filter(r => r._1 == "nation" && r._4 == 1)
      .foreach(r => assert(r._6 <= g1, "global #1 dominates"))
  }

  test("media_shard_packing: byte conservation and overshoot bound") {
    val rows = operators.MultimodalOps
      .queries("media_shard_packing")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val totalBytes = rows.map(_.getLong(2)).sum
    val totalFiles = rows.map(_.getLong(1)).sum
    val direct = Tables.documents(spark, sf())
      .filter(org.apache.spark.sql.functions.expr("doc_id % 25 = 0"))
      .selectExpr("CAST(octet_length(text) AS BIGINT) AS b")
      .collect().map(_.getLong(0))
    assert(totalFiles === direct.length, "every media file in one shard")
    assert(totalBytes === direct.sum, "byte mass conserved")
    // prefix rule: a shard holds the files whose exclusive prefix lies
    // in [k*2048, (k+1)*2048) ⇒ bytes < 2048 + max file size
    val maxFile = direct.max
    rows.foreach { r =>
      assert(r.getLong(2) < 2048 + maxFile, "overshoot bounded by one file")
      assert(r.getLong(3) <= r.getLong(4), "doc range ordered")
    }
  }

  test("text_embedding_length_corr: |corr| <= 1 over the joined ids") {
    val Array(r) = operators.ScopedRankOps
      .queries("text_embedding_length_corr")(spark, sf()).collect()
    assert(r.getLong(0) > 0)
    if (!r.isNullAt(1))
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
  }

  test("media_phash_near_dup: signature replays from raw bytes; flags symmetric") {
    import org.apache.spark.sql.functions._
    val rows = operators.MultimodalOps.queries("media_phash_near_dup")(
      spark, sf()).collect()
    val mediaDocs = Tables.documents(spark, sf())
      .filter(col("doc_id") % 25 === 0).count()
    assert(rows.length === mediaDocs, "one signature per media object")
    // Scala replay of the phash for the first object: simhash bit rule
    // over the content's byte 4-grams, hashes via Spark's own xxhash64
    // (the engine-specific piece the layout-oracle pattern pins HERE)
    val doc = Tables.documents(spark, sf())
      .filter(col("doc_id") % 25 === 0).orderBy("doc_id")
      .select("doc_id", "text").first()
    val txt = doc.getString(1)
    val grams = (1 to math.max(txt.length - 3, 1))
      .map(i => txt.substring(i - 1, math.min(i + 3, txt.length)))
    import spark.implicits._
    val hs = grams.toDF("g").select(xxhash64(col("g"))).as[Long].collect()
    var expected = 0L
    for (b <- 0 until 64) {
      val s0 = hs.map(h => if (((h >> b) & 1L) == 1L) 1L else -1L).sum
      if (s0 > 0) expected |= 1L << b
    }
    val got = rows.find(_.getLong(0) == doc.getLong(0)).get.getLong(1)
    assert(got === expected, "phash = simhash over byte 4-grams")
    // flag consistency: a file is flagged iff some OTHER file is within
    // Hamming 16 (brute force over the ≤|media| signature set)
    val sigs = rows.map(r => r.getLong(0) -> r.getLong(1))
    rows.foreach { r =>
      val near = sigs.exists { case (id, s0) =>
        id != r.getLong(0) &&
          java.lang.Long.bitCount(s0 ^ r.getLong(1)) <= 16
      }
      // banded candidates are a SUBSET of brute force: flagged ⇒ near.
      // The recall direction is only GUARANTEED at Hamming ≤ 3
      // (pigeonhole: ≤3 flipped bits dirty ≤3 of the 4 bands, so one
      // 16-bit band must match exactly); past that, banding may miss —
      // by design, that is the LSH recall trade.
      assert(!r.getBoolean(2) || near, "flagged without a near signature")
      val nearGuaranteed = sigs.exists { case (id, s0) =>
        id != r.getLong(0) &&
          java.lang.Long.bitCount(s0 ^ r.getLong(1)) <= 3
      }
      assert(!nearGuaranteed || r.getBoolean(2),
        "≤3-bit neighbor shares a clean band ⇒ must flag")
    }
  }
}
