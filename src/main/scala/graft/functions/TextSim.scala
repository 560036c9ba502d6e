package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate text detection primitives: MinHash+LSH and SimHash.
  *
  * Reference context: the ETL dedups ids with a driver-side set()
  * (app.py:164); at training-data scale the analog is content-level
  * near-dup detection. Both primitives here follow the same scale
  * discipline: signatures are computed map-side per row (one pass, no
  * shuffle), and candidate pairing is an equi-join on band keys — the
  * LSH construction that replaces the O(n²) all-pairs comparison with a
  * same-key join whose fan-out is bounded by collision rate.
  */
object TextSim {

  /** Word shingles: overlapping `shingleSize`-token windows of a
    * token-array column. THE canonical shingling for every MinHash
    * surface (layout writer, candidate pipeline, UDAF fixture) — the
    * persisted signatures and any on-the-fly path must shingle
    * identically or their Jaccard estimates silently diverge.
    */
  def shingles(wordsCol: String, shingleSize: Int): Column =
    expr(
      s"""transform(sequence(0, greatest(size($wordsCol) - $shingleSize, 0)),
         |  i -> concat_ws(' ', slice($wordsCol, i + 1, $shingleSize)))""".stripMargin)

  /** MinHash signature: for each of `numHashes` seeds, the minimum
    * xxhash64(shingle, seed) over the shingle set. Null/empty-safe:
    * empty shingle arrays yield Long.MaxValue sentinels.
    */
  def minhashSignature(shinglesCol: String, numHashes: Int): Column =
    expr(
      s"""transform(sequence(0, ${numHashes - 1}),
         |  seed -> aggregate($shinglesCol, 9223372036854775807L,
         |    (acc, sh) -> least(acc, xxhash64(sh, seed))))""".stripMargin)

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature. */
  def bandKeys(sigCol: String, numBands: Int, rowsPerBand: Int): Column =
    expr(
      s"""transform(sequence(0, ${numBands - 1}),
         |  b -> xxhash64(slice($sigCol, b * $rowsPerBand + 1, $rowsPerBand)))""".stripMargin)

  /** Candidate near-dup pairs via MinHash banding.
    *
    * Input: (idCol, textCol). Output: (id_a, id_b, est_jaccard) for pairs
    * sharing ≥1 band, with est_jaccard = fraction of agreeing signature
    * slots. The band explode + equi-join is the 100 TB path: shuffle keys
    * are (band_idx, band_hash), so only colliding docs ever meet.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, numBands: Int = 4, shingleSize: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sigs = df
      .withColumn("__words", split(col(textCol), " "))
      .withColumn("__sh", shingles("__words", shingleSize))
      .withColumn("__sig", minhashSignature("__sh", numHashes))
      .select(col(idCol).as("__id"), col("__sig"),
        posexplode(bandKeys("__sig", numBands, rowsPerBand)).as(Seq("__band_idx", "__band_key")))
    val a = sigs.select(col("__id").as("id_a"), col("__sig").as("sig_a"),
      col("__band_idx"), col("__band_key"))
    val b = sigs.select(col("__id").as("id_b"), col("__sig").as("sig_b"),
      col("__band_idx").as("__band_idx_b"), col("__band_key").as("__band_key_b"))
    a.join(b, col("__band_idx") === col("__band_idx_b") &&
        col("__band_key") === col("__band_key_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr(s"""CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))
                 | AS DOUBLE) / $numHashes""".stripMargin).as("est_jaccard"))
      .distinct()
  }

  /** Band-blocked candidate pairs over a PERSISTED signature table
    * (doc_id, sig: array<long>) — the downstream half of MinHash LSH,
    * shared by the expression-signature and typed-Aggregator pipelines.
    * Because the signatures are plain parquet INPUT, the whole pipeline
    * from here on is engine-independent: the DuckDB oracle re-derives
    * banding → candidates → slot agreement from the same files
    * ([[signatureBandPairsDuck]]). Output: (doc_a, doc_b, n_match) for
    * pairs agreeing on ≥1 of `numBands` bands of `rowsPerBand` slots;
    * n_match = number of agreeing signature slots. Band values are the
    * raw signature slices (no re-hash), so the equi-join keys carry
    * ~rowsPerBand longs — still a same-key join, never a cross join.
    *
    * `bucketCap` is the fan-out guard (the JaccardDfCap of the band
    * world): a band bucket holding b docs contributes b² candidate
    * rows, so one degenerate bucket (boilerplate text hashing alike)
    * turns the equi-join all-pairs at corpus scale. Buckets larger
    * than the cap are skipped BEFORE the self-join — they carry ~zero
    * discrimination anyway. The cap is the knob a 100 TB run sizes to
    * its executor memory; fixture buckets top out at 179 (sf0.1
    * simhash), far under the default, so verify/bench results are
    * cap-invariant.
    */
  def signatureBandPairs(stored: DataFrame, numBands: Int,
      rowsPerBand: Int, bucketCap: Int = 1000): DataFrame = {
    // candidate derivation is ID-ONLY: the band rows shuffled through
    // the bucket count, the cap join, and the self-join carry
    // (doc_id, band) — not the full signature, which would multiply
    // every exchange's payload by the signature width. Signatures are
    // joined back ONLY for the (far smaller) candidate set's scoring.
    // The band slicing runs over a scan-spread input (r18): on the
    // single-split bench fixtures the posexplode of signature slices
    // was a 1-task 1.4 s stage; at corpus scale Spread is the identity.
    val bands = Spread(stored, col("doc_id")).select(col("doc_id"),
      posexplode(array((0 until numBands).map(k =>
        slice(col("sig"), k * rowsPerBand + 1, rowsPerBand)): _*))
        .as(Seq("__band_idx", "__band_val")))
    val small = bands.groupBy("__band_idx", "__band_val")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= bucketCap)
      .select("__band_idx", "__band_val")
    val kept = bands.join(small, Seq("__band_idx", "__band_val"))
    val cand = kept.select(col("doc_id").as("doc_a"),
        col("__band_idx"), col("__band_val"))
      .join(kept.select(col("doc_id").as("doc_b"),
        col("__band_idx"), col("__band_val")),
        Seq("__band_idx", "__band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sa = stored.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = stored.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
          .as("n_match"))
  }

  /** DuckDB twin of [[signatureBandPairs]]: CTE chain over the persisted
    * signature parquet at `path`, ending in `m(doc_a, doc_b, n_match)`.
    */
  def signatureBandPairsDuck(path: String, numHashes: Int, numBands: Int,
      rowsPerBand: Int, bucketCap: Int = 1000): String =
    s"""sigs AS (SELECT doc_id, sig FROM read_parquet('$path/*.parquet')),
       |bands AS (
       |  SELECT doc_id, t.k AS bk,
       |         sig[CAST($rowsPerBand * t.k + 1 AS INTEGER)
       |             : CAST($rowsPerBand * t.k + $rowsPerBand AS INTEGER)] AS bv
       |  FROM sigs CROSS JOIN (SELECT unnest(range(0, $numBands)) AS k) t),
       |small AS (
       |  SELECT bk, bv FROM (SELECT bk, bv, count(*) AS bn
       |                      FROM bands GROUP BY bk, bv)
       |  WHERE bn <= $bucketCap),
       |kept AS (SELECT b.* FROM bands b JOIN small USING (bk, bv)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b
       |    ON a.bk = b.bk AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |m AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(sum(CASE WHEN sa.sig[CAST(t.i AS INTEGER)]
       |                            = sb.sig[CAST(t.i AS INTEGER)]
       |                  THEN 1 ELSE 0 END) AS INTEGER) AS n_match
       |  FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_a
       |              JOIN sigs sb ON sb.doc_id = c.doc_b
       |  CROSS JOIN range(1, ${numHashes + 1}) t(i)
       |  GROUP BY c.doc_a, c.doc_b)""".stripMargin

  /** Candidate near-dup pairs for exact set-Jaccard via a df-capped
    * inverted-index join.
    *
    * Input: (idCol, blockCol, wsCol) where wsCol is a deduplicated token
    * array. Output: (doc_a, doc_b, na, nb, inter) for same-block pairs
    * sharing ≥1 KEPT token; na/nb are kept-token set sizes.
    *
    * Tokens whose document frequency exceeds `dfCap` are dropped BEFORE
    * the self-join — standard LSH hygiene: a token in df documents
    * contributes df² candidate rows and, at stop-word frequencies, ~zero
    * Jaccard signal. With the cap, total candidate rows are bounded by
    * dfCap × Σ df (linear in corpus size), which is what keeps the
    * inverted index viable at 100 TB.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, blockCol: String,
      wsCol: String, dfCap: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("__id"), col(blockCol).as("__blk"),
      explode(col(wsCol)).as("__w"))
    val rare = tok.groupBy("__w").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
      .select("__w")
    val kept = tok.join(rare, "__w")
    val sized = kept.groupBy("__id", "__blk").agg(count(lit(1)).as("__n"))
    val inv = kept.join(sized, Seq("__id", "__blk"))
    inv.as("a").join(inv.as("b"),
        col("a.__w") === col("b.__w") && col("a.__blk") === col("b.__blk") &&
          col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"),
        col("a.__n").as("na"), col("b.__n").as("nb"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Per-row 64-bit SimHash over whitespace tokens (weighted by term
    * frequency): bit b is set iff the signed sum of token-hash bit b is
    * positive.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashFromTokens(
      df.select(col(idCol), explode(split(col(textCol), " ")).as("__tok")),
      idCol, "__tok")

  /** SimHash over a PRE-EXPLODED token stream — the generalized form:
    * the caller picks the feature granularity (whitespace words for
    * text dedup, byte n-grams for the media phash) and this folds the
    * signed per-bit sums into one 64-bit signature per id. Identical
    * bit rule to [[simhash]] (which delegates here).
    */
  def simhashFromTokens(toks: DataFrame, idCol: String,
      tokCol: String): DataFrame = {
    val sums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__s$b")
    }
    val assemble = (0 until 64).map { b =>
      when(col(s"__s$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    toks.select(col(idCol).as("__id"), col(tokCol).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
      .groupBy("__id").agg(sums.head, sums.tail: _*)
      .select(col("__id").as(idCol), assemble.as("simhash"))
  }

  /** Near-dup pairs by SimHash: candidates from 16-bit band equality
    * (an equi-join), confirmed by Hamming distance ≤ maxHamming.
    * `bucketCap` skips degenerate band buckets before the self-join —
    * see [[signatureBandPairs]] for the fan-out argument.
    */
  def simhashPairs(sims: DataFrame, idCol: String, maxHamming: Int,
      bucketCap: Int = 1000): DataFrame = {
    val banded = sims.select(col(idCol).as("__id"), col("simhash"),
      posexplode(array(
        col("simhash").bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)),
        shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL))))
        .as(Seq("__band_idx", "__band_key")))
    val small = banded.groupBy("__band_idx", "__band_key")
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= bucketCap)
      .select("__band_idx", "__band_key")
    val kept = banded.join(small, Seq("__band_idx", "__band_key"))
    val a = kept.select(col("__id").as("id_a"), col("simhash").as("sim_a"),
      col("__band_idx"), col("__band_key"))
    val b = kept.select(col("__id").as("id_b"), col("simhash").as("sim_b"),
      col("__band_idx").as("__bi"), col("__band_key").as("__bk"))
    a.join(b, col("__band_idx") === col("__bi") &&
        col("__band_key") === col("__bk") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
