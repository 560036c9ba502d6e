package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pre-training audit operators (round-10 widening, second session):
  * the checks a pipeline runs BEFORE committing a data mix — a
  * count-min sketch traffic audit (does the bounded-memory counter the
  * streaming layer will rely on actually bound its error on this
  * vocabulary?) and a train/val near-dup leakage audit (does the split
  * the trainer is about to consume leak eval content through near
  * duplicates?). The reference's dedup step (`/root/reference/
  * app.py:164` set-dedup before staging) is the seed of both: these are
  * what that step grows into when the corpus no longer fits one
  * machine and the split becomes a contract.
  *
  * Determinism & scale design:
  *   - The count-min sketch is DETERMINISTIC here: cells are exact
  *     integer sums over md5-derived bucket assignments (the
  *     content-derived-hash idiom of span_corruption_mask /
  *     mixture_weighted_resample), so the estimate is a pure function
  *     of the data and both engines reproduce it bit-for-bit — the
  *     sketch law (never underestimates) is spec-pinned, the VALUES
  *     are oracle-hashed. Sketch state is depth×width = 128 cells no
  *     matter the corpus; cells fold map-side (integer sums commute),
  *     which is exactly the mergeability a 1000-executor counter
  *     needs.
  *   - The leakage audit reuses the persisted MinHash signature layout
  *     and the capped band join (LlmOps L3) — candidates are bucketed,
  *     never corpus². Split labels are content-derived md5 bytes (the
  *     train_val_test_split assignment, verbatim), so the audit names
  *     the same split the splitter ships. Label join-back touches the
  *     candidate set only; the per-(split, split) rollup is
  *     enum²-bounded (≤ 9 rows).
  */
object AuditOps extends OpGroup {

  private val Depth = 4
  private val Width = 32

  /** Engine-common CMS bucket hash: first 8 md5 hex chars of
    * `word + "_" + row` as a non-negative 32-bit int, mod table width.
    */
  private def bucketSpark(w: String, j: String): String =
    s"CAST(conv(substring(md5(concat($w, '_', CAST($j AS STRING))), 1, 8), 16, 10) AS BIGINT) % $Width"
  private def bucketDuck(w: String, j: String): String =
    s"CAST(concat('0x', substr(md5($w || '_' || CAST($j AS VARCHAR)), 1, 8)) AS BIGINT) % $Width"

  /** The train_val_test_split assignment, verbatim (CurationOps): the
    * audit must label docs exactly as the splitter does.
    */
  private def splitSpark = when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cd", "train")
    .when(substring(md5(col("doc_id").cast("string")), 1, 2) < "e6", "val")
    .otherwise("test")
  private val splitDuck =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
      |     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
      |     ELSE 'test' END""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Count-min sketch heavy hitters: build the 4×32 sketch over the
    // token stream, then read back the 10 highest-exact-count tokens
    // with their sketch estimates and overestimation error. The exact
    // table exists here to EXHIBIT the sketch law (est ≥ exact, error
    // bounded by collisions); a 100 TB deployment keeps only the
    // 128-cell sketch and merges shards by cell-wise addition. Both
    // the count table and the sketch fold map-side; the top-10 is
    // TakeOrdered; the estimate join broadcasts the 128-cell sketch.
    "countmin_heavy_hitters" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val cells = wc
        .select(col("c"), explode(expr(
          s"transform(sequence(0, ${Depth - 1}), j -> named_struct(" +
            s"'j', j, 'bucket', ${bucketSpark("w", "j")}))")).as("cell"))
        .groupBy(col("cell.j").as("j"), col("cell.bucket").as("bucket"))
        .agg(sum("c").as("cell_sum"))
      val top = wc.orderBy(col("c").desc, col("w")).limit(10)
      top
        .select(col("w"), col("c"), explode(expr(
          s"transform(sequence(0, ${Depth - 1}), j -> named_struct(" +
            s"'j', j, 'bucket', ${bucketSpark("w", "j")}))")).as("cell"))
        .join(broadcast(cells),
          col("cell.j") === col("j") && col("cell.bucket") === col("bucket"))
        .groupBy("w", "c")
        .agg(min("cell_sum").as("cms_est"))
        .withColumn("overestimate", col("cms_est") - col("c"))
        .orderBy(col("c").desc, col("w"))
    }),

    // Train/val near-dup leakage audit: confirmed near-dup pairs
    // (persisted MinHash signatures, capped band join, est_jaccard ≥
    // 0.5) labeled with each side's md5-derived split and rolled up per
    // unordered split pair — the (train, val) and (train, test) rows
    // ARE the leaked eval content a decontamination pass must remove
    // before the split ships. n_docs_exposed counts the distinct
    // right-side documents implicated in each class.
    "split_leakage_audit" -> ((s, d) => {
      val stored = s.read.parquet(LlmOps.minhashLayout(s, d))
      val pairs = graft.functions.TextSim.signatureBandPairs(stored,
          numBands = LlmOps.MinHashBands,
          rowsPerBand = LlmOps.MinHashRowsPerBand)
        .filter(col("n_match") >= LlmOps.MinHashDupSlots)
      val splits = Tables.documents(s, d)
        .select(col("doc_id"), splitSpark.as("split"))
      pairs
        .join(splits.select(col("doc_id").as("doc_a"),
          col("split").as("split_a")), "doc_a")
        .join(splits.select(col("doc_id").as("doc_b"),
          col("split").as("split_b")), "doc_b")
        .select(least(col("split_a"), col("split_b")).as("split_1"),
          greatest(col("split_a"), col("split_b")).as("split_2"),
          col("doc_a"), col("doc_b"))
        .groupBy("split_1", "split_2")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct("doc_b").as("n_docs_exposed"))
        .withColumn("is_cross_split", col("split_1") =!= col("split_2"))
        .orderBy("split_1", "split_2")
    }),

    // A4 (r15) — hash-uniformity audit: χ² goodness-of-fit of the first
    // md5 byte of doc_id against uniform over the full 0..255 spine —
    // the audit UNDER every content-derived decision this repo makes
    // (hash_sample_stratified's nibble thresholds, train_val_test_split,
    // mixture_weighted_resample, dp_laplace's uniform, shard keys): all
    // of them assume md5 output is uniform on the fixture's key space;
    // this query MEASURES it. Empty cells contribute their full
    // (0−E)²/E mass via the spine left-join (the chi2 grid rule). PURE
    // integer χ²: with E = n/256, Σ(O−E)²/E = Σ(256·O − n)²/(256·n) —
    // exact DECIMAL(38,0) folds, one 1e6 floor division; the normal
    // z-approximation (χ²−dof)/√(2·dof) is ONE shared-text IEEE leaf,
    // with the |z| ≤ 3 verdict a consumer-visible boolean. Scale: one
    // map-side 256-cell count; the spine is a literal sequence.
    "hash_uniformity_audit" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .select(expr(
          "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT)")
          .as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("o"))
      val spine = s.range(0, 256).select(col("id").as("cell"))
      val grid = spine.join(cells, Seq("cell"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      grid.crossJoin(broadcast(grid.agg(sum("o").as("n"))))
        .agg(max("n").as("n"),
          sum(when(col("o") > 0, 1L).otherwise(0L)).as("n_cells_hit"),
          sum(expr(
            """CAST(256 * o - n AS DECIMAL(38,0)) * (256 * o - n)"""))
            .as("q"))
        .filter(col("n") > 0)
        .withColumn("chi2_fp",
          expr("CAST(q * 1000000 DIV (256 * CAST(n AS DECIMAL(38,0)))" +
            " AS BIGINT)"))
        .select(col("n"), col("n_cells_hit"), col("chi2_fp"),
          lit(255L).as("dof"),
          expr("""CAST(FLOOR((CAST(chi2_fp AS DOUBLE) / 1000000.0 - 255.0)
                 | / sqrt(510.0) * 1000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("z_fp"))
        .withColumn("uniform_ok", abs(col("z_fp")) <= lit(3000000L))
    }),
  )

  // `def`: the leakage oracle embeds the session's persisted minhash
  // layout path (Verify runs every query before dumping oracle SQL)
  def oracleSql: Map[String, String] = Map(
    "hash_uniformity_audit" ->
      """WITH cells AS (
        |  SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
        |           1, 2)) AS BIGINT) AS cell,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1),
        |grid AS (
        |  SELECT s.cell, COALESCE(c.o, 0) AS o
        |  FROM (SELECT unnest(range(0, 256)) AS cell) s
        |  LEFT JOIN cells c ON c.cell = s.cell),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM grid),
        |agg AS (
        |  SELECT max(n) AS n,
        |         CAST(sum(CASE WHEN o > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_cells_hit,
        |         sum(CAST(256 * o - n AS HUGEINT) * (256 * o - n)) AS q
        |  FROM grid CROSS JOIN tot),
        |c2 AS (
        |  SELECT n, n_cells_hit,
        |         CAST(q * 1000000 // (256 * CAST(n AS HUGEINT)) AS BIGINT)
        |           AS chi2_fp
        |  FROM agg WHERE n > 0)
        |SELECT n, n_cells_hit, chi2_fp, CAST(255 AS BIGINT) AS dof,
        |       CAST(FLOOR((CAST(chi2_fp AS DOUBLE) / 1000000.0 - 255.0)
        |         / sqrt(510.0) * 1000000.0) AS BIGINT) AS z_fp,
        |       abs(CAST(FLOOR((CAST(chi2_fp AS DOUBLE) / 1000000.0 - 255.0)
        |         / sqrt(510.0) * 1000000.0) AS BIGINT)) <= 3000000
        |         AS uniform_ok
        |FROM c2""".stripMargin,

    "countmin_heavy_hitters" ->
      s"""WITH wc AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY w),
         |cells AS (
         |  SELECT t.j, ${bucketDuck("w", "t.j")} AS bucket,
         |         CAST(sum(c) AS BIGINT) AS cell_sum
         |  FROM wc CROSS JOIN range(0, $Depth) t(j)
         |  GROUP BY t.j, ${bucketDuck("w", "t.j")}),
         |top AS (SELECT w, c FROM wc ORDER BY c DESC, w LIMIT 10),
         |est AS (
         |  SELECT top.w, top.c, min(cells.cell_sum) AS cms_est
         |  FROM top CROSS JOIN range(0, $Depth) t(j)
         |  JOIN cells ON cells.j = t.j
         |    AND cells.bucket = ${bucketDuck("top.w", "t.j")}
         |  GROUP BY top.w, top.c)
         |SELECT w, c, cms_est, cms_est - c AS overestimate
         |FROM est ORDER BY c DESC, w""".stripMargin,

    // `def` on the trait keeps lastPath fresh: Verify runs queries
    // before dumping oracle SQL, so the layout path is bound by then
    "split_leakage_audit" ->
      s"""WITH ${graft.functions.TextSim.signatureBandPairsDuck(
              LlmOps.minhashLayoutCache.lastPath,
              numHashes = LlmOps.MinHashes, numBands = LlmOps.MinHashBands,
              rowsPerBand = LlmOps.MinHashRowsPerBand)},
         |splits AS (SELECT doc_id, $splitDuck AS split FROM documents),
         |labeled AS (
         |  SELECT least(sa.split, sb.split) AS split_1,
         |         greatest(sa.split, sb.split) AS split_2,
         |         m.doc_a, m.doc_b
         |  FROM m JOIN splits sa ON sa.doc_id = m.doc_a
         |         JOIN splits sb ON sb.doc_id = m.doc_b
         |  WHERE m.n_match >= ${LlmOps.MinHashDupSlots})
         |SELECT split_1, split_2, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_exposed,
         |       split_1 <> split_2 AS is_cross_split
         |FROM labeled GROUP BY split_1, split_2
         |ORDER BY split_1, split_2""".stripMargin,
  )
}
