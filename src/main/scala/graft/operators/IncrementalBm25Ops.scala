package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CDC-incremental maintenance of the BM25 serving index (round 15) —
  * the LEXICAL-retrieval sibling of [[IncrementalMaintainOps]] (MinHash
  * near-dup) and [[IncrementalIvfOps]] (IVF/PQ vectors): a 100 TB text
  * corpus is not re-indexed per crawl, so the inverted-index state a
  * BM25 deployment serves — term postings (doc_id, w, tf), the per-doc
  * length sidecar, the per-term document-frequency table, and the
  * (N, total_dl) corpus stats — is maintained under the SAME
  * deterministic CDC batch rule the sibling operators replay
  * (doc_id % 10 = 3 → UPDATE dropping the first 5 words, = 7 → DELETE,
  * = 1 → INSERT a copy at doc_id + 1e9 with the loud mint guard):
  *
  *   - retired docs' postings and length rows anti-join out against the
  *     broadcast batch key set (updates' old rows + deletes);
  *   - fresh docs (updates' new text + inserts) are the ONLY text ever
  *     re-tokenized — their postings and lengths append;
  *   - df maintains ADDITIVELY: df' = df − |retired docs containing w|
  *     + |fresh docs containing w| — the retired-side term sets probe
  *     the PERSISTED postings by the broadcast key set (doc-keyed
  *     layout ⇒ partition-pruned read at scale), never a corpus
  *     re-tokenization; terms whose df' hits 0 drop from the table;
  *   - (N, total_dl) maintain additively from the batch-sized length
  *     deltas.
  *
  * Correctness contract (checked, not trusted): the maintained index is
  * compared against a from-scratch rebuild of the post-merge corpus —
  * postings key-by-key with tf bit-equality per provenance class,
  * df term-by-term, lengths doc-by-doc, stats exactly — AND the thing a
  * consumer actually reads is compared end-to-end: the BM25 top-10
  * (the R1 `bm25_topk` formula, identical expression text) computed
  * from the MAINTAINED index must match the top-10 computed from the
  * REBUILD rank-for-rank, doc-for-doc, score-bit-for-score-bit. The
  * DuckDB oracle recomputes every count from the persisted maintained
  * parquet + its own rebuild of the post-merge corpus from the
  * documents table — an independent engine's rebuild, so a maintenance
  * bug cannot hide in shared Spark code.
  *
  * 100 TB shape: every batch-derived relation (retired keys, fresh
  * postings, df deltas, stat deltas) is broadcast; the corpus-sized
  * touches are the two retire anti-joins and the df probe — scans with
  * broadcast filters, ZERO corpus shuffles in the maintenance path; the
  * rebuild exists only as audit ground truth (at scale it is the thing
  * this operator makes unnecessary).
  */
object IncrementalBm25Ops extends OpGroup {

  private val InsertShift = 1000000000L

  /** (doc_id, w, tf) postings + dl from a (doc_id, text) relation —
    * the ONE tokenization both the base build and the batch re-encode
    * run (explode→hash-agg; split-on-space, the corpus-wide
    * convention).
    */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

  private def doclens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))

  /** Write the four index artifacts (postings at `p`, `.dl`, `.df`,
    * `.stats`) from already-derived relations.
    */
  private def writeIndex(p: String, tf: DataFrame, dl: DataFrame,
      df: DataFrame, stats: DataFrame): Unit = {
    tf.write.mode(SaveMode.Overwrite).parquet(p)
    dl.write.mode(SaveMode.Overwrite).parquet(s"$p.dl")
    df.write.mode(SaveMode.Overwrite).parquet(s"$p.df")
    stats.write.mode(SaveMode.Overwrite).parquet(s"$p.stats")
  }

  /** Pre-CDC serving index — the offline build (cached like every
    * layout; at 100 TB this is the ingest job's output).
    */
  private val baseCache = new graft.Layout("graft_bm25_base")

  private[graft] def baseIndex(s: SparkSession, d: String): String =
    baseCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val tf = postings(docs)
      val dl = doclens(docs)
      writeIndex(p, tf, dl,
        tf.groupBy("w").agg(count(lit(1)).as("df")),
        dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")))
    }

  /** Incrementally-maintained index: anti-join retires + batch appends
    * + additive df/stat folds (exposed for LawsSpec-style reuse).
    */
  private[operators] val incCache = new graft.Layout("graft_bm25_inc")

  private[graft] def incIndex(s: SparkSession, d: String): String =
    incCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      val baseP = baseIndex(s, d)
      val baseTf = s.read.parquet(baseP)
      val baseDl = s.read.parquet(s"$baseP.dl")
      val m = col("doc_id") % 10
      val retired = Tables.documents(s, d)
        .filter(m.isin(3, 7)).select("doc_id")
      val fresh = IncrementalMaintainOps.freshBatchDocs(s, d)
      val freshTf = postings(fresh).localCheckpoint()
      val freshDl = doclens(fresh).localCheckpoint()
      val incTf = baseTf.join(broadcast(retired), Seq("doc_id"), "left_anti")
        .unionByName(freshTf)
      val incDl = baseDl.join(broadcast(retired), Seq("doc_id"), "left_anti")
        .unionByName(freshDl)
      // df delta: −1 per (retired doc, term) postings row PROBED from
      // the persisted base (doc-keyed broadcast semi-join), +1 per
      // fresh postings row — postings are already (doc, w)-distinct
      val dfDelta = baseTf
        .join(broadcast(retired), Seq("doc_id"), "left_semi")
        .select(col("w"), lit(-1L).as("dn"))
        .unionByName(freshTf.select(col("w"), lit(1L).as("dn")))
        .groupBy("w").agg(sum("dn").as("dn"))
      val incDf = s.read.parquet(s"$baseP.df")
        .join(broadcast(dfDelta), Seq("w"), "full_outer")
        .select(col("w"),
          (coalesce(col("df"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("df"))
        .filter(col("df") > 0)
      // stats delta: batch-sized length probes, one additive fold
      val retiredStats = baseDl
        .join(broadcast(retired), Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("dn"), sum("dl").as("ddl"))
      val freshStats = freshDl
        .agg(count(lit(1)).as("dn"), sum("dl").as("ddl"))
      val incStats = s.read.parquet(s"$baseP.stats")
        .crossJoin(broadcast(retiredStats
          .select(col("dn").as("rn"), col("ddl").as("rdl"))))
        .crossJoin(broadcast(freshStats
          .select(col("dn").as("fn"), col("ddl").as("fdl"))))
        .select(
          (col("n_docs") - col("rn") + col("fn")).as("n_docs"),
          (col("total_dl") - coalesce(col("rdl"), lit(0L))
            + coalesce(col("fdl"), lit(0L))).as("total_dl"))
      writeIndex(p, incTf, incDl, incDf, incStats)
      graft.functions.Checkpoints.release(freshTf)
      graft.functions.Checkpoints.release(freshDl)
    }

  /** From-scratch rebuild on the post-merge corpus — audit ground
    * truth, never served.
    */
  private val rebuildCache = new graft.Layout("graft_bm25_rebuild")

  private[graft] def rebuildIndex(s: SparkSession, d: String): String =
    rebuildCache(s, d, graft.Layout.fingerprint(Tables.documents(s, d))) { p =>
      val docs = IncrementalMaintainOps.postMergeDocs(s, d)
      val tf = postings(docs)
      val dl = doclens(docs)
      writeIndex(p, tf, dl,
        tf.groupBy("w").agg(count(lit(1)).as("df")),
        dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")))
    }

  /** BM25 top-10 for the R1 query-term set computed from a persisted
    * index — the consumer-visible read both layouts must answer
    * identically (identical expression text to `bm25_topk`).
    */
  private def bm25TopFromIndex(s: SparkSession, p: String): DataFrame = {
    val tf = s.read.parquet(p)
      .filter(col("w").isin(RankingOps.Bm25Terms: _*))
    val dl = s.read.parquet(s"$p.dl")
    val dfT = s.read.parquet(s"$p.df")
      .filter(col("w").isin(RankingOps.Bm25Terms: _*))
    val stats = s.read.parquet(s"$p.stats")
    tf.join(dl, "doc_id")
      .join(broadcast(dfT), "w").crossJoin(broadcast(stats))
      .withColumn("contrib_fp", expr(RankingOps.bm25ContribSql))
      .groupBy("doc_id").agg(sum("contrib_fp").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id")).limit(10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_fp").desc, col("doc_id"))))
      .select("rank", "doc_id", "score_fp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C24 — the maintenance audit (the incremental_ivf_maintain row
    // shape): maintained index vs frozen-tokenization rebuild. Laws
    // visible in the output: every postings class reads n_rows =
    // n_in_rebuild = n_all_equal; retired_delete reads 0/0;
    // df_parity / doclen_parity / key_parity read three equal counts;
    // corpus_stats reads (inc N, reb N, N if (N, total_dl) both
    // equal); topk_parity reads 10/10/10 — the consumer-visible
    // equality that makes the maintenance worth trusting.
    "incremental_bm25_maintain" -> ((s, d) => {
      val incP = incIndex(s, d)
      val rebP = rebuildIndex(s, d)
      val inc = s.read.parquet(incP)
      val reb = s.read.parquet(rebP)
      val rebR = reb.select(col("doc_id"), col("w"), col("tf").as("tf_r"))
      val per = inc.withColumn("op_class",
          when(col("doc_id") >= InsertShift, "fresh_insert")
            .when(col("doc_id") % 10 === 3, "fresh_update")
            .otherwise("carried"))
        .join(rebR, Seq("doc_id", "w"), "left")
        .groupBy("op_class")
        .agg(count(lit(1)).as("n_rows"),
          count(col("tf_r")).as("n_in_rebuild"),
          sum(when(col("tf") === col("tf_r"), 1L).otherwise(0L))
            .as("n_all_equal"))
      val ret = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 7).select("doc_id")
        .join(reb.select("doc_id").distinct()
          .withColumn("in_r", lit(1L)), Seq("doc_id"), "left")
        .join(inc.select("doc_id").distinct()
          .withColumn("in_i", lit(1L)), Seq("doc_id"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(coalesce(col("in_r"), lit(0L))).as("n_in_rebuild"),
          sum(coalesce(col("in_i"), lit(0L))).as("n_all_equal"))
        .select(lit("retired_delete").as("op_class"), col("n_rows"),
          col("n_in_rebuild"), col("n_all_equal"))
      val par = inc.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(reb.agg(count(lit(1)).as("n_in_rebuild"))))
        .crossJoin(broadcast(inc.join(rebR, Seq("doc_id", "w"))
          .filter(col("tf") === col("tf_r"))
          .agg(count(lit(1)).as("n_all_equal"))))
        .select(lit("key_parity").as("op_class"), col("n_rows"),
          col("n_in_rebuild"), col("n_all_equal"))
      val dfI = s.read.parquet(s"$incP.df")
      val dfR = s.read.parquet(s"$rebP.df")
        .select(col("w"), col("df").as("df_r"))
      val dfp = dfI.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(dfR.agg(count(lit(1)).as("n_in_rebuild"))))
        .crossJoin(broadcast(dfI.join(dfR, "w")
          .filter(col("df") === col("df_r"))
          .agg(count(lit(1)).as("n_all_equal"))))
        .select(lit("df_parity").as("op_class"), col("n_rows"),
          col("n_in_rebuild"), col("n_all_equal"))
      val dlI = s.read.parquet(s"$incP.dl")
      val dlR = s.read.parquet(s"$rebP.dl")
        .select(col("doc_id"), col("dl").as("dl_r"))
      val dlp = dlI.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(dlR.agg(count(lit(1)).as("n_in_rebuild"))))
        .crossJoin(broadcast(dlI.join(dlR, "doc_id")
          .filter(col("dl") === col("dl_r"))
          .agg(count(lit(1)).as("n_all_equal"))))
        .select(lit("doclen_parity").as("op_class"), col("n_rows"),
          col("n_in_rebuild"), col("n_all_equal"))
      val stI = s.read.parquet(s"$incP.stats")
      val stR = s.read.parquet(s"$rebP.stats")
        .select(col("n_docs").as("n_r"), col("total_dl").as("t_r"))
      val stp = stI.crossJoin(broadcast(stR))
        .select(lit("corpus_stats").as("op_class"),
          col("n_docs").as("n_rows"), col("n_r").as("n_in_rebuild"),
          when(col("n_docs") === col("n_r") &&
            col("total_dl") === col("t_r"), col("n_docs"))
            .otherwise(lit(0L)).as("n_all_equal"))
      val topI = bm25TopFromIndex(s, incP)
      val topR = bm25TopFromIndex(s, rebP)
        .select(col("rank"), col("doc_id").as("doc_r"),
          col("score_fp").as("score_r"))
      val tkp = topI.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(topR.agg(count(lit(1)).as("n_in_rebuild"))))
        .crossJoin(broadcast(topI.join(topR, "rank")
          .filter(col("doc_id") === col("doc_r") &&
            col("score_fp") === col("score_r"))
          .agg(count(lit(1)).as("n_all_equal"))))
        .select(lit("topk_parity").as("op_class"), col("n_rows"),
          col("n_in_rebuild"), col("n_all_equal"))
      per.select("op_class", "n_rows", "n_in_rebuild", "n_all_equal")
        .unionByName(ret).unionByName(par).unionByName(dfp)
        .unionByName(dlp).unionByName(stp).unionByName(tkp)
        .orderBy("op_class")
    }),
  )

  /** The oracle reads the MAINTAINED index from the persisted parquet
    * (lastPath contract) and rebuilds the post-merge corpus itself from
    * the documents table — an independent engine's ground truth.
    */
  def oracleSql: Map[String, String] = Map(
    "incremental_bm25_maintain" ->
      s"""WITH inc AS (
         |  SELECT doc_id, w, CAST(tf AS BIGINT) AS tf
         |  FROM read_parquet('${incCache.lastPath}/*.parquet')),
         |incdl AS (
         |  SELECT doc_id, CAST(dl AS BIGINT) AS dl
         |  FROM read_parquet('${incCache.lastPath}.dl/*.parquet')),
         |incdf AS (
         |  SELECT w, CAST(df AS BIGINT) AS df
         |  FROM read_parquet('${incCache.lastPath}.df/*.parquet')),
         |incst AS (
         |  SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |         CAST(total_dl AS BIGINT) AS total_dl
         |  FROM read_parquet('${incCache.lastPath}.stats/*.parquet')),
         |pm AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 10 NOT IN (3, 7)
         |  UNION ALL
         |  SELECT doc_id,
         |         array_to_string(string_split(text, ' ')[6:], ' ')
         |  FROM documents WHERE doc_id % 10 = 3
         |  UNION ALL
         |  SELECT doc_id + $InsertShift, text
         |  FROM documents WHERE doc_id % 10 = 1),
         |reb AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM pm) t
         |  GROUP BY 1, 2),
         |rebdl AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM pm),
         |rebdf AS (SELECT w, CAST(count(*) AS BIGINT) AS df
         |          FROM reb GROUP BY 1),
         |rebst AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |                 CAST(sum(dl) AS BIGINT) AS total_dl
         |          FROM rebdl),
         |per AS (
         |  SELECT CASE WHEN i.doc_id >= $InsertShift THEN 'fresh_insert'
         |              WHEN i.doc_id % 10 = 3 THEN 'fresh_update'
         |              ELSE 'carried' END AS op_class,
         |         CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(count(r.tf) AS BIGINT) AS n_in_rebuild,
         |         CAST(sum(CASE WHEN i.tf = r.tf THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_all_equal
         |  FROM inc i LEFT JOIN reb r
         |    ON r.doc_id = i.doc_id AND r.w = i.w
         |  GROUP BY 1),
         |ret AS (
         |  SELECT 'retired_delete' AS op_class,
         |         CAST(count(*) AS BIGINT) AS n_rows,
         |         CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM reb r
         |                  WHERE r.doc_id = dl.doc_id) THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_in_rebuild,
         |         CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM inc i
         |                  WHERE i.doc_id = dl.doc_id) THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_all_equal
         |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) dl),
         |par AS (
         |  SELECT 'key_parity' AS op_class,
         |         (SELECT CAST(count(*) AS BIGINT) FROM inc) AS n_rows,
         |         (SELECT CAST(count(*) AS BIGINT) FROM reb)
         |           AS n_in_rebuild,
         |         (SELECT CAST(count(*) AS BIGINT) FROM inc i
         |          JOIN reb r ON i.doc_id = r.doc_id AND i.w = r.w
         |            AND i.tf = r.tf) AS n_all_equal),
         |dfp AS (
         |  SELECT 'df_parity' AS op_class,
         |         (SELECT CAST(count(*) AS BIGINT) FROM incdf) AS n_rows,
         |         (SELECT CAST(count(*) AS BIGINT) FROM rebdf)
         |           AS n_in_rebuild,
         |         (SELECT CAST(count(*) AS BIGINT) FROM incdf i
         |          JOIN rebdf r ON i.w = r.w AND i.df = r.df)
         |           AS n_all_equal),
         |dlp AS (
         |  SELECT 'doclen_parity' AS op_class,
         |         (SELECT CAST(count(*) AS BIGINT) FROM incdl) AS n_rows,
         |         (SELECT CAST(count(*) AS BIGINT) FROM rebdl)
         |           AS n_in_rebuild,
         |         (SELECT CAST(count(*) AS BIGINT) FROM incdl i
         |          JOIN rebdl r ON i.doc_id = r.doc_id AND i.dl = r.dl)
         |           AS n_all_equal),
         |stp AS (
         |  SELECT 'corpus_stats' AS op_class,
         |         i.n_docs AS n_rows, r.n_docs AS n_in_rebuild,
         |         CASE WHEN i.n_docs = r.n_docs
         |               AND i.total_dl = r.total_dl
         |         THEN i.n_docs ELSE 0 END AS n_all_equal
         |  FROM incst i CROSS JOIN rebst r),
         |topi AS (
         |  SELECT doc_id, CAST(sum(contrib_fp) AS BIGINT) AS score_fp
         |  FROM (
         |    SELECT t.doc_id, ${RankingOps.bm25ContribSql
               .replace("\n", " ")} AS contrib_fp
         |    FROM inc t
         |    JOIN incdl d ON d.doc_id = t.doc_id
         |    JOIN incdf f ON f.w = t.w
         |    CROSS JOIN incst
         |    WHERE t.w IN ${RankingOps.Bm25InList}
         |      AND f.w IN ${RankingOps.Bm25InList}) c
         |  GROUP BY doc_id ORDER BY score_fp DESC, doc_id LIMIT 10),
         |topr AS (
         |  SELECT doc_id, CAST(sum(contrib_fp) AS BIGINT) AS score_fp
         |  FROM (
         |    SELECT t.doc_id, ${RankingOps.bm25ContribSql
               .replace("\n", " ")} AS contrib_fp
         |    FROM reb t
         |    JOIN rebdl d ON d.doc_id = t.doc_id
         |    JOIN rebdf f ON f.w = t.w
         |    CROSS JOIN rebst
         |    WHERE t.w IN ${RankingOps.Bm25InList}
         |      AND f.w IN ${RankingOps.Bm25InList}) c
         |  GROUP BY doc_id ORDER BY score_fp DESC, doc_id LIMIT 10),
         |ti AS (SELECT *, row_number() OVER (ORDER BY score_fp DESC,
         |         doc_id) AS rank FROM topi),
         |tr AS (SELECT *, row_number() OVER (ORDER BY score_fp DESC,
         |         doc_id) AS rank FROM topr),
         |tkp AS (
         |  SELECT 'topk_parity' AS op_class,
         |         (SELECT CAST(count(*) AS BIGINT) FROM ti) AS n_rows,
         |         (SELECT CAST(count(*) AS BIGINT) FROM tr)
         |           AS n_in_rebuild,
         |         (SELECT CAST(count(*) AS BIGINT) FROM ti
         |          JOIN tr ON ti.rank = tr.rank
         |            AND ti.doc_id = tr.doc_id
         |            AND ti.score_fp = tr.score_fp) AS n_all_equal)
         |SELECT * FROM per
         |UNION ALL SELECT * FROM ret
         |UNION ALL SELECT * FROM par
         |UNION ALL SELECT * FROM dfp
         |UNION ALL SELECT * FROM dlp
         |UNION ALL SELECT * FROM stp
         |UNION ALL SELECT * FROM tkp
         |ORDER BY op_class""".stripMargin,
  )
}
