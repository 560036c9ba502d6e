package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-quality repetition signals and matrix-free dimensionality
  * reduction (round-11 widening): the Gopher-style top-bigram mass
  * gate (Rae et al. 2021 §A1.1 — "fraction of characters in the most
  * common n-gram"; intra-document repetition is the single strongest
  * cheap predictor of boilerplate/spam in web corpora) and a
  * Johnson–Lindenstrauss ±1 random projection of the embedding corpus
  * (Achlioptas 2001 — the database-friendly JL; the pre-pass that lets
  * every downstream geometric operator run at k ≪ d).
  *
  * Determinism & scale design:
  *   - top_bigram_mass: bigrams explode AFTER the per-doc tokenize
  *     (token-linear, the shingle-family bound); the (doc, bigram)
  *     count and (doc) rollup are both map-side-combinable hash
  *     aggregates keyed by high-cardinality doc ids — no windows, no
  *     skewed keys (the hottest bigram is still per-doc state). Shares
  *     are exact integer ppm; per-source rollup is |sources|-bounded.
  *     Envelope: share_fp ≤ 1e6, Σ share_fp over a source fits int64
  *     to ~9.2e12 docs.
  *   - random_projection_jl: the sign matrix is DERIVED from md5
  *     (sgn(i,j) = top bit of md5("i_j")), so both engines regenerate
  *     it independently — no stored model, no join; the projection is
  *     a codegen'd map-side fold (graft.functions.JlProject, PqEncode
  *     house pattern) and ALL post-fold state is k-bounded moments.
  *     Fixed-point leaves truncate toward zero (embedding_dim_stats
  *     convention); projections are exact int64 sums (|p_j| ≤ d·1e6 ≈
  *     4e9 at d=4096); squares lift to DECIMAL(38,0) BEFORE the
  *     multiply. Output type rule (r12): NO decimal128 at the SELECT
  *     boundary — r11 proved by controlled experiment that the driver's
  *     arrow-level hash reds decimal128 outputs even when both engines
  *     emit value-identical DECIMAL(38,0) (type alignment did NOT green
  *     the cells; presence of the type itself is the trigger). Wide
  *     moments therefore stay DECIMAL(38,0)/HUGEINT internally and are
  *     emitted as canonical digit STRINGS on both engines.
  */
object QualitySignalOps extends OpGroup {

  /** share_fp threshold above which a doc counts as repetition-flagged
    * (Gopher uses 0.20 for top-2-gram character fraction; we apply the
    * same cut to the token-bigram fraction).
    */
  val FlagFp = 200000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher rep-2: per doc, the most frequent bigram's share of all
    // bigram slots, rolled up per source (mean share + docs over the
    // 20% flag line). High mean = templated/spammy source.
    "top_bigram_mass" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n", size(col("ws")))
        .filter(col("n") >= 2)
      val bg = docs.select(col("doc_id"), col("source"),
        explode(expr(
          """transform(sequence(1, n - 1),
            |  i -> concat_ws(' ', slice(ws, i, 2)))""".stripMargin))
          .as("bg"))
      val per = bg.groupBy("doc_id", "source", "bg")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "source")
        .agg(max("c").as("c_top"), sum("c").as("n_bi"))
        .withColumn("share_fp", expr("c_top * 1000000 DIV n_bi"))
      per.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("share_fp") > FlagFp, 1L).otherwise(0L))
            .as("n_flagged"),
          sum("share_fp").as("sum_share"))
        .withColumn("mean_share_fp", expr("sum_share DIV n_docs"))
        .select("source", "n_docs", "n_flagged", "mean_share_fp")
        .orderBy("source")
    }),

    // JL ±1 projection to k=8: per projected coordinate, the exact
    // fixed-point first and second moments of the whole corpus — the
    // sanity read (is the projected space non-degenerate, are
    // coordinates balanced) run before swapping d-dim ops to k-dim.
    "random_projection_jl" -> ((s, d) => {
      graft.functions.JlProject.register(s)
      Tables.embeddings(s, d)
        .select(posexplode(expr("jl_project(embedding)")).as(Seq("j", "pj")))
        .groupBy("j")
        .agg(count(lit(1)).as("n"),
          sum(col("pj").cast("decimal(38,0)")).cast("string").as("sum_fp"),
          sum(col("pj").cast("decimal(38,0)") * col("pj")).cast("string")
            .as("sumsq_fp"))
        .orderBy("j")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "top_bigram_mass" ->
      """WITH docs AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (
        |  SELECT doc_id, source,
        |         ws[CAST(t.i AS INTEGER)] || ' '
        |           || ws[CAST(t.i + 1 AS INTEGER)] AS bg
        |  FROM docs CROSS JOIN range(1, 8193) t(i)
        |  WHERE t.i <= len(ws) - 1),
        |cnt AS (SELECT doc_id, source, bg, CAST(count(*) AS BIGINT) AS c
        |        FROM bg GROUP BY 1, 2, 3),
        |per AS (SELECT doc_id, source, max(c) AS c_top,
        |               CAST(sum(c) AS BIGINT) AS n_bi
        |        FROM cnt GROUP BY 1, 2),
        |sh AS (SELECT source, c_top * 1000000 // n_bi AS share_fp FROM per)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN share_fp > 200000 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_flagged,
        |       CAST(sum(share_fp) // count(*) AS BIGINT) AS mean_share_fp
        |FROM sh GROUP BY source ORDER BY source""".stripMargin,

    "random_projection_jl" ->
      s"""WITH ex AS (
         |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
         |         CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
         |           * 1000000) AS BIGINT) AS fx
         |  FROM embeddings, UNNEST(range(1, 4097)) t(i)
         |  WHERE i <= len(embedding)),
         |signs AS (${graft.functions.JlProject.signsCteDuck}),
         |proj AS (
         |  SELECT e.vec_id, s.j, sum(s.sgn * e.fx) AS pj
         |  FROM ex e JOIN signs s ON s.i = e.pos
         |  GROUP BY 1, 2)
         |SELECT j, CAST(count(*) AS BIGINT) AS n,
         |       CAST(sum(CAST(pj AS HUGEINT)) AS VARCHAR) AS sum_fp,
         |       CAST(sum(CAST(pj AS HUGEINT) * pj) AS VARCHAR) AS sumsq_fp
         |FROM proj GROUP BY j ORDER BY j""".stripMargin,
  )
}
