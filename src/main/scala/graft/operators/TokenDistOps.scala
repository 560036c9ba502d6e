package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-distribution engineering (round-10 widening, fourth session):
  * the word2vec-family preprocessing tables — the f^0.75 negative-
  * sampling distribution, the frequent-word subsampling keep
  * probabilities (Mikolov's 1−√(t/f) rule), and Church-style term
  * burstiness (tf/df — does a term clump inside few documents or
  * spread thin). These are the vocabulary-side planning tables an
  * embedding-training pipeline derives before touching the corpus.
  *
  * Determinism & scale design: all three collapse the corpus to the
  * vocab domain map-side (per-token tf/df counts) and never rejoin the
  * corpus; the pow/sqrt leaves are single IEEE expressions over exact
  * integer counts FLOOR-fixed-pointed before any further arithmetic;
  * top-k outputs resolve via TakeOrdered on total orders.
  */
object TokenDistOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Negative-sampling table: top-20 tokens by the f^0.75 unigram
    // distribution, with fixed-point probabilities.
    "negative_sampling_table" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
        .withColumn("pow_fp", expr(
          "CAST(FLOOR(power(CAST(f AS DOUBLE), 0.75) * 1000000.0) AS BIGINT)"))
      val z = tf.agg(sum("pow_fp").as("z_mass"))
      tf.crossJoin(broadcast(z))
        .withColumn("prob_fp", expr("pow_fp * 1000000 DIV z_mass"))
        .select("w", "f", "pow_fp", "prob_fp")
        .orderBy(col("prob_fp").desc, col("w"))
        .limit(20)
    }),

    // Frequent-word subsampling: per token the discard probability
    // 1 − √(t/freq_ratio) (t = 1e-4), plus the expected kept token
    // mass per source after subsampling — the corpus-shrink estimate.
    "frequent_word_subsampling" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
      val tf = tok.groupBy("w").agg(count(lit(1)).as("f"))
      val tot = tf.agg(sum("f").as("t_tok"))
      // keep_fp = min(1, √(1e-4 · T / f)) at 1e6 — one IEEE leaf
      val keep = tf.crossJoin(broadcast(tot))
        .withColumn("keep_fp", expr(
          """least(CAST(1000000 AS BIGINT),
            |  CAST(FLOOR(sqrt(0.0001 * CAST(t_tok AS DOUBLE) / f)
            |    * 1000000.0) AS BIGINT))"""
            .stripMargin.replace("\n", " ")))
        .select("w", "keep_fp")
      tok.join(keep, "w")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum("keep_fp").as("kept_mass_fp"))
        .withColumn("kept_rate_fp",
          expr("kept_mass_fp DIV n_tokens"))
        .select("source", "n_tokens", "kept_mass_fp", "kept_rate_fp")
        .orderBy("source")
    }),

    // Burstiness: tf/df per term (clumping factor), top-20 among terms
    // seen in ≥ 5 documents.
    "term_burstiness_topk" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tf = tok.groupBy("w").agg(count(lit(1)).as("tf"))
      val df = tok.distinct().groupBy("w").agg(count(lit(1)).as("df"))
      tf.join(df, "w")
        .filter(col("df") >= 5)
        .withColumn("burstiness_fp", expr("tf * 1000000 DIV df"))
        .select("w", "tf", "df", "burstiness_fp")
        .orderBy(col("burstiness_fp").desc, col("w"))
        .limit(20)
    }),

    // Simpson concentration per source (r12, second session): D = Σp²
    // over the word unigram distribution (Simpson 1949) — the
    // repeat-probability read on vocabulary concentration, the
    // quadratic companion to the log-domain Shannon reads
    // (lexical_diversity's TTR, vocab_gini, char_entropy). Reported
    // with the effective vocabulary 1/D (how many EQUAL-mass types the
    // source behaves like — the Hill number of order 2) and evenness
    // (1/D)/types. EXACT integer arithmetic end to end: Σc² lifts to
    // DECIMAL(38,0)/HUGEINT (int64-safe only to ~3e9 tokens/source)
    // and every ratio is one integer division — no doubles anywhere.
    // Scale: the corpus collapses to the (source × vocab) count table
    // map-side; the report is |sources|-bounded.
    "simpson_diversity_by_source" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      sw.groupBy("source").agg(
          sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("scc"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr("""CAST(scc * 1000000000
                 | DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)
                 | AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("simpson_fp"),
          expr("""CAST(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens
                 | DIV scc AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("eff_types"),
          expr("""CAST(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens
                 | * 1000000 DIV (scc * n_types)
                 | AS BIGINT)""".stripMargin.replace("\n", " "))
            .as("evenness_fp"))
        .orderBy("source")
    }),

    // M38 (r14) — Pielou's evenness J = H/ln(S) (Pielou 1966): the
    // Shannon-based companion to simpson_diversity's evenness — Simpson
    // weights the head of the distribution, Shannon the whole of it, so
    // the PAIR localizes where a source's vocabulary concentration
    // lives (boilerplate head vs thin tail). Exactness: the −p·ln p
    // terms FLOOR at 1e-9 per type then integer-sum (the char_entropy
    // recipe), ln S is one FLOOR'd leaf over the exact type count, and
    // J is a 1e6 fixed-point integer division of the two. Scale: the
    // corpus collapses to the (source × type) domain map-side and
    // never rejoins; the report is |sources|-bounded.
    "pielou_evenness_by_source" -> ((s, d) => {
      val sw = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val tot = sw.groupBy("source").agg(sum("c").as("n_tokens"))
      sw.join(broadcast(tot), "source")
        .withColumn("term_fp", expr(
          """CAST(FLOOR(-(CAST(c AS DOUBLE) / n_tokens)
            | * ln(CAST(c AS DOUBLE) / n_tokens)
            | * 1000000000.0) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
        .groupBy("source", "n_tokens")
        .agg(count(lit(1)).as("n_types"), sum("term_fp").as("entropy_fp"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("entropy_fp"),
          expr("""CASE WHEN n_types >= 2 THEN
                 | CAST(CAST(entropy_fp AS DECIMAL(38,0)) * 1000000
                 |   DIV CAST(FLOOR(ln(CAST(n_types AS DOUBLE))
                 |     * 1000000000.0) AS BIGINT) AS BIGINT)
                 |ELSE CAST(NULL AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("pielou_fp"))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "negative_sampling_table" ->
      """WITH tf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents) u
        |  GROUP BY 1),
        |p AS (
        |  SELECT w, f,
        |         CAST(FLOOR(power(CAST(f AS DOUBLE), 0.75) * 1000000.0)
        |           AS BIGINT) AS pow_fp
        |  FROM tf),
        |z AS (SELECT CAST(sum(pow_fp) AS BIGINT) AS z_mass FROM p)
        |SELECT p.w, p.f, p.pow_fp,
        |       CAST(p.pow_fp * 1000000 // z.z_mass AS BIGINT) AS prob_fp
        |FROM p CROSS JOIN z
        |ORDER BY prob_fp DESC, w LIMIT 20""".stripMargin,

    "frequent_word_subsampling" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT w, CAST(count(*) AS BIGINT) AS f
        |       FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(f) AS BIGINT) AS t_tok FROM tf),
        |keep AS (
        |  SELECT tf.w,
        |         least(CAST(1000000 AS BIGINT),
        |           CAST(FLOOR(sqrt(0.0001 * CAST(t.t_tok AS DOUBLE) / tf.f)
        |             * 1000000.0) AS BIGINT)) AS keep_fp
        |  FROM tf CROSS JOIN tot t)
        |SELECT tok.source, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(k.keep_fp) AS BIGINT) AS kept_mass_fp,
        |       CAST(sum(k.keep_fp) // count(*) AS BIGINT) AS kept_rate_fp
        |FROM tok JOIN keep k ON k.w = tok.w
        |GROUP BY tok.source ORDER BY tok.source""".stripMargin,

    "term_burstiness_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT w, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1),
        |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, w FROM tok) u GROUP BY 1)
        |SELECT tf.w, tf.tf, df.df,
        |       CAST(tf.tf * 1000000 // df.df AS BIGINT) AS burstiness_fp
        |FROM tf JOIN df ON df.w = tf.w
        |WHERE df.df >= 5
        |ORDER BY burstiness_fp DESC, tf.w LIMIT 20""".stripMargin,

    "simpson_diversity_by_source" ->
      """WITH sw AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |        FROM sw GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_types,
        |         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS scc
        |  FROM cnt GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |       CAST(scc * 1000000000
        |         // (CAST(n_tokens AS HUGEINT) * n_tokens)
        |         AS BIGINT) AS simpson_fp,
        |       CAST(CAST(n_tokens AS HUGEINT) * n_tokens // scc
        |         AS BIGINT) AS eff_types,
        |       CAST(CAST(n_tokens AS HUGEINT) * n_tokens * 1000000
        |         // (scc * n_types) AS BIGINT) AS evenness_fp
        |FROM agg ORDER BY source""".stripMargin,

    "pielou_evenness_by_source" ->
      """WITH sw AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |        FROM sw GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens
        |        FROM cnt GROUP BY 1),
        |terms AS (
        |  SELECT cnt.source, tot.n_tokens,
        |    CAST(FLOOR(-(CAST(c AS DOUBLE) / n_tokens)
        |      * ln(CAST(c AS DOUBLE) / n_tokens)
        |      * 1000000000.0) AS BIGINT) AS term_fp
        |  FROM cnt JOIN tot ON tot.source = cnt.source),
        |agg AS (
        |  SELECT source, n_tokens, CAST(count(*) AS BIGINT) AS n_types,
        |         CAST(sum(term_fp) AS BIGINT) AS entropy_fp
        |  FROM terms GROUP BY 1, 2)
        |SELECT source, n_tokens, n_types, entropy_fp,
        |  CASE WHEN n_types >= 2 THEN
        |    CAST(CAST(entropy_fp AS HUGEINT) * 1000000
        |      // CAST(FLOOR(ln(CAST(n_types AS DOUBLE))
        |        * 1000000000.0) AS BIGINT) AS BIGINT)
        |  ELSE NULL END AS pielou_fp
        |FROM agg ORDER BY source""".stripMargin,
  )
}
