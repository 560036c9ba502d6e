package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene widening (round 12): the remaining production gates a
  * 100 TB curation pipeline runs between near-dup clustering and the
  * mixture sampler —
  *
  *   - `dup_chunk_fraction`: Gopher rep-1 (Rae et al. 2021 §A1.1,
  *     "fraction of duplicate lines within a document") adapted to the
  *     fixture's newline-free text: the within-doc duplicate share of
  *     fixed-width token windows, rolled up per source. The intra-doc
  *     sibling of `top_bigram_mass` (hottest-n-gram share) and the
  *     corpus-wide `chunk_dedup_reassemble` (cross-doc keep-first).
  *   - `softdedup_weighting`: keep-everything-but-downweight dedup
  *     (the SoftDeDup alternative to hard removal — each doc in a
  *     near-dup cluster of size s samples at weight 1/s, so every
  *     cluster contributes unit mass and no text is discarded). Sixth
  *     consumer of the persisted ccLabels layout.
  *   - `wilson_ci_flag_rate`: the Wilson 95% score interval on each
  *     source's short-doc flag rate — the uncertainty-aware form of a
  *     rate monitor (a 2/25 source and a 80/1000 source have the same
  *     point rate but very different evidence; the decision to cut a
  *     source wants the interval, not the point).
  *   - `proportional_quota_fill`: largest-remainder (Hamilton)
  *     allocation of a fixed sampling budget across (source × lang)
  *     cells — integer quotas that sum EXACTLY to the budget, the
  *     arithmetic behind "draw 10M docs matching the corpus mix".
  *
  * Determinism & scale design:
  *   - dup_chunk_fraction: window explode is token-linear; duplicate
  *     counting is the two-level (doc, chunk)→(doc) hash-aggregate
  *     ladder (top_bigram_mass shape — map-side combinable, keyed by
  *     high-cardinality doc ids, the hottest chunk stays per-doc
  *     state). Shares are exact integer ppm; Σ share over a source
  *     fits int64 to ~9.2e12 docs.
  *   - softdedup_weighting: component sizes are one combinable count;
  *     the weight join keys on component (worst key = largest cluster,
  *     the same skew envelope every ccLabels consumer carries); w_fp =
  *     1e6 DIV s is exact toward-zero integer division on both
  *     engines. Per-source report is |sources|-bounded.
  *   - wilson_ci_flag_rate: (k, n) are exact integers; the interval is
  *     ONE shared SQL expression string evaluated by both engines —
  *     identical parse, identical IEEE operation order, identical
  *     doubles — then FLOOR'd to ppm. z² is interpolated as the same
  *     Scala-computed double literal in both texts.
  *   - proportional_quota_fill: one map-side (source × lang) count;
  *     everything after runs on the ≤|sources|·|langs| cell grid —
  *     the ranking window is partition-less but post-reduction
  *     (bm25/heaps_law PlanAudit class). Largest-remainder tie-break
  *     is total: (remainder DESC, source, lang). Σ quota = budget is
  *     an exact integer identity (pinned in CorpusHygieneSpec).
  */
object CorpusHygieneOps extends OpGroup {

  /** Token window width for rep-1. Gopher measures literal lines; the
    * fixture's text is newline-free, so "lines" are W-token windows.
    * W=2 keeps the duplicate probability of the fixture's ~31-word
    * vocabulary in a measurable range (mean ~1.5% at sf0.01).
    */
  private val ChunkW = 2

  /** dup-share ppm above which a doc counts as repetition-flagged. */
  private val DupFlagFp = 50000L

  /** Short-doc gate for the Wilson monitor (chars). */
  private val ShortChars = 150L

  /** z for the 95% two-sided Wilson interval, and z² as the EXACT
    * double literal both engines parse (1.96·1.96 in IEEE is NOT the
    * nearest double to 3.8416 — interpolating the Scala-computed value
    * guarantees both engines start from the same constant).
    */
  private val Z = "1.96"
  private val Z2: Double = 1.96 * 1.96

  /** The Wilson lo/hi bounds as SQL over integer columns k, n — ONE
    * string both engines parse, so the IEEE expression tree is
    * identical by construction. Returns (loExpr, hiExpr) in ppm.
    */
  private def wilsonFp(k: String, n: String): (String, String) = {
    val p = s"(CAST($k AS DOUBLE) / $n)"
    val denom = s"(1.0 + $Z2 / $n)"
    val center = s"(($p + $Z2 / (2.0 * $n)) / $denom)"
    val half =
      s"($Z * sqrt(($p * (1.0 - $p) + $Z2 / (4.0 * $n)) / $n) / $denom)"
    (s"CAST(FLOOR(greatest(0.0, $center - $half) * 1000000) AS BIGINT)",
      s"CAST(FLOOR(least(1.0, $center + $half) * 1000000) AS BIGINT)")
  }

  /** Sampling budget for the quota fill (docs). */
  private val QuotaBudget = 100L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher rep-1: per doc, the share of window slots occupied by a
    // repeat of another window in the SAME doc; per-source mean + docs
    // over the flag line. High mean = internally-repetitive source.
    "dup_chunk_fraction" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      val ch = docs.select(col("doc_id"), col("source"),
        explode(expr(
          s"""transform(sequence(0, CAST(ceil(size(ws) / $ChunkW.0) AS INT) - 1),
             |  i -> array_join(slice(ws, i * $ChunkW + 1, $ChunkW), ' '))"""
            .stripMargin)).as("c"))
      val per = ch.groupBy("doc_id", "source", "c")
        .agg(count(lit(1)).as("cc"))
        .groupBy("doc_id", "source")
        .agg(sum("cc").as("n_ch"), count(lit(1)).as("n_dist"))
        .withColumn("dup_fp", expr("(n_ch - n_dist) * 1000000 DIV n_ch"))
      per.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("dup_fp") > DupFlagFp, 1L).otherwise(0L))
            .as("n_flagged"),
          sum("dup_fp").as("sum_fp"))
        .withColumn("mean_dup_fp", expr("sum_fp DIV n_docs"))
        .select("source", "n_docs", "n_flagged", "mean_dup_fp")
        .orderBy("source")
    }),

    // SoftDeDup: weight 1e6/s per doc in a near-dup cluster of size s
    // (singletons weigh 1e6). Per source: docs, effective mass, and the
    // mass the downweighting removes relative to uniform sampling.
    "softdedup_weighting" -> ((s, d) => {
      val labels = s.read.parquet(TrainingDataOps.ccLabels(s, d))
      val sizes = labels.groupBy("component").agg(count(lit(1)).as("sz"))
      val w = labels.join(sizes, "component")
        .withColumn("w_fp", expr("1000000 DIV sz"))
      w.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("w_fp").as("eff_mass_fp"))
        // (n·1e6 − Σw)·1e6 / (n·1e6) reduced by 1e6: same exact integer
        // quotient, int64-safe to ~9.2e12 docs/source instead of ~9e6
        .withColumn("discount_fp",
          expr("(n_docs * 1000000 - eff_mass_fp) DIV n_docs"))
        .select("source", "n_docs", "eff_mass_fp", "discount_fp")
        .orderBy("source")
    }),

    // Kish effective sample size of the SoftDeDup weights (r12): per
    // source, ESS = (Σw)²/Σw² — how many EQUIVALENT uniform draws the
    // downweighted corpus is actually worth (heavy near-dup clusters
    // crater ESS long before they show in row counts; the standard
    // acceptance read on ANY importance-weighting scheme). Same
    // weight derivation as softdedup_weighting; squares lift to
    // DECIMAL(38,0) BEFORE multiplying (w² ≤ 1e12 per doc passes
    // int64 at ~9e6 docs/source); the two ratios take one truncation
    // each, identical on both engines.
    "importance_weight_ess" -> ((s, d) => {
      val labels = s.read.parquet(TrainingDataOps.ccLabels(s, d))
      val sizes = labels.groupBy("component").agg(count(lit(1)).as("sz"))
      val w = labels.join(sizes, "component")
        .withColumn("w_fp", expr("1000000 DIV sz"))
      w.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("w_fp").as("sw"),
          sum(expr("CAST(w_fp AS DECIMAL(38,0)) * w_fp")).as("sww"))
        .select(col("source"), col("n_docs"),
          expr("CAST(CAST(sw AS DECIMAL(38,0)) * sw DIV sww AS BIGINT)")
            .as("ess_docs"),
          expr("""CAST(CAST(sw AS DECIMAL(38,0)) * sw * 1000000
                 DIV (sww * n_docs) AS BIGINT)""").as("ess_ratio_fp"))
        .orderBy("source")
    }),

    // Wilson 95% interval on each source's short-doc rate: exact (k, n)
    // plus lo/hi ppm bounds from the shared IEEE expression.
    "wilson_ci_flag_rate" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_chars") < ShortChars, 1L).otherwise(0L)).as("k"))
      val (lo, hi) = wilsonFp("k", "n")
      per
        .withColumn("rate_fp", expr("k * 1000000 DIV n"))
        .withColumn("lo_fp", expr(lo))
        .withColumn("hi_fp", expr(hi))
        .select("source", "n", "k", "rate_fp", "lo_fp", "hi_fp")
        .orderBy("source")
    }),

    // Hamilton largest-remainder quotas: base = ⌊B·n_cell/N⌋ per cell,
    // then +1 to the cells with the largest remainders (tie: source,
    // lang asc) until Σ quota = B exactly.
    "proportional_quota_fill" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n_cell"))
      val tot = cells.agg(sum("n_cell").as("n_total"))
      val based = cells.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"$QuotaBudget * n_cell DIV n_total"))
        .withColumn("rem", expr(s"$QuotaBudget * n_cell % n_total"))
      val leftover = based.agg(sum("base").as("sum_base"))
        .select((lit(QuotaBudget) - col("sum_base")).as("n_extra"))
      // post-reduction partition-less window: the stream is already the
      // ≤|sources|·|langs| cell grid (bm25/heaps_law PlanAudit class)
      val rk = Window.orderBy(col("rem").desc, col("source"), col("lang"))
      based.crossJoin(broadcast(leftover))
        .withColumn("rn", row_number().over(rk))
        .withColumn("quota",
          expr("base + CASE WHEN rn <= n_extra THEN 1 ELSE 0 END"))
        .select("source", "lang", "n_cell", "quota")
        .orderBy("source", "lang")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "dup_chunk_fraction" ->
      s"""WITH docs AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS ws
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id, source,
         |         array_to_string(ws[(CAST(t.i AS INT) * $ChunkW + 1):
         |           least((CAST(t.i AS INT) + 1) * $ChunkW, len(ws))], ' ')
         |           AS c
         |  FROM docs CROSS JOIN range(0, 8192) t(i)
         |  WHERE t.i < ceil(len(ws) / $ChunkW.0)),
         |cnt AS (SELECT doc_id, source, c, CAST(count(*) AS BIGINT) AS cc
         |        FROM ch GROUP BY 1, 2, 3),
         |per AS (SELECT doc_id, source, CAST(sum(cc) AS BIGINT) AS n_ch,
         |               CAST(count(*) AS BIGINT) AS n_dist
         |        FROM cnt GROUP BY 1, 2),
         |sh AS (SELECT source, (n_ch - n_dist) * 1000000 // n_ch AS dup_fp
         |       FROM per)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN dup_fp > $DupFlagFp THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_flagged,
         |       CAST(sum(dup_fp) // count(*) AS BIGINT) AS mean_dup_fp
         |FROM sh GROUP BY source ORDER BY source""".stripMargin,

    // cluster labels re-derived from the documents table as the same
    // recursive closure every ccLabels consumer is checked against
    "softdedup_weighting" ->
      s"""WITH RECURSIVE ${LlmOps.jaccardCtesDuck},
         |jp AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= 0.3),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS component
         |         FROM reach GROUP BY src),
         |sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
         |          FROM comp GROUP BY component),
         |w AS (
         |  SELECT c.doc_id, 1000000 // s.sz AS w_fp
         |  FROM comp c JOIN sizes s USING (component))
         |SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(w.w_fp) AS BIGINT) AS eff_mass_fp,
         |       CAST((count(*) * 1000000 - sum(w.w_fp)) // count(*)
         |         AS BIGINT) AS discount_fp
         |FROM w JOIN documents dd ON dd.doc_id = w.doc_id
         |GROUP BY dd.source ORDER BY dd.source""".stripMargin,

    "importance_weight_ess" ->
      s"""WITH RECURSIVE ${LlmOps.jaccardCtesDuck},
         |jp AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) >= 0.3),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM jp
         |  UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS component
         |         FROM reach GROUP BY src),
         |sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
         |          FROM comp GROUP BY component),
         |w AS (
         |  SELECT c.doc_id, 1000000 // s.sz AS w_fp
         |  FROM comp c JOIN sizes s USING (component)),
         |agg AS (
         |  SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(w.w_fp) AS HUGEINT) AS sw,
         |         CAST(sum(CAST(w.w_fp AS HUGEINT) * w.w_fp) AS HUGEINT)
         |           AS sww
         |  FROM w JOIN documents dd ON dd.doc_id = w.doc_id
         |  GROUP BY dd.source)
         |SELECT source, n_docs,
         |       CAST(sw * sw // sww AS BIGINT) AS ess_docs,
         |       CAST(sw * sw * 1000000 // (sww * n_docs) AS BIGINT)
         |         AS ess_ratio_fp
         |FROM agg ORDER BY source""".stripMargin,

    "wilson_ci_flag_rate" -> {
      val (lo, hi) = wilsonFp("k", "n")
      s"""WITH per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN n_chars < $ShortChars THEN 1 ELSE 0 END)
         |           AS BIGINT) AS k
         |  FROM documents GROUP BY source)
         |SELECT source, n, k,
         |       k * 1000000 // n AS rate_fp,
         |       $lo AS lo_fp,
         |       $hi AS hi_fp
         |FROM per ORDER BY source""".stripMargin
    },

    "proportional_quota_fill" ->
      s"""WITH cells AS (
         |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_cell
         |  FROM documents GROUP BY source, lang),
         |tot AS (SELECT CAST(sum(n_cell) AS BIGINT) AS n_total FROM cells),
         |based AS (
         |  SELECT source, lang, n_cell,
         |         $QuotaBudget * n_cell // n_total AS base,
         |         $QuotaBudget * n_cell % n_total AS rem
         |  FROM cells CROSS JOIN tot),
         |lo AS (SELECT $QuotaBudget - sum(base) AS n_extra FROM based),
         |rk AS (
         |  SELECT source, lang, n_cell, base,
         |         row_number() OVER (ORDER BY rem DESC, source, lang) AS rn
         |  FROM based)
         |SELECT source, lang, n_cell,
         |       CAST(base + CASE WHEN rn <= n_extra THEN 1 ELSE 0 END
         |         AS BIGINT) AS quota
         |FROM rk CROSS JOIN lo
         |ORDER BY source, lang""".stripMargin,
  )
}
