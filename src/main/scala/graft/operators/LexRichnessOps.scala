package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classical lexical-richness and keyness statistics over the document
  * corpus (round 13) — the vocabulary-shape reads a corpus-curation
  * pipeline runs per source next to the Heaps/Zipf/Yule suite:
  *
  *   - Herdan's C and Guiraud's R (log- and root-normalized type-token
  *     ratios — the two standard length-corrected TTRs predating MATTR);
  *   - Sichel's S and Honoré's H (dis-/hapax-legomenon richness — the
  *     frequency-spectrum corner Good–Turing reads for mass estimation,
  *     here read for authorship/quality drift);
  *   - Dunning's log-likelihood keyness G² (Dunning 1993) — THE
  *     standard "which terms characterize this source vs the rest"
  *     statistic, robust at low expected counts where χ² keyness
  *     breaks;
  *   - Gries' deviation of proportions DP (Gries 2008) — corpus-parts
  *     dispersion: a high-frequency term concentrated in one source is
  *     templated boilerplate, not language.
  *
  * Scale & exactness: every statistic folds from the (source, word)
  * count table — one map-side-combinable explode+groupBy over the
  * corpus, the oov_rate/lexical_diversity precedent — then
  * |sources|- or |vocab|-bounded arithmetic. Sichel and DP are PURE
  * integer (1e6 fixed point, DECIMAL(38,0)/HUGEINT lifts); Herdan /
  * Honoré / G² end in ONE shared-text IEEE leaf over exact integers.
  * Top-k outputs resolve via TakeOrdered with full tiebreaks.
  */
object LexRichnessOps extends OpGroup {

  /** Minimum corpus frequency for a term to enter the keyness /
    * dispersion reports — below this the statistics are all-tie noise
    * (a hapax's DP is 1 − its source's share by construction).
    */
  val MinTermFreq = 5
  val MinDispFreq = 50

  /** (source, w) → c, the shared count table. */
  private def sw(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))

  private val herdanSql =
    """CASE WHEN n_tokens >= 2 THEN
      |  CAST(FLOOR(ln(CAST(n_types AS DOUBLE))
      |    / ln(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)
      |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")

  private val guiraudSql =
    """CAST(FLOOR(CAST(n_types AS DOUBLE)
      |  / sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  private val honoreSql =
    """CASE WHEN n_types > n_hapax THEN
      |  CAST(FLOOR(100.0 * ln(CAST(n_tokens AS DOUBLE))
      |    / (1.0 - CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE))
      |    * 1000.0) AS BIGINT)
      |ELSE CAST(NULL AS BIGINT) END""".stripMargin.replace("\n", " ")

  /** G² log-likelihood keyness from exact cells: a = in-source count,
    * b = rest count, n1/n2 = source/rest token totals, nn = n1+n2.
    * Zero cells contribute exactly zero (the lim x→0 x·ln x = 0
    * convention, same as the KL/MI ops); signed by over/under-use.
    */
  private val g2Sql =
    """CAST(FLOOR(
      |  (CASE WHEN CAST(a AS DOUBLE) * n2 >= CAST(b AS DOUBLE) * n1
      |    THEN 1.0 ELSE -1.0 END) *
      |  2.0 * ((CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
      |      * ln(CAST(a AS DOUBLE) * nn
      |           / (CAST(n1 AS DOUBLE) * (a + b))) ELSE 0.0 END)
      |    + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
      |      * ln(CAST(b AS DOUBLE) * nn
      |           / (CAST(n2 AS DOUBLE) * (a + b))) ELSE 0.0 END))
      |  * 1000000.0) AS BIGINT)""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "herdan_guiraud_richness" -> ((s, d) => {
      sw(s, d).groupBy("source").agg(
          sum("c").as("n_tokens"), count(lit(1)).as("n_types"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          expr(herdanSql).as("herdan_c_fp"),
          expr(guiraudSql).as("guiraud_r_fp"))
        .orderBy("source")
    }),

    "sichel_honore_richness" -> ((s, d) => {
      sw(s, d).groupBy("source").agg(
          sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"))
        .select(col("source"), col("n_tokens"), col("n_types"),
          col("n_hapax"), col("n_dis"),
          expr("n_dis * 1000000 DIV n_types").as("sichel_s_fp"),
          expr(honoreSql).as("honore_h_fp"))
        .orderBy("source")
    }),

    "dunning_g2_keyness" -> ((s, d) => {
      val c = sw(s, d)
      val ns = c.groupBy("source").agg(sum("c").as("n1"))
      val wf = c.groupBy("w").agg(sum("c").as("freq"))
      val tot = ns.agg(sum("n1").as("nn"))
      c.join(wf, "w").filter(col("freq") >= MinTermFreq)
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("w"), col("c").as("a"),
          (col("freq") - col("c")).as("b"),
          col("n1"), (col("nn") - col("n1")).as("n2"), col("nn"))
        .withColumn("g2_fp", expr(g2Sql))
        .select("source", "w", "a", "b", "g2_fp")
        .orderBy(col("g2_fp").desc, col("source"), col("w"))
        .limit(20)
    }),

    "gries_dp_dispersion" -> ((s, d) => {
      val c = sw(s, d)
      val ns = c.groupBy("source").agg(sum("c").as("n_src"))
      val tot = ns.agg(sum("n_src").as("nn"))
      val wf = c.groupBy("w").agg(sum("c").as("freq"))
      // present-source term: |c·N − n_src·F|; absent sources add their
      // token share wholesale: (N − Σ_present n_src)·F. All int64 at
      // the fixture envelope (c·N ≤ 1e14); the ×1e6 step lifts to
      // DECIMAL(38,0)/HUGEINT. DP ∈ [0, 1): 0 = perfectly even.
      c.join(wf.filter(col("freq") >= MinDispFreq), "w")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(tot))
        .groupBy(col("w"), col("freq"), col("nn"))
        .agg(sum(abs(col("c") * col("nn") - col("n_src") * col("freq")))
            .as("s_present"),
          sum("n_src").as("covered_n"))
        .withColumn("s_abs",
          col("s_present") + (col("nn") - col("covered_n")) * col("freq"))
        .select(col("w"), col("freq"),
          expr("""CAST(CAST(s_abs AS DECIMAL(38,0)) * 1000000
                 | DIV (2 * CAST(freq AS DECIMAL(38,0)) * nn) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("dp_fp"))
        .orderBy(col("dp_fp").desc, col("w"))
        .limit(20)
    }),
  )

  private val swDuck =
    """sw AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |c AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
      |      FROM sw GROUP BY source, w)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "herdan_guiraud_richness" ->
      s"""WITH $swDuck,
         |m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |             CAST(count(*) AS BIGINT) AS n_types
         |      FROM c GROUP BY source)
         |SELECT source, n_tokens, n_types,
         |       $herdanSql AS herdan_c_fp,
         |       $guiraudSql AS guiraud_r_fp
         |FROM m ORDER BY source""".stripMargin,

    "sichel_honore_richness" ->
      s"""WITH $swDuck,
         |m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         |             CAST(count(*) AS BIGINT) AS n_types,
         |             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_hapax,
         |             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_dis
         |      FROM c GROUP BY source)
         |SELECT source, n_tokens, n_types, n_hapax, n_dis,
         |       CAST(n_dis * 1000000 // n_types AS BIGINT) AS sichel_s_fp,
         |       $honoreSql AS honore_h_fp
         |FROM m ORDER BY source""".stripMargin,

    "dunning_g2_keyness" ->
      s"""WITH $swDuck,
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n1
         |       FROM c GROUP BY source),
         |wf AS (SELECT w, CAST(sum(c) AS BIGINT) AS freq
         |       FROM c GROUP BY w),
         |tot AS (SELECT CAST(sum(n1) AS BIGINT) AS nn FROM ns),
         |cells AS (
         |  SELECT c.source, c.w, c.c AS a, wf.freq - c.c AS b,
         |         ns.n1, tot.nn - ns.n1 AS n2, tot.nn
         |  FROM c JOIN wf ON wf.w = c.w AND wf.freq >= $MinTermFreq
         |         JOIN ns ON ns.source = c.source
         |         CROSS JOIN tot)
         |SELECT source, w, a, b, $g2Sql AS g2_fp
         |FROM cells
         |ORDER BY g2_fp DESC, source, w LIMIT 20""".stripMargin,

    "gries_dp_dispersion" ->
      s"""WITH $swDuck,
         |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src
         |       FROM c GROUP BY source),
         |tot AS (SELECT CAST(sum(n_src) AS BIGINT) AS nn FROM ns),
         |wf AS (SELECT w, CAST(sum(c) AS BIGINT) AS freq
         |       FROM c GROUP BY w HAVING CAST(sum(c) AS BIGINT) >= $MinDispFreq),
         |agg AS (
         |  SELECT c.w, wf.freq, tot.nn,
         |         CAST(sum(abs(c.c * tot.nn - ns.n_src * wf.freq))
         |           AS BIGINT) AS s_present,
         |         CAST(sum(ns.n_src) AS BIGINT) AS covered_n
         |  FROM c JOIN wf ON wf.w = c.w
         |         JOIN ns ON ns.source = c.source
         |         CROSS JOIN tot
         |  GROUP BY c.w, wf.freq, tot.nn)
         |SELECT w, freq,
         |       CAST(CAST(s_present + (nn - covered_n) * freq AS HUGEINT)
         |         * 1000000 // (2 * CAST(freq AS HUGEINT) * nn)
         |         AS BIGINT) AS dp_fp
         |FROM agg
         |ORDER BY dp_fp DESC, w LIMIT 20""".stripMargin,
  )
}
