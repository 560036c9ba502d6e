package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-matrix algebra (round-10 widening, second session): the
  * covariance structure and leading principal component of the corpus
  * embedding matrix — the two linear-algebra reads an embedding-QC
  * pass runs before trusting a vector store (correlated dimensions ⇒
  * wasted capacity / a broken encoder head; the top component and its
  * dominance ⇒ how anisotropic the space is, the known failure mode of
  * contrastive encoders). Both are Σ-of-outer-products computations:
  * the only corpus-sized pass is the GramUpperSum typed-Aggregator
  * fold (r12 — each row multiply-adds into one d(d+1)/2-cell buffer
  * map-side, replacing the earlier per-row outer-product EXPLODE; the
  * shuffle now carries one buffer per partition, not rows·d²/2
  * records), and ALL downstream state is d²-bounded (the gram matrix),
  * which is precisely how a 1000-executor PCA is actually built —
  * partial gram per partition, one d²-sized shuffle, iterate on
  * broadcast-sized vectors.
  *
  * Determinism & scale design:
  *   - Embedding floats fix-point at the LEAF (trunc(x·1e6) — the
  *     embedding_dim_stats convention); every product/sum after is
  *     exact integer arithmetic in DECIMAL(38,0)/HUGEINT. No double
  *     exists anywhere in either query — engine agreement is
  *     arithmetic, not numerical.
  *   - The covariance test statistic is the cross-multiplied exact
  *     form n·Σxy − Σx·Σy (no division, no mean), ranked by absolute
  *     value — rank-stable under any partitioning.
  *   - Power-iteration normalization is integer: v·1e6 div max|v|,
  *     with TRUNCATING division spelled sign-explicitly on both
  *     engines (Spark DIV truncates toward zero, DuckDB // floors —
  *     the CASE makes them agree on negatives).
  *   - Envelope: per-element products fx·fx ≤ 1e12; gram cells reach
  *     rows·1e12 (DECIMAL(38,0) holds to ~1e26 rows); iteration-2
  *     terms reach d·cell·1e6 ≈ 1e22 at fixture scale — all inside
  *     DECIMAL(38,0)/HUGEINT by wide margins. `cov_num` = n·Σxy−Σx·Σy
  *     reaches rows²·1e12, past int64 already at ~3k rows — it MUST
  *     stay DECIMAL(38,0)/HUGEINT internally, never BIGINT.
  *   - Output type rule (r12): the r11 fix (cast the oracle HUGEINT
  *     to DECIMAL(38,0) so types align) did NOT green the driver
  *     hash — the driver reds decimal128 outputs even when both
  *     engines emit value-identical, type-aligned decimal128 (the r11
  *     verdict's controlled experiment: hard_negative_mining greened
  *     on BIGINT, all four decimal128-output queries stayed red). So
  *     NO decimal128 reaches any SELECT list: `cov_num` orders as
  *     exact decimal and is emitted as a canonical digit STRING on
  *     both engines.
  */
object EmbeddingAlgebraOps extends OpGroup {

  /** Leaf fixed-point of the float embedding, as an int64 array. */
  private val fxArr =
    expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT))")

  /** Truncating (toward-zero) integer division of two exact decimals,
    * spelled so Spark and DuckDB agree on negative numerators.
    */
  private def truncDivSpark(a: String, b: String) =
    s"CAST(CASE WHEN $a < 0 THEN -((-($a)) DIV ($b)) ELSE ($a) DIV ($b) END AS BIGINT)"
  private def truncDivDuck(a: String, b: String) =
    s"CAST(CASE WHEN $a < 0 THEN -((-($a)) // ($b)) ELSE ($a) // ($b) END AS BIGINT)"

  /** Exact DECIMAL(38,0) reconstruction of a GramCell limb pair. */
  private val cellSum =
    "CAST(c.sHi AS DECIMAL(38,0)) * 1000000000000000000 + c.sLo"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-|covariance| dimension pairs. r12 (VERDICT r11 polish #7):
    // the gram folds through the GramUpperSum typed Aggregator — each
    // row multiply-adds into ONE d(d+1)/2-cell buffer map-side (the
    // CharFreq precedent), so the shuffle carries one buffer per
    // partition instead of rows·d²/2 exploded records. The d
    // per-dimension sums broadcast back twice; the ranking key is the
    // exact integer n·Σxy − Σx·Σy. TakeOrdered top-20.
    "embedding_covariance_topk" -> ((s, d) => {
      val gram = udaf(new graft.functions.GramUpperSum)
      val emb = Tables.embeddings(s, d).withColumn("fxs", fxArr)
      val pairs = emb.agg(gram(col("fxs")).as("g"))
        .select(explode(col("g")).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
          expr(cellSum).as("sxy"))
        .filter(col("i") < col("j"))
      val dims = emb.select(posexplode(col("fxs")).as(Seq("pos", "fx")))
        .groupBy("pos").agg(sum(col("fx").cast("decimal(38,0)")).as("sx"))
      pairs
        .join(broadcast(dims.select(col("pos").as("i"), col("sx").as("sx_i"))), "i")
        .join(broadcast(dims.select(col("pos").as("j"), col("sx").as("sx_j"))), "j")
        .withColumn("cov_dec",
          expr("CAST(n AS DECIMAL(38,0)) * sxy - sx_i * sx_j"))
        .orderBy(abs(col("cov_dec")).desc, col("i"), col("j"))
        .limit(20)
        .select(col("i"), col("j"), col("n"),
          col("cov_dec").cast("string").as("cov_num"))
    }),

    // Leading principal component by two normalized power-iteration
    // steps over the (uncentered) gram matrix: G folds through the
    // SAME GramUpperSum map-side buffer (r12 — upper triangle only;
    // the full grid is recovered by mirroring the ≤d(d+1)/2 cells
    // inside the post-aggregate single-row array, so symmetry costs
    // zero corpus work); v₁ = G·1, v₂ = G·v̂₁, each normalized to 1e6
    // fixed point by its max-|component| (integer trunc-div). The
    // iteration state (v, its max) is d-sized — broadcast both times;
    // nothing corpus-sized survives past the first aggregate.
    "embedding_pca_power_iter" -> ((s, d) => {
      val gram = udaf(new graft.functions.GramUpperSum)
      val emb = Tables.embeddings(s, d).withColumn("fxs", fxArr)
      val g = emb.agg(gram(col("fxs")).as("gu"))
        .select(explode(expr(
          """flatten(transform(gu, c -> CASE WHEN c.i = c.j
            |  THEN array(named_struct('i', c.i, 'j', c.j,
            |    'sHi', c.sHi, 'sLo', c.sLo))
            |  ELSE array(named_struct('i', c.i, 'j', c.j,
            |      'sHi', c.sHi, 'sLo', c.sLo),
            |    named_struct('i', c.j, 'j', c.i,
            |      'sHi', c.sHi, 'sLo', c.sLo)) END))"""
            .stripMargin)).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"),
          expr(cellSum).as("gij"))
      val v1 = g.groupBy("i").agg(sum("gij").as("v1raw"))
      val m1 = v1.agg(max(abs(col("v1raw"))).as("m1"))
      val v1s = v1.crossJoin(broadcast(m1))
        .select(col("i").as("j"),
          expr(truncDivSpark("v1raw * 1000000", "m1")).as("v1s"))
      val v2 = g.join(broadcast(v1s), "j")
        .groupBy("i")
        .agg(sum(expr("gij * v1s")).as("v2raw"))
      val m2 = v2.agg(max(abs(col("v2raw"))).as("m2"))
      v2.crossJoin(broadcast(m2))
        .join(broadcast(v1s.select(col("j").as("i"), col("v1s"))), "i")
        .select(col("i").as("pos"), col("v1s"),
          expr(truncDivSpark("v2raw * 1000000", "m2")).as("v2s"))
        .orderBy("pos")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "embedding_covariance_topk" ->
      s"""WITH ex AS (
         |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
         |         CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
         |           * 1000000) AS BIGINT) AS fx
         |  FROM embeddings, UNNEST(range(1, 4097)) t(i)
         |  WHERE i <= len(embedding)),
         |pr AS (
         |  SELECT a.pos AS i, b.pos AS j, a.fx * b.fx AS p
         |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos < b.pos),
         |pa AS (
         |  SELECT i, j, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sxy
         |  FROM pr GROUP BY i, j),
         |dims AS (
         |  SELECT pos, CAST(sum(CAST(fx AS HUGEINT)) AS HUGEINT) AS sx
         |  FROM ex GROUP BY pos)
         |SELECT pa.i, pa.j, pa.n,
         |       CAST(CAST(n AS HUGEINT) * sxy - dx.sx * dy.sx
         |         AS VARCHAR) AS cov_num
         |FROM pa JOIN dims dx ON dx.pos = pa.i
         |        JOIN dims dy ON dy.pos = pa.j
         |ORDER BY abs(CAST(n AS HUGEINT) * sxy - dx.sx * dy.sx) DESC,
         |         pa.i, pa.j
         |LIMIT 20""".stripMargin,

    "embedding_pca_power_iter" ->
      s"""WITH ex AS (
         |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
         |         CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
         |           * 1000000) AS BIGINT) AS fx
         |  FROM embeddings, UNNEST(range(1, 4097)) t(i)
         |  WHERE i <= len(embedding)),
         |g AS (
         |  SELECT a.pos AS i, b.pos AS j,
         |         CAST(sum(CAST(a.fx AS HUGEINT) * b.fx) AS HUGEINT) AS gij
         |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
         |  GROUP BY a.pos, b.pos),
         |v1 AS (SELECT i, CAST(sum(gij) AS HUGEINT) AS v1raw
         |       FROM g GROUP BY i),
         |m1 AS (SELECT max(abs(v1raw)) AS m1 FROM v1),
         |v1s AS (SELECT i AS j,
         |               ${truncDivDuck("v1raw * 1000000", "m1")} AS v1s
         |        FROM v1 CROSS JOIN m1),
         |v2 AS (
         |  SELECT g.i, CAST(sum(gij * v1s) AS HUGEINT) AS v2raw
         |  FROM g JOIN v1s ON v1s.j = g.j GROUP BY g.i),
         |m2 AS (SELECT max(abs(v2raw)) AS m2 FROM v2)
         |SELECT v2.i AS pos, v1s.v1s,
         |       ${truncDivDuck("v2raw * 1000000", "m2")} AS v2s
         |FROM v2 CROSS JOIN m2
         |JOIN v1s ON v1s.j = v2.i
         |ORDER BY pos""".stripMargin,
  )
}
