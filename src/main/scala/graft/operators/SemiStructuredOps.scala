package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Modern semi-structured + learned-index operators.
  *
  *   - VARIANT (Spark 4): the schema-on-read path for `events.props`
  *     beyond string JSON functions — parse once into the binary variant
  *     encoding, extract typed fields. This is what the reference's
  *     defensive `.get(...)` dict access (app.py:143,156-157) becomes at
  *     warehouse scale.
  *   - KMeans IVF: ann_ivf_topk uses the stored `label` as the coarse
  *     cell; here the quantizer is LEARNED (MLlib KMeans, fixed seed) —
  *     the genuine 100 TB ANN path: train ONCE on a bounded
  *     deterministic sample (never inside the per-query plan), assign
  *     cells at write time, probe the nprobe=2 nearest cells per query.
  *     Cluster assignments are model-dependent ⇒ rows-only check +
  *     structural and recall assertions in AnnSpec.
  */
object SemiStructuredOps extends OpGroup {

  /** One quantizer per dataset, fitted lazily on a deterministic
    * hash-sampled subset and reused by every invocation — at 100 TB the
    * model is fitted offline on a sample and persisted next to the
    * table; re-training inside a query would be wrong by construction.
    * k=4 cells: the fixture embeddings are directionally near-uniform
    * (AnnSpec measures the recall ceilings), so fewer, larger cells is
    * the honest recall/efficiency point for THIS corpus; clustered
    * corpora take a larger k (AnnSpec's planted-cluster test runs k=8).
    */
  private val quantizers =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.ml.clustering.KMeansModel]()

  private def quantizer(s: SparkSession, d: String): org.apache.spark.ml.clustering.KMeansModel =
    quantizers.computeIfAbsent(d, _ =>
      graft.functions.AnnIvf.fitQuantizer(s, Tables.embeddings(s, d), k = 4))

  /** Write-time-indexed serving layout: the corpus persisted as parquet
    * PARTITIONED BY its quantizer cell, once per (session, dataset) —
    * "assign cells at write time" made literal. Probing this layout can
    * skip whole cell directories (dynamic partition pruning; PlanSpec
    * asserts it) instead of scanning the corpus. The centroids (k rows of
    * model metadata) are persisted as a sibling parquet: together the two
    * files make the learned model's output plain INPUT DATA, so the
    * DuckDB oracle can re-derive the whole probe + exact-cosine ranking
    * independently (see [[oracleSql]]).
    */
  private val ivfLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Layout most recently touched by a declared query — the oracle (which
    * has no dataset parameter) reads it; Verify runs every query before
    * dumping oracle SQL, so it is always set by then.
    */
  @volatile private var lastLayout: String = "/tmp/graft_ivf/UNMATERIALIZED"

  private[graft] def ivfLayout(s: SparkSession, d: String): String = {
    val path = ivfLayouts.computeIfAbsent(d, _ => {
      val p = s"/tmp/graft_ivf/${s.sparkContext.applicationId}/${math.abs(d.hashCode)}"
      quantizer(s, d)
        .transform(graft.functions.AnnIvf.features(s, Tables.embeddings(s, d)))
        .select(col("vec_id"), col("embedding"), col("cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("cell").parquet(p)
      import s.implicits._
      quantizer(s, d).clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }
        .toDF("cand_cell", "centroid")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$p.centroids")
      p
    })
    lastLayout = path
    path
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // VARIANT parse + typed path extraction.
    "variant_semistructured" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'long')").as("k_long"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'long')").as("absent"))
        .orderBy("event_id")),

    // IVF with a learned coarse quantizer: the pre-fitted spherical
    // KMeans model assigns cells at scan time; each query probes its
    // nprobe=2 nearest centroids (recall floor asserted in AnnSpec
    // against the exact brute-force top-k), exact fixed-point cosine
    // within them. See graft.functions.AnnIvf for the plan shape.
    "ann_kmeans_ivf" -> ((s, d) =>
      graft.functions.AnnIvf.topk(s, Tables.embeddings(s, d),
        quantizer(s, d), col("vec_id") < 10, topK = 3, nprobe = 2)),

    // The SERVING form of the same search: probe the cell-partitioned
    // parquet layout — cells assigned at write time, probe filters prune
    // whole cell directories (dynamic partition pruning). Must return
    // exactly what the in-memory path returns (AnnSpec asserts identity).
    "ann_ivf_partition_pruned" -> ((s, d) => {
      val stored = s.read.parquet(ivfLayout(s, d))
      graft.functions.AnnIvf.topkAssigned(s, stored, quantizer(s, d),
        col("vec_id") < 10, topK = 3, nprobe = 2)
    }),
  )

  /** `def`, not `val`: the ANN oracle references the session's serving
    * layout, known only after the query has materialized it (Verify's
    * run order guarantees that). The oracle is STRUCTURAL, not circular:
    * the layout + centroid files carry only the learned model's output
    * (cell assignments, k centroid vectors); the probe selection
    * (nprobe=2 nearest centroids) and the exact fixed-point cosine top-k
    * inside the probed cells are both re-derived in DuckDB from scratch.
    * Cosine ranking is bit-exact (integer fixed-point dot, exact norms);
    * the centroid-distance ranking sums IEEE doubles in engine order, so
    * it agrees whenever no two centroid distances are within an ulp —
    * guaranteed here by well-separated centroids (AnnSpec measures them).
    */
  def oracleSql: Map[String, String] = Map(
    "variant_semistructured" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(NULL AS BIGINT) AS absent
        |FROM events ORDER BY event_id""".stripMargin,
    "ann_ivf_partition_pruned" -> {
      import graft.functions.VectorFunctions.dotFpDuck
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding, CAST(cell AS INTEGER) AS cell
         |  FROM read_parquet('$lastLayout/cell=*/*.parquet', hive_partitioning=1)),
         |cent AS (
         |  SELECT CAST(cand_cell AS INTEGER) AS cand_cell, centroid
         |  FROM read_parquet('$lastLayout.centroids/*.parquet')),
         |norms AS (
         |  SELECT c.vec_id,
         |         sqrt(CAST(${dotFpDuck("embedding", "embedding")} AS DOUBLE) / 1e15) AS norm
         |  FROM corpus c CROSS JOIN range(1, 2049) t(i)
         |  WHERE t.i <= len(c.embedding)
         |  GROUP BY c.vec_id),
         |q AS (
         |  SELECT c.vec_id AS q_id, c.embedding AS q_emb, n.norm AS q_norm
         |  FROM corpus c JOIN norms n ON c.vec_id = n.vec_id
         |  WHERE c.vec_id < 10),
         |dist AS (
         |  SELECT q.q_id, ct.cand_cell,
         |         sum((CAST(q.q_emb[t.i] AS DOUBLE) / q.q_norm - ct.centroid[t.i])
         |           * (CAST(q.q_emb[t.i] AS DOUBLE) / q.q_norm - ct.centroid[t.i])) AS dist2
         |  FROM q CROSS JOIN cent ct CROSS JOIN range(1, 2049) t(i)
         |  WHERE t.i <= least(len(q.q_emb), len(ct.centroid))
         |  GROUP BY q.q_id, ct.cand_cell),
         |probes AS (
         |  SELECT q_id, cand_cell FROM (
         |    SELECT q_id, cand_cell,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY dist2, cand_cell) AS cr
         |    FROM dist)
         |  WHERE cr <= 2),
         |dots AS (
         |  SELECT q.q_id, c.vec_id, c.cell,
         |         ${dotFpDuck("q.q_emb", "c.embedding")} AS dot
         |  FROM q JOIN probes p ON q.q_id = p.q_id
         |         JOIN corpus c ON c.cell = p.cand_cell AND c.vec_id <> q.q_id
         |  CROSS JOIN range(1, 2049) t(i)
         |  WHERE t.i <= least(len(q.q_emb), len(c.embedding))
         |  GROUP BY q.q_id, c.vec_id, c.cell),
         |scored AS (
         |  SELECT d.q_id, d.vec_id, d.cell,
         |         (CAST(d.dot AS DOUBLE) / 1e15) / (nq.norm * nc.norm) AS cos
         |  FROM dots d JOIN norms nq ON d.q_id = nq.vec_id
         |              JOIN norms nc ON d.vec_id = nc.vec_id)
         |SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id AS neighbor_id,
         |       cell, round(cos, 6) AS cosine
         |FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |        ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
    },
  )
}
