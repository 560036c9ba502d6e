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
    * asserts it) instead of scanning the corpus.
    */
  private val ivfLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def ivfLayout(s: SparkSession, d: String): String =
    ivfLayouts.computeIfAbsent(d, _ => {
      val path = s"/tmp/graft_ivf/${s.sparkContext.applicationId}/${math.abs(d.hashCode)}"
      quantizer(s, d)
        .transform(graft.functions.AnnIvf.features(s, Tables.embeddings(s, d)))
        .select(col("vec_id"), col("embedding"), col("cell"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("cell").parquet(path)
      path
    })

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

  val oracleSql: Map[String, String] = Map(
    "variant_semistructured" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(NULL AS BIGINT) AS absent
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
