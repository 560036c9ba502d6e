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
  *     the genuine 100 TB ANN path: train on a sample, assign cells at
  *     write time, probe 1 cell per query. Cluster assignments are
  *     model-dependent ⇒ rows-only check + structural assertions in
  *     AnnSpec.
  */
object SemiStructuredOps extends OpGroup {

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

    // IVF with a learned coarse quantizer: KMeans(16) on the embeddings,
    // probe only the query's cell, exact fixed-point cosine within it.
    "ann_kmeans_ivf" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("features",
          org.apache.spark.ml.functions.array_to_vector(
            col("embedding").cast("array<double>")))
      val km = new org.apache.spark.ml.clustering.KMeans()
        .setK(16).setSeed(42L).setMaxIter(5).setFeaturesCol("features")
        .setPredictionCol("cell")
      val assigned = km.fit(e).transform(e)
        .select(col("vec_id"), col("embedding"), col("cell"),
          graft.functions.VectorFunctions.norm("embedding").as("norm"))
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("cell").as("q_cell"),
          col("embedding").as("q_emb"), col("norm").as("q_norm"))
      val scored = assigned.join(broadcast(q),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          graft.functions.VectorFunctions.dot("q_emb", "embedding")
            / (col("q_norm") * col("norm")))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
          col("cell"), round(col("cos"), 6).as("cosine"))
        .orderBy("q_id", "rank")
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
