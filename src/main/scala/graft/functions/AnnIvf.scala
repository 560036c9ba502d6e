package graft.functions

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest-neighbor search with a learned coarse
  * quantizer — the 100 TB ANN path: fit KMeans ONCE on a bounded sample
  * (offline; never inside the per-query plan), assign every vector to a
  * cell at write time, then answer each query by scoring only the
  * `nprobe` cells whose centroids are nearest to the query.
  *
  * The quantizer is SPHERICAL: vectors are L2-normalized before both
  * training and assignment, so cells partition by direction — the
  * quantity cosine top-k ranks by. Clustering raw vectors mixes
  * magnitude into the cells and craters recall.
  *
  * Scale shape: cell assignment is a map-side model.transform; the probe
  * is an equi-join on the cell id (cells are shuffle keys, candidate
  * lists stay bounded); the centroid table is 'k' rows of model metadata
  * broadcast to rank probe cells — never a per-row driver lookup.
  */
object AnnIvf {

  /** embedding (array<float>) → unit-norm `features` vector column. */
  def features(s: SparkSession, df: DataFrame): DataFrame = {
    VectorFunctions.register(s)
    df.withColumn("__n", VectorFunctions.norm("embedding"))
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(
          expr("transform(embedding, x -> CAST(x AS DOUBLE) / __n)")))
      .drop("__n")
  }

  /** Fit the coarse quantizer on a deterministic hash-sampled subset
    * (content-derived, so reproducible for a given table; the sampling
    * rate is the knob a 100 TB run turns down).
    */
  def fitQuantizer(s: SparkSession, emb: DataFrame, k: Int,
      sampleMod: Int = 2, seed: Long = 42L): KMeansModel =
    new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(features(s, emb.filter(pmod(xxhash64(col("vec_id")), lit(sampleMod)) === 0)))

  /** Top-`topK` cosine neighbors for every vector matching `queryPred`,
    * scoring only the `nprobe` nearest cells per query. Output:
    * (q_id, rank, neighbor_id, cell, cosine), deterministically ordered.
    */
  def topk(s: SparkSession, emb: DataFrame, model: KMeansModel,
      queryPred: Column, topK: Int, nprobe: Int): DataFrame =
    topkAssigned(s, model.transform(features(s, emb)), model,
      queryPred, topK, nprobe)

  /** Same search over an ALREADY cell-assigned table — the serving path:
    * cells were assigned at write time (e.g. a parquet layout
    * partitioned by `cell`), so the probe join's cell filter can prune
    * whole partitions via dynamic partition pruning instead of scanning
    * the corpus. Input needs (vec_id, embedding, cell).
    */
  def topkAssigned(s: SparkSession, assigned0: DataFrame, model: KMeansModel,
      queryPred: Column, topK: Int, nprobe: Int): DataFrame = {
    import s.implicits._
    VectorFunctions.register(s)
    val assigned = assigned0
      .select(col("vec_id"), col("embedding"), col("cell"),
        VectorFunctions.norm("embedding").as("norm"))
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cand_cell", "centroid")
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val wq = Window.partitionBy("q_id").orderBy(col("dist2"), col("cand_cell"))
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("dist2", expr(
        """aggregate(zip_with(q_emb, centroid,
          |  (x, y) -> (CAST(x AS DOUBLE) / q_norm - y)
          |          * (CAST(x AS DOUBLE) / q_norm - y)),
          |  0D, (acc, v) -> acc + v)""".stripMargin))
      .withColumn("cr", row_number().over(wq))
      .filter(col("cr") <= nprobe)
      .select(col("q_id"), col("cand_cell").as("probe_cell"),
        col("q_emb"), col("q_norm"))
    val scored = assigned.join(broadcast(qCells),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        VectorFunctions.dot("q_emb", "embedding")
          / (col("q_norm") * col("norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cell"), round(col("cos"), 6).as("cosine"))
      .orderBy("q_id", "rank")
  }
}
