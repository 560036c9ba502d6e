package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md). One parquet file per table under
  * `sfDir`. Columnar scan + Catalyst pushdown come for free; at 100 TB the
  * same call reads a partitioned directory instead of a single file, so no
  * code here may assume single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation cache — the catalog-metadata cache every warehouse
    * keeps: file listing + parquet footer schema are discovered ONCE per
    * (session, dir, table) and the analyzed relation is reused by every
    * later query (fixtures are immutable per round). Keyed by the session
    * REFERENCE (SparkSession uses identity equality) because a DataFrame
    * is bound to the session that analyzed it — an identityHashCode key
    * could collide across live sessions and hand one session a plan
    * analyzed by another. Entries are evicted when the session's context
    * ends, so stopped test sessions don't pin their DataFrames forever.
    * The DATA path is unaffected — each query still plans its own pruned
    * columnar scan.
    */
  private val relations = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    relations.computeIfAbsent(spark, s => {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            relations.remove(s)
        })
      new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
    }).computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS) which Spark
    * refuses to read natively ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * and truncate to microseconds — the same truncation DuckDB applies when
    * it maps TIMESTAMP_NS to its µs TIMESTAMP, keeping the oracle aligned.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
