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

  /** `events.parquet` has shipped with two `ts` encodings across data
    * drops: parquet TIMESTAMP(NANOS) — which Spark refuses to read
    * natively ([PARQUET_TYPE_ILLEGAL]), so it is read as a nanos long and
    * truncated to microseconds (the same truncation DuckDB applies mapping
    * TIMESTAMP_NS to its µs TIMESTAMP) — and plain TIMESTAMP(MICROS),
    * which Spark reads natively. Dispatch on the footer schema so either
    * drop works unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // parquet isAdjustedToUTC=false decodes as TIMESTAMP_NTZ; every
        // consumer (unix_micros, windowing, watermarks) expects the
        // session-UTC TIMESTAMP the nanos path produced. The cast under
        // the pinned UTC session re-labels the same wall-clock instant —
        // bit-identical micros — and matches DuckDB's NTZ read.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  /** Deterministic MULTI-MONTH events view (round 16, VERDICT r15 ask
    * #3): the shipped `events` fixture spans exactly one calendar month
    * (2024-01-01..2024-01-30, TESTDATA.md), which silently degenerates
    * every calendar-month stratum to a single group — three rounds of
    * fixture-richness requests stayed driver-side, so the view closes
    * the gap builder-side. Each event shifts forward by
    * `(user_id % 3) + (day(ts) DIV 10)` CALENDAR months (the
    * CDC-batch-rule idiom — deterministic, replayable in DuckDB as
    * `ts + to_months(CAST(user_id % 3 + day(ts) // 10 AS INTEGER))`):
    *
    *   - the per-USER term spreads acquisition cohorts across
    *     Jan/Feb/Mar 2024 (3+ true month cohorts);
    *   - the day-banded per-EVENT term (days 1-9 → +0, 10-19 → +1,
    *     20-29 → +2, 30 → +3) stretches each user's month of activity
    *     across up to 4 consecutive calendar months, so retention
    *     offsets, month-over-month strata, and month-boundary
    *     crossings all actually occur. The band is monotone in `ts`
    *     within the single-month base fixture, so per-user event ORDER
    *     is preserved (k1 ≤ k2 and ts1 < ts2 ⇒ shifted1 < shifted2).
    *
    * Spark's `timestampadd(MONTH, …)` and DuckDB's month-interval
    * addition use the same end-of-month clamp (Jan 30 + 1 month →
    * Feb 29 in 2024) and both preserve time-of-day, so the two engines
    * agree bit-for-bit (the verify gate re-proves it every round).
    * Month-strata operators (CMH / Mantel–Haenszel, cohort retention)
    * consume this view and exercise TRUE month-boundary logic instead
    * of their pre-r16 epoch-week fallbacks. Scale: one map-side
    * projection over the scan, no shuffle, no state.
    */
  def eventsMultiMonth(s: SparkSession, d: String): DataFrame =
    events(s, d).withColumn("ts", org.apache.spark.sql.functions.expr(
      "timestampadd(MONTH, CAST(user_id % 3 + day(ts) DIV 10 AS INT), ts)"))

  /** DuckDB twin of [[eventsMultiMonth]] — a CTE body over `events`. */
  val eventsMultiMonthDuck: String =
    "SELECT * REPLACE (ts + to_months(CAST(user_id % 3 + day(ts) // 10 " +
      "AS INTEGER)) AS ts) FROM events"

  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Exact table row count from parquet FOOTER stats — the layout
    * manifest read (S6d / paged_agg_pushdown, Iceberg-manifest style)
    * against raw parquet: no data pages are read and NO Spark job runs.
    * For the "measured scalar" pattern (cooc_triangle_count's nd,
    * market_basket_affinity's N) this replaces a full extra table scan
    * per query invocation; at 100 TB the cost is one metadata listing +
    * footer read per file, the same work any catalog does at plan time.
    * Exactness: parquet footers record per-row-group counts written at
    * commit time; with no filter and no deletes (fixtures are immutable
    * per round) their sum IS count(*). Cached per (dir, table) beside
    * the relation cache, same lifetime.
    */
  private val rowCounts =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  def rowCount(s: SparkSession, dir: String, name: String): Long =
    rowCounts.computeIfAbsent((dir, name), { _ =>
      val conf = s.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      def files(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(files)
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
        else Seq.empty
      files(fs.getFileStatus(root)).map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
