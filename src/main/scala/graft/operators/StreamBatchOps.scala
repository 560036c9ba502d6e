package graft.operators

import graft.{Det, OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming window aggregations, batch-equivalent form (SURVEY.md §2.J
  * T2-T4).
  *
  * The reference's streaming shape is HTTP-triggered micro-batches into a
  * TTL'd staging queue (app.py:229-239, terraform/main.tf:50-57). Spark's
  * unified API guarantees these window expressions compute identically
  * over a bounded DataFrame and a stream, so the oracle runs the batch
  * form; StreamingSpec re-runs the same expressions through
  * `MemoryStream` + watermark to cover the streaming path (T1/T5/T6/T7).
  *
  * Window starts are epoch-aligned (Spark aligns tumbling/sliding windows
  * to 1970-01-01 UTC), exported as epoch seconds/µs so the compare is
  * timezone- and type-free. Session semantics: two events share a session
  * iff `ts_next - ts_prev < gap` (half-open [start, end) windows) — the
  * oracle's lag-emulation flags a new session at `>= gap`, mirroring that
  * exactly.
  */
object StreamBatchOps extends OpGroup {
  import Det._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T2 — 10-minute tumbling windows per event type.
    "tumbling_window_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")),

    // T3 — 10-minute windows sliding every 5 — each event lands in
    // exactly two windows.
    "sliding_window_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n"), col("sum_value"))
        .orderBy("w_start")),

    // T4 — per-user sessions with a 30-minute gap.
    "session_window_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s_start_us"),
          unix_micros(col("session_window.end")).as("s_end_us"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "s_start_us")),

    // T8 — interval-join attribution, batch form: each click credited to
    // every view by the same user in the preceding 5 minutes. The same
    // join condition runs stream-stream with two watermarks
    // (StreamingOps.intervalJoin, StreamingSpec T8); per-user time-bound
    // fan-out keeps both states bounded at 100 TB. Comparison runs in
    // epoch-µs on both engines so the ns→µs staging truncation can't
    // flip a boundary.
    "interval_join_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_us").as("v_us"),
          col("event_id").as("view_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_us").as("c_us"),
          col("event_id").as("click_id"))
      v.join(c, col("user_id") === col("c_user") &&
          col("c_us") >= col("v_us") &&
          col("c_us") <= col("v_us") + lit(300000000L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_attributed"),
          countDistinct(col("click_id")).as("n_clicks"),
          countDistinct(col("view_id")).as("n_views"))
        .orderBy("user_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "tumbling_window_agg" ->
      s"""SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS w_start,
         |       event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY w_start, event_type
         |ORDER BY w_start, event_type""".stripMargin,
    "sliding_window_agg" ->
      s"""WITH assigned AS (
         |  SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start, value
         |  FROM events
         |  UNION ALL
         |  SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT) AS w_start, value
         |  FROM events)
         |SELECT w_start, count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM assigned GROUP BY w_start ORDER BY w_start""".stripMargin,
    "session_window_agg" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
         |              WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1
         |              ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         |), sessions AS (
         |  SELECT user_id, ts, value,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT user_id, epoch_us(min(ts)) AS s_start_us,
         |       epoch_us(max(ts)) + 1800000000 AS s_end_us,
         |       count(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, s_start_us""".stripMargin,
    "interval_join_attribution" ->
      """WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS v_us, event_id AS view_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id AS c_user, epoch_us(ts) AS c_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT user_id, count(*) AS n_attributed,
        |       count(DISTINCT click_id) AS n_clicks,
        |       count(DISTINCT view_id) AS n_views
        |FROM v JOIN c ON user_id = c_user
        |  AND c_us >= v_us AND c_us <= v_us + 300000000
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
