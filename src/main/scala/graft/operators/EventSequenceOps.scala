package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence structure analytics (round-10 widening, fourth
  * session): consecutive-day activity streaks (the gaps-and-islands
  * classic, reported as a longest-streak histogram), in-stream
  * event-type trigram paths (the 3-step generalization of
  * `markov_next_event_topk`'s transitions), and per-transition dwell
  * time medians (how long users pause between each event-type pair —
  * the latency matrix a UX/funnel review reads).
  *
  * Determinism & scale design:
  *   - All windows are USER-partitioned sequential scans over each
  *     user's own stream (the ewma_control_chart shape) — never a
  *     whole-stream partition-less window; per-user day sets are
  *     CALENDAR-bounded for the streak op.
  *   - The island id is the di − row_number trick: consecutive days
  *     share (di − rn), any gap breaks it — pure integer arithmetic.
  *   - Dwell medians are RANK-defined (lower median over a total
  *     order), computed per transition pair via
  *     [[graft.functions.GlobalRank.rowNumber]] with the pair as the
  *     group — the enum²-cardinality window trap (25 pairs would be 25
  *     tasks at 100 TB) routed through the two-phase sliced numbering.
  *   - Gaps are exact integer microseconds (unix_micros / epoch_us);
  *     outputs are counts, integer medians, and total-ordered top-k.
  */
object EventSequenceOps extends OpGroup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Longest consecutive-day activity streak per user → histogram.
    "activity_streak_histogram" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(CAST(ts AS DATE), DATE '1970-01-01')").as("di"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("di")
      val longest = days
        .withColumn("grp", col("di") - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max("len").as("streak_len"))
      longest.groupBy("streak_len")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("streak_len")
    }),

    // Top-20 event-type trigrams over each user's ordered stream.
    "event_type_trigrams" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("t1"))
        .withColumn("t2", lead("t1", 1).over(w))
        .withColumn("t3", lead("t1", 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("t1"), col("t2"), col("t3"))
          .as("trigram"))
        .groupBy("trigram").agg(count(lit(1)).as("n_occ"))
        .orderBy(col("n_occ").desc, col("trigram"))
        .limit(20)
    }),

    // Lower-median dwell microseconds per (prev_type → event_type)
    // transition, plus the transition count.
    "dwell_time_by_transition" -> ((s, d) => {
      // us = unix_micros(ts) is order-isomorphic to ts, so ordering on
      // it matches the oracle's (ts, event_id) window order exactly
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val trans = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .withColumn("prev_us", lag("us", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type"),
          (col("us") - col("prev_us")).as("gap_us"),
          col("user_id"), col("event_id"))
      val cnts = trans.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n_trans"))
      graft.functions.GlobalRank
        .rowNumber(trans, "rn", Seq("prev_type", "event_type"),
          Seq("gap_us", "user_id", "event_id"))
        .join(broadcast(cnts), Seq("prev_type", "event_type"))
        .filter(expr("rn = (n_trans + 1) DIV 2"))
        .select("prev_type", "event_type", "n_trans",
          "gap_us")
        .withColumnRenamed("gap_us", "median_gap_us")
        .orderBy("prev_type", "event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "activity_streak_histogram" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
        |  FROM events),
        |isl AS (
        |  SELECT user_id,
        |         di - row_number() OVER (PARTITION BY user_id ORDER BY di)
        |           AS grp
        |  FROM days),
        |streaks AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY user_id, grp),
        |longest AS (
        |  SELECT user_id, max(len) AS streak_len
        |  FROM streaks GROUP BY user_id)
        |SELECT streak_len, CAST(count(*) AS BIGINT) AS n_users
        |FROM longest GROUP BY streak_len ORDER BY streak_len""".stripMargin,

    "event_type_trigrams" ->
      """WITH seq AS (
        |  SELECT event_type AS t1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS t2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS t3
        |  FROM events)
        |SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
        |       CAST(count(*) AS BIGINT) AS n_occ
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n_occ DESC, trigram LIMIT 20""".stripMargin,

    "dwell_time_by_transition" ->
      """WITH trans AS (
        |  SELECT lag(event_type) OVER w AS prev_type, event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
        |         user_id, event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (SELECT * FROM trans WHERE prev_type IS NOT NULL),
        |cnts AS (
        |  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n_trans
        |  FROM t GROUP BY 1, 2),
        |ranked AS (
        |  SELECT prev_type, event_type, gap_us,
        |         row_number() OVER (PARTITION BY prev_type, event_type
        |           ORDER BY gap_us, user_id, event_id) AS rn
        |  FROM t)
        |SELECT r.prev_type, r.event_type, c.n_trans,
        |       CAST(r.gap_us AS BIGINT) AS median_gap_us
        |FROM ranked r JOIN cnts c
        |  ON c.prev_type = r.prev_type AND c.event_type = r.event_type
        |WHERE r.rn = (c.n_trans + 1) // 2
        |ORDER BY r.prev_type, r.event_type""".stripMargin,
  )
}
