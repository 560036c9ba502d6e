package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch quantiles and time-series gap repair (round-10
  * widening, second session): the equi-width histogram quantile sketch
  * (the mergeable bounded-memory structure a metrics pipeline keeps
  * per shard and folds at read time — t-digest's deterministic little
  * sibling) with its error EXHIBITED against the exact rank-defined
  * quantiles, and last-observation-carried-forward gap-fill over a
  * dense calendar spine (the repair every downstream forecaster
  * assumes has already happened). The reference's summary stage
  * (`/root/reference/app.py:216-220`) and date-stamped staging are the
  * seeds.
  *
  * Determinism & scale design:
  *   - The sketch is 128 integer cells; shard→global merging is cell
  *     addition (the incremental_stats_merge monoid law). Bin edges
  *     are pure integer arithmetic off the (min, max) envelope — at
  *     100 TB those two scalars come from parquet footer/catalog
  *     stats, the same S6d metadata path the row count already uses.
  *     The cumulative histogram is a ≤128² broadcast self-JOIN, not a
  *     partition-less window (PlanAudit zero-new-flags rule).
  *   - Exact quantiles are rank-defined via the GlobalRank two-phase
  *     row number (single giant group — the documented trap); the
  *     target rank ⌈q·n/100⌉ is exact integer arithmetic with n read
  *     from footer stats, not a count() scan.
  *   - LOCF runs in (nation × calendar-bounded day) partitions —
  *     ≤ spine-length rows per window task no matter how many orders
  *     exist; the daily series itself is an exact-cents
  *     map-side-combinable aggregate.
  */
object SketchFillOps extends OpGroup {

  private val Bins = 128

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Histogram-sketch quantiles vs exact: build per-shard 128-bin
    // counts, merge by addition, estimate p50/p90/p99 as the lower
    // edge of the first bin whose cumulative count reaches ⌈q·n/100⌉,
    // and report the exact rank-defined quantile beside it. The
    // |est − exact| ≤ bin-width law is what makes the sketch usable;
    // AuditSpec's sibling here (SketchFillSpec) pins it.
    "quantile_sketch_merge" -> ((s, d) => {
      val n = Tables.rowCount(s, d, "lineitem")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val ext = li.agg(min("cents").as("mn"), max("cents").as("mx"))
      val binned = li.crossJoin(broadcast(ext))
        .withColumn("bin", expr(s"((cents - mn) * $Bins) DIV (mx - mn + 1)"))
      val hist = binned
        .withColumn("shard", expr("l_orderkey DIV 1000 % 16"))
        .groupBy("shard", "bin").agg(count(lit(1)).as("c"))
        .groupBy("bin").agg(sum("c").as("c"))
      val cum = hist.as("a")
        .join(broadcast(hist.as("b")), col("b.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("bin")).agg(sum(col("b.c")).as("cum"))
      val qs = s.range(1).select(explode(expr("array(50L, 90L, 99L)")).as("q_pct"))
      val est = qs.crossJoin(broadcast(cum.crossJoin(ext)))
        .filter(col("cum") * 100 >= col("q_pct") * n)
        .groupBy("q_pct")
        .agg(min(expr(s"mn + (bin * (mx - mn + 1)) DIV $Bins")).as("est_cents"),
          max(expr(s"((mx - mn + 1) + ${Bins - 1}) DIV $Bins")).as("bin_width"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        li.select("cents"), "rn", Seq.empty, Seq("cents"))
      val exact = qs.join(ranked,
          col("rn") === expr(s"(q_pct * ${n}L + 99) DIV 100"))
        .groupBy("q_pct").agg(min("cents").as("exact_cents"))
      est.join(exact, "q_pct")
        .withColumn("abs_err", abs(col("est_cents") - col("exact_cents")))
        .select("q_pct", "est_cents", "exact_cents", "abs_err", "bin_width")
        .orderBy("q_pct")
    }),

    // LOCF gap-fill: dense (nation × day) spine over the order-date
    // range, exact-cents daily revenue where observed, the last
    // observed value carried forward through gaps, and a fill-source
    // tag. Output is spine-sized (calendar × 25 nations) — bounded
    // regardless of order volume.
    "locf_gapfill_daily" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("nation"),
          expr("CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS BIGINT)")
            .as("day"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val daily = o.groupBy("nation", "day").agg(sum("cents").as("rev_cents"))
      val span = daily.agg(min("day").as("lo"), max("day").as("hi"))
      val spine = span
        .select(explode(expr("sequence(lo, hi)")).as("day"))
        .crossJoin(broadcast(daily.select("nation").distinct()))
      val w = Window.partitionBy("nation").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("nation", "day"), "left")
        .withColumn("filled_cents",
          last("rev_cents", ignoreNulls = true).over(w))
        .select(col("nation"), col("day"), col("rev_cents"),
          coalesce(col("filled_cents"), lit(0L)).as("filled_cents"),
          when(col("rev_cents").isNotNull, "obs")
            .when(col("filled_cents").isNotNull, "locf")
            .otherwise("none").as("fill_source"))
        .orderBy("nation", "day")
    }),

    // KMV (k-minimum-values) distinct sketch per event type (r12,
    // second session): hash each user to 48 bits (the md5 split
    // convention), keep the K = 64 smallest hashes per type, estimate
    // NDV as (K−1)·2⁴⁸ / h_(K) (Bar-Yossef et al. 2002) — the
    // mergeable bounded-memory cousin of HLL whose estimate, unlike
    // HLL's, is a PURE INTEGER function of a deterministic hash: both
    // engines compute the identical estimate, so this sketch row gets
    // a full value oracle (vs the ε-banded hll rows). Exact NDV and
    // the ppm error are EXHIBITED beside the estimate (the
    // quantile_sketch_merge discipline). Scale: the min-K rank is the
    // standard per-type top-k window over the distinct-hash table;
    // sketch state is K·|types| rows.
    "kmv_distinct_sketch" -> ((s, d) => {
      val h = Tables.events(s, d)
        .select(col("event_type"), expr(
          """CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 12),
            | 16, 10) AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("h"))
        .distinct()
      val wK = Window.partitionBy("event_type").orderBy("h")
      val kth = h.withColumn("rn", row_number().over(wK))
        .filter(col("rn") <= KmvK)
        .groupBy("event_type")
        .agg(max("h").as("h_k"), count(lit(1)).as("k_kept"))
      val exact = Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      kth.join(exact, "event_type")
        .withColumn("kmv_est", expr(
          s"""CASE WHEN k_kept < $KmvK THEN n_exact
             | ELSE ($KmvK - 1) * 281474976710656 DIV h_k END"""
            .stripMargin.replace("\n", " ")))
        .withColumn("err_ppm",
          expr("abs(kmv_est - n_exact) * 1000000 DIV n_exact"))
        .select("event_type", "n_exact", "h_k", "kmv_est", "err_ppm")
        .orderBy("event_type")
    }),
  )

  /** KMV sketch size: estimator SE ≈ 1/√(K−2) ≈ 13%. */
  private val KmvK = 64L

  val oracleSql: Map[String, String] = Map(
    "kmv_distinct_sketch" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
         |           1, 12)) AS BIGINT) AS h
         |  FROM events),
         |kth AS (
         |  SELECT event_type, CAST(max(h) AS BIGINT) AS h_k,
         |         CAST(count(*) AS BIGINT) AS k_kept
         |  FROM (SELECT event_type, h,
         |          row_number() OVER (PARTITION BY event_type ORDER BY h)
         |            AS rn
         |        FROM h) r
         |  WHERE rn <= $KmvK GROUP BY event_type),
         |exact AS (
         |  SELECT event_type,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events GROUP BY event_type),
         |est AS (
         |  SELECT event_type, n_exact, h_k,
         |         CAST(CASE WHEN k_kept < $KmvK THEN n_exact
         |              ELSE ($KmvK - 1) * 281474976710656 // h_k END
         |           AS BIGINT) AS kmv_est
         |  FROM kth JOIN exact USING (event_type))
         |SELECT event_type, n_exact, h_k, kmv_est,
         |       CAST(abs(kmv_est - n_exact) * 1000000 // n_exact
         |         AS BIGINT) AS err_ppm
         |FROM est ORDER BY event_type""".stripMargin,
    "quantile_sketch_merge" ->
      s"""WITH li AS (
         |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |ext AS (SELECT min(cents) AS mn, max(cents) AS mx,
         |               CAST(count(*) AS BIGINT) AS n FROM li),
         |hist AS (
         |  SELECT ((cents - mn) * $Bins) // (mx - mn + 1) AS bin,
         |         CAST(count(*) AS BIGINT) AS c
         |  FROM li CROSS JOIN ext GROUP BY 1),
         |cum AS (
         |  SELECT a.bin, CAST(sum(b.c) AS BIGINT) AS cum
         |  FROM hist a JOIN hist b ON b.bin <= a.bin GROUP BY a.bin),
         |qs AS (SELECT CAST(q AS BIGINT) AS q_pct
         |       FROM UNNEST([50, 90, 99]) t(q)),
         |est AS (
         |  SELECT q_pct,
         |         min(mn + (bin * (mx - mn + 1)) // $Bins) AS est_cents,
         |         max(((mx - mn + 1) + ${Bins - 1}) // $Bins) AS bin_width
         |  FROM qs CROSS JOIN cum CROSS JOIN ext
         |  WHERE cum * 100 >= q_pct * n
         |  GROUP BY q_pct),
         |ranked AS (
         |  SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM li),
         |exact AS (
         |  SELECT q_pct, min(cents) AS exact_cents
         |  FROM qs CROSS JOIN ext JOIN ranked
         |    ON rn = (q_pct * n + 99) // 100
         |  GROUP BY q_pct)
         |SELECT est.q_pct, est_cents, exact_cents,
         |       abs(est_cents - exact_cents) AS abs_err, bin_width
         |FROM est JOIN exact ON est.q_pct = exact.q_pct
         |ORDER BY est.q_pct""".stripMargin,

    "locf_gapfill_daily" ->
      """WITH o AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |daily AS (
        |  SELECT nation, day, CAST(sum(cents) AS BIGINT) AS rev_cents
        |  FROM o GROUP BY nation, day),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |days AS (SELECT CAST(t.d AS BIGINT) AS day
        |         FROM span, UNNEST(range(lo, hi + 1)) t(d)),
        |spine AS (
        |  SELECT n.nation, days.day
        |  FROM days CROSS JOIN (SELECT DISTINCT nation FROM daily) n),
        |j AS (
        |  SELECT spine.nation, spine.day, daily.rev_cents
        |  FROM spine LEFT JOIN daily
        |    ON daily.nation = spine.nation AND daily.day = spine.day),
        |f AS (
        |  SELECT nation, day, rev_cents,
        |         last_value(rev_cents IGNORE NULLS) OVER (
        |           PARTITION BY nation ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS locf
        |  FROM j)
        |SELECT nation, day, rev_cents,
        |       coalesce(locf, 0) AS filled_cents,
        |       CASE WHEN rev_cents IS NOT NULL THEN 'obs'
        |            WHEN locf IS NOT NULL THEN 'locf'
        |            ELSE 'none' END AS fill_source
        |FROM f ORDER BY nation, day""".stripMargin,
  )
}
