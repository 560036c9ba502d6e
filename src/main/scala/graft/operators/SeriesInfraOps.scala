package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series integration and infrastructure-planning operators
  * (round-10 widening, second session): time-weighted averaging (the
  * billing-meter/TWAP semantics where a value HOLDS until the next
  * observation — mean-of-samples is simply wrong for irregular
  * telemetry), SAX symbolic compression of the weekly revenue series
  * (the symbol stream a cheap pattern matcher scans instead of raw
  * floats), and a consistent-hashing rebalance audit (what fraction of
  * keys actually move when 16 shards become 24 — the number that
  * decides a resharding strategy). The reference's offset-sharded
  * pagination (`/root/reference/app.py:158`) is the seed of the
  * sharding question.
  *
  * Determinism & scale design:
  *   - TWAP needs each event's successor. `lag()` over
  *     `partition by event_type` is the LOW-CARDINALITY WINDOW TRAP
  *     (5 types ⇒ 5 giant tasks), so the successor is derived
  *     SKEW-PROOF: a GlobalRank two-phase row number per type, then a
  *     SELF-JOIN on (type, rn) = (type, rn−1) — an AQE-splittable
  *     equi-join carrying the same information a window lag would.
  *     Segment value·duration products are exact integers folded in
  *     DECIMAL(38,0); the final TWAP is one integer division.
  *   - SAX is window-free: weekly segments are a groupBy (epoch_day
  *     DIV 7); z-scores are ONE shared leaf double over exact sums,
  *     FLOOR 1e-6; the symbol is assigned by INTEGER threshold
  *     comparisons on z_fp (±674490 ≈ ±0.67449σ, the N(0,1)
  *     quartiles), so the a/b/c/d alphabet is engine-exact.
  *   - The hash ring is CONSTANT-sized state (shards × vnodes md5
  *     points, built in-plan and broadcast); each key's successor is a
  *     map-side conditional-min over the broadcast ring — the corpus
  *     never joins anything bigger than the ring. The mod-scheme
  *     comparison shares the same md5 key hash.
  */
object SeriesInfraOps extends OpGroup {

  private val VNodes = 8

  /** Engine-common 32-bit md5 hash (the span_corruption idiom). */
  private def h32Spark(e: String) =
    s"CAST(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  private def h32Duck(e: String) =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Ring points for `n` shards × VNodes as a Spark relation of
    * (shard, point). Built from a sequence explode — constant-sized.
    */
  private def ringSpark(s: SparkSession, n: Int): DataFrame =
    s.range(1).select(explode(expr(
        s"flatten(transform(sequence(0, ${n - 1}), sh -> " +
          s"transform(sequence(0, ${VNodes - 1}), v -> named_struct(" +
          s"'shard', sh, 'point', ${h32Spark(s"concat(CAST(sh AS STRING), ':', CAST(v AS STRING))")}))))"))
        .as("r"))
      .select(col("r.shard").as("shard"), col("r.point").as("point"))

  private def ringDuck(n: Int): String =
    s"""SELECT sh.s AS shard,
       |       ${h32Duck("CAST(sh.s AS VARCHAR) || ':' || CAST(v.v AS VARCHAR)")} AS point
       |FROM UNNEST(range(0, $n)) sh(s)
       |CROSS JOIN UNNEST(range(0, $VNodes)) v(v)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Time-weighted average value per event type: each observation
    // holds until the type's next observation; TWAP = Σ v·Δt / Σ Δt
    // over the covered span, beside the naive mean for contrast.
    "twap_by_event_type" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("v_fp"))
      val ranked = graft.functions.GlobalRank.rowNumber(
        ev, "rn", Seq("event_type"), Seq("us", "event_id"))
      val nxt = ranked.select(col("event_type"),
        (col("rn") - 1).as("rn"), col("us").as("us_next"))
      val segs = ranked.join(nxt, Seq("event_type", "rn"))
        .select(col("event_type"), col("v_fp"),
          (col("us_next") - col("us")).as("dur"))
      segs.groupBy("event_type")
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur")).as("covered_us"),
          sum(expr("CAST(v_fp AS DECIMAL(38,0)) * dur")).as("vw"),
          sum(col("v_fp").cast("decimal(38,0)")).as("vs"))
        .select(col("event_type"), col("n_segments"), col("covered_us"),
          expr("CAST(vw DIV covered_us AS BIGINT)").as("twap_fp"),
          expr("CAST(vs DIV n_segments AS BIGINT)").as("naive_mean_fp"))
        .orderBy("event_type")
    }),

    // SAX symbolic compression: weekly revenue means → z-scores →
    // a/b/c/d symbols at the N(0,1) quartile breakpoints, assigned by
    // integer comparisons on the 1e-6 fixed-point z.
    "sax_symbolic_week" -> ((s, d) => {
      val weekly = Tables.orders(s, d)
        .select(expr("CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS BIGINT) DIV 7")
            .as("week"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .groupBy("week").agg(sum("cents").as("wk_cents"))
      val mom = weekly.agg(count(lit(1)).as("n"),
        sum(col("wk_cents").cast("decimal(38,0)")).as("sx"),
        sum(expr("CAST(wk_cents AS DECIMAL(38,0)) * wk_cents")).as("sxx"))
      weekly.crossJoin(broadcast(mom))
        .withColumn("z_fp", expr(
          """CAST(FLOOR((CAST(wk_cents AS DOUBLE) - CAST(sx AS DOUBLE) / n)
            | / sqrt(CAST(sxx AS DOUBLE) / n
            |   - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
            | * 1000000.0) AS BIGINT)""".stripMargin))
        .withColumn("symbol",
          when(col("z_fp") < -674490L, "a")
            .when(col("z_fp") < 0L, "b")
            .when(col("z_fp") < 674490L, "c")
            .otherwise("d"))
        .select("week", "wk_cents", "z_fp", "symbol")
        .orderBy("week")
    }),

    // Consistent-hash rebalance audit: moving 16 → 24 shards, what
    // fraction of doc keys relocate under (a) mod-N assignment and
    // (b) a VNodes-per-shard hash ring (the 16-shard ring is a strict
    // subset of the 24-shard ring's points, as in a real ring grow).
    "consistent_hash_rebalance" -> ((s, d) => {
      val keys = Tables.documents(s, d)
        .select(col("doc_id"),
          expr(h32Spark("CAST(doc_id AS STRING)")).as("h"))
      def owner(ring: DataFrame, outCol: String) = {
        val arr = ring.agg(
          expr("array_sort(collect_list(named_struct('point', point, 'shard', shard)))")
            .as("ring"))
        keys.crossJoin(broadcast(arr))
          .withColumn(outCol, expr(
            // successor on the ring: first point ≥ h, wrapping to the
            // global minimum; ties on point break by shard inside the
            // sorted struct array (filter preserves sort order)
            """coalesce(get(filter(ring, r -> r.point >= h), 0).shard,
              |         get(ring, 0).shard)""".stripMargin))
          .select(col("doc_id"), col("h"), col(outCol))
      }
      val o16 = owner(ringSpark(s, 16), "ring16")
      val o24 = owner(ringSpark(s, 24), "ring24")
      keys
        .withColumn("mod16", col("h") % 16)
        .withColumn("mod24", col("h") % 24)
        .join(o16.select("doc_id", "ring16"), "doc_id")
        .join(o24.select("doc_id", "ring24"), "doc_id")
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("mod16") =!= col("mod24"), 1L).otherwise(0L))
            .as("moved_mod"),
          sum(when(col("ring16") =!= col("ring24"), 1L).otherwise(0L))
            .as("moved_ring"))
        .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
          expr("moved_mod * 1000000 DIV n_keys").as("moved_mod_fp"),
          expr("moved_ring * 1000000 DIV n_keys").as("moved_ring_fp"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "twap_by_event_type" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |         CAST(round(value * 1000) AS BIGINT) AS v_fp
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, us, event_id, v_fp,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY us, event_id) AS rn
        |  FROM ev),
        |segs AS (
        |  SELECT a.event_type, a.v_fp, b.us - a.us AS dur
        |  FROM ranked a JOIN ranked b
        |    ON b.event_type = a.event_type AND b.rn = a.rn + 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
        |       CAST(sum(dur) AS BIGINT) AS covered_us,
        |       CAST(sum(CAST(v_fp AS HUGEINT) * dur) // sum(dur) AS BIGINT)
        |         AS twap_fp,
        |       CAST(sum(CAST(v_fp AS HUGEINT)) // count(*) AS BIGINT)
        |         AS naive_mean_fp
        |FROM segs GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sax_symbolic_week" ->
      """WITH weekly AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS week,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS wk_cents
        |  FROM orders GROUP BY 1),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(wk_cents AS HUGEINT)) AS HUGEINT) AS sx,
        |         CAST(sum(CAST(wk_cents AS HUGEINT) * wk_cents) AS HUGEINT)
        |           AS sxx
        |  FROM weekly),
        |z AS (
        |  SELECT week, wk_cents,
        |         CAST(FLOOR((CAST(wk_cents AS DOUBLE) - CAST(sx AS DOUBLE) / n)
        |           / sqrt(CAST(sxx AS DOUBLE) / n
        |             - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |           * 1000000.0) AS BIGINT) AS z_fp
        |  FROM weekly CROSS JOIN mom)
        |SELECT week, wk_cents, z_fp,
        |       CASE WHEN z_fp < -674490 THEN 'a'
        |            WHEN z_fp < 0 THEN 'b'
        |            WHEN z_fp < 674490 THEN 'c'
        |            ELSE 'd' END AS symbol
        |FROM z ORDER BY week""".stripMargin,

    "consistent_hash_rebalance" ->
      s"""WITH keys AS (
         |  SELECT doc_id,
         |         ${h32Duck("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |ring16 AS (${ringDuck(16).replace("\n", " ")}),
         |ring24 AS (${ringDuck(24).replace("\n", " ")}),
         |o16 AS (
         |  SELECT k.doc_id,
         |         coalesce(
         |           (SELECT r.shard FROM ring16 r WHERE r.point >= k.h
         |            ORDER BY r.point, r.shard LIMIT 1),
         |           (SELECT r.shard FROM ring16 r
         |            ORDER BY r.point, r.shard LIMIT 1)) AS ring16
         |  FROM keys k),
         |o24 AS (
         |  SELECT k.doc_id,
         |         coalesce(
         |           (SELECT r.shard FROM ring24 r WHERE r.point >= k.h
         |            ORDER BY r.point, r.shard LIMIT 1),
         |           (SELECT r.shard FROM ring24 r
         |            ORDER BY r.point, r.shard LIMIT 1)) AS ring24
         |  FROM keys k),
         |m AS (
         |  SELECT count(*) AS n_keys,
         |         sum(CASE WHEN k.h % 16 <> k.h % 24 THEN 1 ELSE 0 END)
         |           AS moved_mod,
         |         sum(CASE WHEN o16.ring16 <> o24.ring24 THEN 1 ELSE 0 END)
         |           AS moved_ring
         |  FROM keys k JOIN o16 ON o16.doc_id = k.doc_id
         |              JOIN o24 ON o24.doc_id = k.doc_id)
         |SELECT CAST(n_keys AS BIGINT) AS n_keys,
         |       CAST(moved_mod AS BIGINT) AS moved_mod,
         |       CAST(moved_ring AS BIGINT) AS moved_ring,
         |       CAST(moved_mod * 1000000 // n_keys AS BIGINT) AS moved_mod_fp,
         |       CAST(moved_ring * 1000000 // n_keys AS BIGINT) AS moved_ring_fp
         |FROM m""".stripMargin,
  )
}
