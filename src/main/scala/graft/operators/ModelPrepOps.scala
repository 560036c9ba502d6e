package graft.operators

import graft.{OpGroup, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-preparation operators (round-10 widening, second session):
  * the steps that turn a curated corpus into model inputs — greedy
  * farthest-point seeding (the 2-approximation k-center init every
  * distributed k-means/coreset build starts from), a CUSUM drift alarm
  * over the daily measure (the change-point gate a retraining
  * scheduler watches), and a feature-hashing collision audit (what the
  * hashing trick actually costs on THIS vocabulary before committing a
  * bucket width). The reference's summary stage
  * (`/root/reference/app.py:216-220`) is the seed: these are the
  * model-facing reads that stage grows into.
  *
  * Determinism & scale design:
  *   - Farthest-point seeding is the k-pass pattern: each round is ONE
  *     map-only distance update against a BROADCAST seed array
  *     (zip_with over the fixed-point int64 embedding — exact integer
  *     dist², no doubles) plus a 1-row argmax action. Driver state is
  *     k vectors (bounded model state — the BPE-merge/PQ-codebook
  *     precedent); ties break on vec_id so the pick is total-ordered.
  *   - CUSUM resets per calendar year, so its two stacked windows run
  *     in ≤366-row partitions — skew-immune by construction. The
  *     one-sided statistic uses the prefix-sum identity
  *     S_t = P_t − min_{τ≤t} P_τ (P = running Σ of the centered
  *     measure), all in exact 1e-6 fixed point; the alarm threshold is
  *     5× the integer mean absolute deviation.
  *   - The hashing audit is two map-side-combinable aggregates (token
  *     counts → bucket rollup); state is min(vocab, 1024 buckets).
  *     The md5-derived bucket is the engines-common content hash.
  */
object ModelPrepOps extends OpGroup {

  private val K = 4          // seeds to pick
  private val Buckets = 1024 // feature-hash table width

  /** Fixed-point int64 embedding (the embedding_dim_stats leaf). */
  private val fxArr =
    expr("transform(embedding, x -> CAST(CAST(x AS DOUBLE) * 1000000 AS BIGINT))")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Greedy k-center seeding: seed 0 is the smallest vec_id; each
    // round picks the point FARTHEST (exact integer dist², min over
    // chosen seeds) from the current seed set, ties to the smallest
    // id. Output: (seed_rank, vec_id, d2) where d2 is the point's
    // distance² to the prior seed set at pick time.
    "kcenter_farthest_seeds" -> ((s, d) => {
      import scala.collection.mutable.ArrayBuffer
      val emb = Tables.embeddings(s, d).select(col("vec_id"), fxArr.as("fxs"))
      def distTo(seed: Array[Long]): org.apache.spark.sql.Column = {
        val lit = seed.mkString("array(", "L,", "L)")
        expr(s"aggregate(zip_with(fxs, $lit, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)")
      }
      val first = emb.orderBy("vec_id").limit(1)
        .collect()(0)
      var cur = emb.withColumn("dmin", distTo(first.getSeq[Long](1).toArray))
      val picks = ArrayBuffer((0L, first.getLong(0), 0L))
      for (r <- 1 until K) {
        val p = cur.orderBy(col("dmin").desc, col("vec_id")).limit(1).collect()(0)
        picks += ((r.toLong, p.getLong(0), p.getLong(2)))
        if (r < K - 1)
          cur = cur.withColumn("dmin",
            least(col("dmin"), distTo(p.getSeq[Long](1).toArray)))
      }
      import s.implicits._
      picks.toSeq.toDF("seed_rank", "vec_id", "d2").orderBy("seed_rank")
    }),

    // Per-year CUSUM drift alarm on daily order revenue: centered
    // running sum P, one-sided CUSUM S = P − running-min(P), alarm at
    // S > 5·MAD. Everything is exact integer fixed point; windows are
    // year-sharded.
    "cusum_drift_alarm" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .select(expr("CAST(datediff(to_date(o_orderdate), DATE '1970-01-01') AS BIGINT)")
            .as("epoch_day"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          year(to_date(col("o_orderdate"))).cast("long").as("yr"))
        .groupBy("yr", "epoch_day").agg(sum("cents").as("day_cents"))
      val st = daily.agg(count(lit(1)).as("n"), sum("day_cents").as("s"))
        .select(expr("s * 1000000 DIV n").as("mu_fp"))
      val dev = daily.crossJoin(broadcast(st))
        .withColumn("xc", expr("day_cents * 1000000 - mu_fp"))
      val mad = dev.agg(count(lit(1)).as("n"), sum(abs(col("xc"))).as("sa"))
        .select(expr("sa DIV n").as("mad_fp"))
      val w = Window.partitionBy("yr").orderBy("epoch_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dev.withColumn("p", sum("xc").over(w))
        .withColumn("s_cusum", col("p") - min("p").over(w))
        .crossJoin(broadcast(mad))
        .select(col("epoch_day"), col("yr"), col("day_cents"),
          col("s_cusum").as("cusum_fp"),
          (col("s_cusum") > col("mad_fp") * 5).as("alarm"))
        .orderBy("epoch_day")
    }),

    // Feature-hashing collision audit: hash the token vocabulary into
    // 1024 buckets and report what the trick costs — distinct tokens,
    // buckets touched, tokens sharing a bucket, the worst bucket, and
    // the collision rate in 1e-6 fixed point.
    "feature_hash_collision_audit" -> ((s, d) => {
      val wc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .withColumn("bucket", expr(
          s"CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % $Buckets"))
      val bk = wc.groupBy("bucket")
        .agg(count(lit(1)).as("n_tokens"), sum("c").as("weight"))
      bk.agg(sum("n_tokens").as("n_vocab"),
          count(lit(1)).as("n_buckets_used"),
          sum(when(col("n_tokens") >= 2, col("n_tokens")).otherwise(0L))
            .as("n_collided_tokens"),
          max("n_tokens").as("max_bucket_size"))
        .withColumn("collision_rate_fp",
          expr("n_collided_tokens * 1000000 DIV n_vocab"))
    }),

    // Decision-stump split scan (r12): the best single o_totalprice
    // threshold separating finished orders (Gini impurity on a fixed
    // 50k-value grid) — the CART building block, run as histogram
    // arithmetic: ONE map-side (bin → n, pos) count pass, a prefix
    // sum over the ≤10-bin grid, and all 9 candidate splits evaluated
    // from the cumulative counts. Value-fixed bins (never rank-defined)
    // keep the state grid-bounded at any scale; squares lift to
    // DECIMAL(38,0) before multiplying (n² ≈ 1e22 at 100 TB passes
    // int64); per-threshold truncation is applied identically on both
    // engines. Output: the 9-point Gini curve + the argmin threshold.
    "gini_split_stump" -> ((s, d) => {
      val ord = Tables.orders(s, d).select(
        expr("least(CAST(FLOOR(o_totalprice / 50000) AS INT), 9)").as("bin"),
        (col("o_orderstatus") === "F").cast("long").as("pos"))
      val hist = ord.groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("pos").as("p"))
      val tot = hist.agg(sum("n").as("nt"), sum("p").as("pt"))
      // prefix sums over the ≤10-row grid (slo_error_budget pattern)
      val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
      val cum = hist
        .withColumn("nl", sum("n").over(w))
        .withColumn("pl", sum("p").over(w))
        .filter(col("bin") < 9) // threshold t = (bin+1)·50000, 9 candidates
        .crossJoin(broadcast(tot))
      def gini(posC: String, nC: String) =
        s"""CASE WHEN $nC = 0 THEN 0 ELSE 1000000 -
           |CAST((CAST($posC AS DECIMAL(38,0)) * $posC
           |  + CAST($nC - $posC AS DECIMAL(38,0)) * ($nC - $posC)) * 1000000
           |  DIV (CAST($nC AS DECIMAL(38,0)) * $nC) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")
      val curve = cum.select(
          ((col("bin") + 1) * 50000L).as("threshold"),
          col("nl").as("n_left"), col("pl").as("pos_left"),
          (col("nt") - col("nl")).as("n_right"),
          (col("pt") - col("pl")).as("pos_right"),
          col("nt"))
        .withColumn("gini_left", expr(gini("pos_left", "n_left")))
        .withColumn("gini_right", expr(gini("pos_right", "n_right")))
        .withColumn("gini_weighted_fp", expr(
          """CAST((CAST(n_left AS DECIMAL(38,0)) * gini_left
            | + CAST(n_right AS DECIMAL(38,0)) * gini_right)
            | DIV nt AS BIGINT)""".stripMargin.replace("\n", " ")))
      val best = curve.orderBy(col("gini_weighted_fp"), col("threshold"))
        .limit(1).select(col("threshold").as("best_threshold"))
      curve.crossJoin(broadcast(best))
        .select("threshold", "n_left", "pos_left", "n_right", "pos_right",
          "gini_weighted_fp", "best_threshold")
        .orderBy("threshold")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "kcenter_farthest_seeds" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS pos,
        |         CAST(trunc(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |           * 1000000) AS BIGINT) AS fx
        |  FROM embeddings, UNNEST(range(1, 4097)) t(i)
        |  WHERE i <= len(embedding)),
        |s0 AS (SELECT min(vec_id) AS sid FROM embeddings),
        |d1 AS (
        |  SELECT v.vec_id, CAST(sum((v.fx - s.fx) * (v.fx - s.fx)) AS BIGINT) AS dmin
        |  FROM ex v JOIN ex s ON s.pos = v.pos
        |    AND s.vec_id = (SELECT sid FROM s0)
        |  GROUP BY v.vec_id),
        |p1 AS (SELECT vec_id, dmin FROM d1 ORDER BY dmin DESC, vec_id LIMIT 1),
        |d2 AS (
        |  SELECT v.vec_id,
        |         least(d1.dmin,
        |           CAST(sum((v.fx - s.fx) * (v.fx - s.fx)) AS BIGINT)) AS dmin
        |  FROM ex v JOIN ex s ON s.pos = v.pos
        |    AND s.vec_id = (SELECT vec_id FROM p1)
        |  JOIN d1 ON d1.vec_id = v.vec_id
        |  GROUP BY v.vec_id, d1.dmin),
        |p2 AS (SELECT vec_id, dmin FROM d2 ORDER BY dmin DESC, vec_id LIMIT 1),
        |d3 AS (
        |  SELECT v.vec_id,
        |         least(d2.dmin,
        |           CAST(sum((v.fx - s.fx) * (v.fx - s.fx)) AS BIGINT)) AS dmin
        |  FROM ex v JOIN ex s ON s.pos = v.pos
        |    AND s.vec_id = (SELECT vec_id FROM p2)
        |  JOIN d2 ON d2.vec_id = v.vec_id
        |  GROUP BY v.vec_id, d2.dmin),
        |p3 AS (SELECT vec_id, dmin FROM d3 ORDER BY dmin DESC, vec_id LIMIT 1)
        |SELECT CAST(0 AS BIGINT) AS seed_rank,
        |       (SELECT sid FROM s0) AS vec_id, CAST(0 AS BIGINT) AS d2
        |UNION ALL SELECT 1, vec_id, dmin FROM p1
        |UNION ALL SELECT 2, vec_id, dmin FROM p2
        |UNION ALL SELECT 3, vec_id, dmin FROM p3
        |ORDER BY seed_rank""".stripMargin,

    "cusum_drift_alarm" ->
      """WITH daily AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |         CAST(date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS day_cents
        |  FROM orders GROUP BY 1, 2),
        |st AS (SELECT CAST(sum(day_cents) * 1000000 // count(*) AS BIGINT)
        |         AS mu_fp FROM daily),
        |dev AS (
        |  SELECT yr, epoch_day, day_cents,
        |         day_cents * 1000000 - mu_fp AS xc
        |  FROM daily CROSS JOIN st),
        |mad AS (SELECT CAST(sum(abs(xc)) // count(*) AS BIGINT) AS mad_fp
        |        FROM dev),
        |run AS (
        |  SELECT yr, epoch_day, day_cents,
        |         CAST(sum(xc) OVER w AS BIGINT) AS p
        |  FROM dev
        |  WINDOW w AS (PARTITION BY yr ORDER BY epoch_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |cus AS (
        |  SELECT yr, epoch_day, day_cents,
        |         p - min(p) OVER (PARTITION BY yr ORDER BY epoch_day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS cusum_fp
        |  FROM run)
        |SELECT epoch_day, yr, day_cents, cusum_fp,
        |       cusum_fp > mad_fp * 5 AS alarm
        |FROM cus CROSS JOIN mad ORDER BY epoch_day""".stripMargin,

    "feature_hash_collision_audit" ->
      s"""WITH wc AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c,
         |         CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT)
         |           % $Buckets AS bucket
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  GROUP BY w),
         |bk AS (
         |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens,
         |         CAST(sum(c) AS BIGINT) AS weight
         |  FROM wc GROUP BY bucket)
         |SELECT CAST(sum(n_tokens) AS BIGINT) AS n_vocab,
         |       CAST(count(*) AS BIGINT) AS n_buckets_used,
         |       CAST(sum(CASE WHEN n_tokens >= 2 THEN n_tokens ELSE 0 END)
         |         AS BIGINT) AS n_collided_tokens,
         |       max(n_tokens) AS max_bucket_size,
         |       CAST(sum(CASE WHEN n_tokens >= 2 THEN n_tokens ELSE 0 END)
         |         * 1000000 // sum(n_tokens) AS BIGINT) AS collision_rate_fp
         |FROM bk""".stripMargin,

    "gini_split_stump" ->
      """WITH ord AS (
        |  SELECT least(CAST(FLOOR(o_totalprice / 50000) AS INT), 9) AS bin,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
        |  FROM orders),
        |hist AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |                CAST(sum(pos) AS BIGINT) AS p
        |         FROM ord GROUP BY bin),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |               CAST(sum(p) AS BIGINT) AS pt FROM hist),
        |cum AS (
        |  SELECT bin,
        |         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS nl,
        |         CAST(sum(p) OVER (ORDER BY bin) AS BIGINT) AS pl
        |  FROM hist),
        |curve AS (
        |  SELECT (bin + 1) * 50000 AS threshold,
        |         nl AS n_left, pl AS pos_left,
        |         nt - nl AS n_right, pt - pl AS pos_right, nt,
        |         CASE WHEN nl = 0 THEN 0 ELSE 1000000 -
        |           CAST((CAST(pl AS HUGEINT) * pl
        |             + CAST(nl - pl AS HUGEINT) * (nl - pl)) * 1000000
        |             // (CAST(nl AS HUGEINT) * nl) AS BIGINT) END AS gl,
        |         CASE WHEN nt - nl = 0 THEN 0 ELSE 1000000 -
        |           CAST((CAST(pt - pl AS HUGEINT) * (pt - pl)
        |             + CAST((nt - nl) - (pt - pl) AS HUGEINT)
        |               * ((nt - nl) - (pt - pl))) * 1000000
        |             // (CAST(nt - nl AS HUGEINT) * (nt - nl)) AS BIGINT)
        |           END AS gr
        |  FROM cum CROSS JOIN tot WHERE bin < 9),
        |scored AS (
        |  SELECT threshold, n_left, pos_left, n_right, pos_right,
        |         CAST((CAST(n_left AS HUGEINT) * gl
        |           + CAST(n_right AS HUGEINT) * gr) // nt AS BIGINT)
        |           AS gini_weighted_fp
        |  FROM curve),
        |best AS (SELECT threshold AS best_threshold FROM scored
        |         ORDER BY gini_weighted_fp, threshold LIMIT 1)
        |SELECT threshold, n_left, pos_left, n_right, pos_right,
        |       gini_weighted_fp, best_threshold
        |FROM scored CROSS JOIN best ORDER BY threshold""".stripMargin,
  )
}
