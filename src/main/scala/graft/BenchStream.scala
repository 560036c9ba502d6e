package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Streaming cost split (r17, VERDICT r16 ask #5): the stream-family
  * keys hold several of the suite's top bench slots, and the committed
  * number is ONE point at one scale — which cannot say how much is
  * micro-batch FIXED overhead (trigger planning, checkpoint commits,
  * state-store setup) versus data-proportional MARGINAL cost. This main
  * measures the line instead:
  *
  *   - DATA AXIS: every T-family key runs at sf0.001 / sf0.01 / sf0.1
  *     (warm-once, then min of 2 timed runs — the Bench protocol, two
  *     runs because each point is already one of three scales) and a
  *     least-squares fit of t = fixed + marginal·rows splits the two
  *     costs. A key whose fixed term dominates at sf0.1 is priced by
  *     Structured Streaming's per-trigger floor, not by data — the
  *     unbounded-stream story the one-point bench could not prove.
  *   - BATCH AXIS: the batching-invariant streaming keys
  *     (`stream_file_source` — exactly-once pass-through sink;
  *     `stream_static_enrich` — stateless broadcast enrich) re-run at
  *     sf0.01 with `graft.stream.maxFilesPerTrigger=1` (one staged file
  *     per micro-batch) vs the default single AvailableNow batch; the
  *     delta over (n_batches − 1) is the measured PER-MICRO-BATCH
  *     overhead. Keys whose batching is semantics (T5's
  *     watermark-carrier ordering, T10/T17's ordered CDC replay) and
  *     keys where re-batching changes results (T6's cross-batch
  *     watermark dedup) are excluded from this axis by construction —
  *     fileJsonStream only honors the knob when the query passed no
  *     explicit batching.
  *
  * `stream_cdc_index_maintain` builds its delta layout write-once per
  * (session, dataset), so its warm runs time the merge-on-read
  * resolution; its COLD first invocation (staging + 3 micro-batches +
  * audits) is reported separately as `t_cold_first_invocation`.
  *
  * Output: one JSON artifact (default `BENCH_STREAM_r17.json`).
  * Usage: `runMain graft.BenchStream [out.json]`.
  */
object BenchStream {

  private val DataAxisSfs = Seq("sf0.001", "sf0.01", "sf0.1")

  /** T1–T9 + T17 (SURVEY §2.J): the file-stream keys plus the
    * unified-API batch forms whose expressions run identically on a
    * stream.
    */
  private val Keys = Seq(
    "stream_file_source",     // T1
    "tumbling_window_agg",    // T2 (unified API)
    "sliding_window_agg",     // T3 (unified API)
    "session_window_agg",     // T4 (unified API)
    "watermark_late_drop",    // T5 (pinned 1-file batching)
    "stream_dedup",           // T6
    "stateful_token_cache",   // T7 (batch form of the keyed state fn)
    "stream_stream_join",     // T8
    "stream_static_enrich",   // T9
    "stream_cdc_index_maintain") // T17 (pinned CDC batching)

  private val BatchAxisKeys = Seq("stream_file_source", "stream_static_enrich")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCH_STREAM_r17.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shed(): Unit = {
      try graft.functions.GlobalRank.releaseCheckpoints(spark)
      catch { case _: Throwable => }
      try spark.catalog.clearCache() catch { case _: Throwable => }
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir).count()

    // events-table row count per sf — the data-axis x (every T key
    // consumes events or a fixed-modulus slice of it, so costs are
    // proportional to this count)
    val rowsPerSf = DataAxisSfs.map { sfName =>
      sfName -> spark.read.parquet(s"/root/testdata/$sfName/events.parquet")
        .count()
    }.toMap

    final case class KeyResult(
        coldFirst: Double,
        bySf: Seq[(String, Double)],
        fixedSec: Double,
        marginalPerKRows: Double,
        batch: Option[(Int, Double, Double, Double)]) // (nBatches, t1, tMany, perBatch)

    val results = scala.collection.mutable.LinkedHashMap[String, KeyResult]()
    Keys.foreach { name =>
      var coldFirst = -1.0
      val bySf = DataAxisSfs.map { sfName =>
        val dir = s"/root/testdata/$sfName"
        shed()
        val cold = time(run(name, dir))
        if (sfName == "sf0.01") coldFirst = cold
        val t = (1 to 2).map(_ => time(run(name, dir))).min
        System.err.println(f"[bench-stream] $name @$sfName cold $cold%.3f " +
          f"warm $t%.3f")
        sfName -> t
      }
      // least squares t = a + b*rows over the 3 (rows, t) points
      val pts = bySf.map { case (sfName, t) =>
        (rowsPerSf(sfName).toDouble, t)
      }
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      results(name) = KeyResult(coldFirst, bySf, a, b * 1000.0, None)
    }

    // batch axis at sf0.01: default single AvailableNow batch vs one
    // file per trigger
    val sfDir = "/root/testdata/sf0.01"
    BatchAxisKeys.foreach { name =>
      shed()
      run(name, sfDir) // warm
      val tSingle = (1 to 2).map(_ => time(run(name, sfDir))).min
      spark.conf.set("graft.stream.maxFilesPerTrigger", "1")
      // staged file count = shuffle partitions (the ops stage with the
      // session default), so 1 file/trigger yields `cpus` micro-batches
      val nBatches = cpus.toInt
      run(name, sfDir) // warm under the new batching
      val tMany = (1 to 2).map(_ => time(run(name, sfDir))).min
      spark.conf.unset("graft.stream.maxFilesPerTrigger")
      val perBatch = (tMany - tSingle) / math.max(nBatches - 1, 1)
      System.err.println(f"[bench-stream] $name batch axis: 1 batch " +
        f"$tSingle%.3f vs $nBatches batches $tMany%.3f -> " +
        f"$perBatch%.4f s/batch")
      results(name) = results(name).copy(
        batch = Some((nBatches, tSingle, tMany, perBatch)))
    }

    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()

    val body = {
      val rows = results.map { case (name, r) =>
        val sfJson = r.bySf.map { case (sfName, t) =>
          f""""t_$sfName": $t%.3f""" }.mkString(", ")
        val batchJson = r.batch.map { case (nb, t1, tm, pb) =>
          f""", "batch_axis": {"n_batches": $nb, "t_one_batch": $t1%.3f, "t_per_file_batches": $tm%.3f, "per_micro_batch_overhead_sec": $pb%.4f}"""
        }.getOrElse("")
        f"""  "$name": {$sfJson, "t_cold_first_invocation_sf0.01": ${r.coldFirst}%.3f, "fixed_sec": ${r.fixedSec}%.3f, "marginal_sec_per_1k_rows": ${r.marginalPerKRows}%.5f$batchJson}"""
      }.mkString(",\n")
      val rowsJson = DataAxisSfs.map(s =>
        s""""$s": ${rowsPerSf(s)}""").mkString(", ")
      s"""{
         | "metric": "stream_cost_split",
         | "protocol": "per key: warm once then min-of-2 at sf0.001/sf0.01/sf0.1; least-squares t = fixed + marginal*rows over the 3 points; batch axis (batching-invariant keys only) re-times sf0.01 at 1 file per trigger vs one AvailableNow batch (VERDICT r16 ask #5)",
         | "events_rows": {$rowsJson},
         | "keys": {
         |$rows
         | }
         |}""".stripMargin
    }
    Files.writeString(Paths.get(out), body + "\n")
    println(s"[bench-stream] artifact -> $out")
  }
}
