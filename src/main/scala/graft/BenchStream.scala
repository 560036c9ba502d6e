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
    val out = args.headOption.getOrElse("BENCH_STREAM_r18.json")
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
        batch: Option[(Int, Double, Double, Double)], // (nBatchesMany, t1, tMany, perBatch)
        batchSingle: Option[Int] = None) // measured batches on the 1-batch leg

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
    // file per trigger. Micro-batch counts are MEASURED from the
    // engine's own progress events, never assumed (ADVICE r17 #1: the
    // old code asserted n_batches = cpus, but the sf0.01 events fixture
    // is ONE read split, so the default staging wrote one file and the
    // per-trigger leg ran ONE batch — the committed per-batch overhead
    // was noise divided by a constant). The ops stage at a KNOWN file
    // count via graft.stream.stageParts (both legs, so only the
    // batching differs), and a StreamingQueryListener counts the
    // committed data batches of each run.
    val sfDir = "/root/testdata/sf0.01"
    val batchCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) batchCounter.incrementAndGet()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener
              .QueryTerminatedEvent): Unit = ()
      })
    // progress events post async on the listener bus: poll until the
    // counter is stable (reads happen OUTSIDE the timed region)
    def measuredBatches(): Long = {
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        val cur = batchCounter.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(100); waited += 100
      }
      batchCounter.get()
    }
    val StageParts = 8
    BatchAxisKeys.foreach { name =>
      shed()
      spark.conf.set("graft.stream.stageParts", StageParts.toString)
      run(name, sfDir) // warm
      batchCounter.set(0)
      val tSingle = (1 to 2).map(_ => time(run(name, sfDir))).min
      val nSingleTotal = measuredBatches()
      spark.conf.set("graft.stream.maxFilesPerTrigger", "1")
      run(name, sfDir) // warm under the new batching
      batchCounter.set(0)
      val tMany = (1 to 2).map(_ => time(run(name, sfDir))).min
      val nManyTotal = measuredBatches()
      spark.conf.unset("graft.stream.maxFilesPerTrigger")
      spark.conf.unset("graft.stream.stageParts")
      // each leg timed 2 runs after the counter reset; per-run counts
      val nSingle = (nSingleTotal / 2.0).round.toInt
      val nMany = (nManyTotal / 2.0).round.toInt
      val perBatch = (tMany - tSingle) / math.max(nMany - nSingle, 1)
      System.err.println(f"[bench-stream] $name batch axis: $nSingle " +
        f"batch(es) $tSingle%.3f vs $nMany batches $tMany%.3f -> " +
        f"$perBatch%.4f s/batch (measured from query progress; staged " +
        f"$StageParts files)")
      results(name) = results(name).copy(
        batch = Some((nMany, tSingle, tMany, perBatch)),
        batchSingle = Some(nSingle))
    }

    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => }
    spark.stop()

    val body = {
      val rows = results.map { case (name, r) =>
        val sfJson = r.bySf.map { case (sfName, t) =>
          f""""t_$sfName": $t%.3f""" }.mkString(", ")
        val batchJson = r.batch.map { case (nb, t1, tm, pb) =>
          val n1 = r.batchSingle.getOrElse(1)
          f""", "batch_axis": {"n_batches_one_leg": $n1, "n_batches": $nb, "batch_counts_measured": true, "t_one_batch": $t1%.3f, "t_per_file_batches": $tm%.3f, "per_micro_batch_overhead_sec": $pb%.4f}"""
        }.getOrElse("")
        f"""  "$name": {$sfJson, "t_cold_first_invocation_sf0.01": ${r.coldFirst}%.3f, "fixed_sec": ${r.fixedSec}%.3f, "marginal_sec_per_1k_rows": ${r.marginalPerKRows}%.5f$batchJson}"""
      }.mkString(",\n")
      val rowsJson = DataAxisSfs.map(s =>
        s""""$s": ${rowsPerSf(s)}""").mkString(", ")
      s"""{
         | "metric": "stream_cost_split",
         | "protocol": "per key: warm once then min-of-2 at sf0.001/sf0.01/sf0.1; least-squares t = fixed + marginal*rows over the 3 points; batch axis (batching-invariant keys only) stages 8 JSON files via graft.stream.stageParts and re-times sf0.01 at 1 file per trigger vs one AvailableNow batch, with COMMITTED data-batch counts measured by a StreamingQueryListener, never assumed (ADVICE r17 #1)",
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
