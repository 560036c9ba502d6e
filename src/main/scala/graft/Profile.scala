package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev utility (r18 optimization round): per-JOB and per-STAGE wall/metric
  * breakdown for named queries — `runMain graft.Profile <name>[,<name>...]`.
  * Where Explain shows the plan shape, Profile shows where the seconds go:
  * each Spark job triggered while building + executing the query (eager
  * measure passes, localCheckpoint materializations, the final count) with
  * its wall clock, and each stage's task time / shuffle bytes. Honors
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var collecting = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        t0.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val dt = (System.nanoTime() - t0.getOrDefault(je.jobId, 0L)) / 1e9
        if (collecting)
          lines.add(f"  job ${je.jobId}%4d  ${dt}%7.3f s")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (collecting && m != null)
          lines.add(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"taskTime=${m.executorRunTime / 1000.0}%8.2f s " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%9.1f MB " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB  " +
            si.name.takeWhile(_ != '\n').take(80))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // session warmup so the first profiled query isn't charged JVM cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    // mirror Bench's state shedding so readings are comparable to the
    // bench artifact (checkpoint blocks from earlier queries otherwise
    // skew later ones)
    def shedState(): Unit = {
      try graft.functions.GlobalRank.releaseCheckpoints(spark)
      catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => }
      try spark.catalog.clearCache() catch { case _: Throwable => }
      System.gc()
    }

    args.flatMap(_.split(",")).foreach { name =>
      val fn = SparkEntry.queries(name)
      shedState()
      // warm pass: codegen + any layout builds land here, untimed
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[profile] $name warm FAILED: ${e.getMessage}")
      }
      lines.clear()
      collecting = true
      val w0 = System.nanoTime()
      val dfT0 = System.nanoTime()
      val df = fn(spark, sfDir)   // eager build-phase jobs run here
      val buildS = (System.nanoTime() - dfT0) / 1e9
      lines.add(f"  -- plan build phase above: $buildS%.3f s --")
      df.count()
      val wallS = (System.nanoTime() - w0) / 1e9
      collecting = false
      println(f"===== $name  wall=$wallS%.3f s (build=$buildS%.3f) =====")
      lines.forEach(println)
    }
    spark.stop()
  }
}
