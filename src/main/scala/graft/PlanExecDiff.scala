package graft

import org.apache.spark.sql.SparkSession

/** Adjudication helper for cross-scale executed-plan diffs (r17, VERDICT
  * r16 ask #1): when PLANFINGERPRINT shows fp_exec@sfA != fp_exec@sfB
  * for a query, this main re-executes it at both scale factors and
  * prints a line-diff of the two canonical plan strings, so the verdict
  * can name WHICH node flipped (broadcast→SMJ, skew split, coalesce
  * kind) instead of staring at two hashes.
  * Usage: runMain graft.PlanExecDiff <query[,query...]> <sfDirA> <sfDirB>
  */
object PlanExecDiff {
  def main(args: Array[String]): Unit = {
    val Array(qs, dirA, dirB) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.globalrank.smallThreshold", "0")
    spark.conf.set("graft.pagerank.smallThreshold", "0")
    spark.conf.set("graft.labelprop.smallThreshold", "0")
    qs.split(",").foreach { q =>
      def canon(dir: String): String = {
        val df = SparkEntry.queries(q)(spark, dir)
        df.count()
        PlanFingerprint.canonical(df.queryExecution.executedPlan,
          executed = true)
      }
      // indent nesting so a plain line diff localizes the changed node
      def pretty(s: String): String = {
        val sb = new StringBuilder; var depth = 0
        s.foreach {
          case '(' => depth += 1; sb.append("(\n").append("  " * depth)
          case ')' => depth -= 1; sb.append("\n").append("  " * depth).append(")")
          case ',' => sb.append(",\n").append("  " * depth)
          case c => sb.append(c)
        }
        sb.toString
      }
      val a = pretty(canon(dirA)).linesIterator.toVector
      val b = pretty(canon(dirB)).linesIterator.toVector
      println(s"==== $q ($dirA vs $dirB) ====")
      val n = math.max(a.size, b.size)
      var i = 0
      while (i < n) {
        val la = a.lift(i).getOrElse("<end>")
        val lb = b.lift(i).getOrElse("<end>")
        if (la.trim != lb.trim) println(f"$i%4d  A: ${la.trim}%-60s B: ${lb.trim}")
        i += 1
      }
    }
    spark.stop()
  }
}
