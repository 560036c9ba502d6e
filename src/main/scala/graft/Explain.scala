package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan (and optionally time)
  * for named queries — `runMain graft.Explain <name>[,<name>...]`.
  * Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like Bench/Verify/tests (Tables.events NTZ branch)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.flatMap(_.split(",")).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
