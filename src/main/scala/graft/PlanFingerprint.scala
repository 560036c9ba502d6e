package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Plan-regression tripwire (VERDICT r14 ask #5): emit, per declared
  * query, a stable hash of the CANONICALIZED physical plan so a silent
  * plan change (a broadcast flipping to sort-merge after a refactor, a
  * pushed filter disappearing, a new mid-plan exchange) is diffable
  * from committed artifacts instead of only visible as wall-clock.
  *
  * Canonicalization: the operator tree by CLASS name (stripped of the
  * `Exec` suffix and of codegen-stage ids), joins annotated with their
  * join type (the broadcast→SMJ flip changes the class name itself),
  * shuffle exchanges annotated with their partitioning SCHEME (hash /
  * range / single — but not the partition COUNT, which is config), file
  * scans annotated with their read-schema column names and pushed-filter
  * list (so a pruning or pushdown regression changes the fingerprint),
  * and scalar/IN subqueries folded in. Literals, expression ids, paths,
  * and statistics are all excluded — the fingerprint is the plan SHAPE
  * the optimizer chose, not the data it ran on. AQE wrapper nodes
  * fingerprint their initial plan (the sweep never executes, so no
  * runtime re-plan exists to read).
  *
  * The sweep runs under PlanAudit's exact session config (local[4],
  * shuffle=4, UTC, large-N paths pinned) so fingerprints are comparable
  * run-to-run and round-to-round. `runMain graft.PlanFingerprint
  * [sfDir] [outJson]`; `scripts/planfp_gate.sh` regenerates and FAILS
  * when any fingerprint differs from the committed artifact without a
  * `plan-change: <query>` changelog line in SURVEY.md.
  */
object PlanFingerprint {

  /** Stable structural string for one physical plan node tree. */
  def canonical(p: SparkPlan): String = p match {
    case a: AdaptiveSparkPlanExec => canonical(a.initialPlan)
    case _ =>
      val name = p.getClass.getSimpleName.stripSuffix("Exec")
      val extra = p match {
        case j: BaseJoinExec => ":" + j.joinType.toString
        case e: ShuffleExchangeExec =>
          ":" + e.outputPartitioning.getClass.getSimpleName
        case s: FileSourceScanExec =>
          val cols = s.output.map(_.name).mkString("|")
          // pushed-filter SHAPE only: drop literal values (`GreaterThan(
          // l_quantity,5.0)` -> `GreaterThan(l_quantity)`) so a constant
          // tweak doesn't re-fingerprint, but a lost pushdown does
          val pushed = s.metadata.getOrElse("PushedFilters", "[]")
            .replaceAll("""([A-Za-z0-9_]+)\((\s*[^,()\[\]]+)[^)]*\)""", "$1($2)")
          s":cols=$cols:pushed=$pushed"
        case _ => ""
      }
      val subs = p.subqueries.map(s => "$" + canonical(s)).mkString
      name + extra + subs + p.children.map(canonical).mkString("(", ",", ")")
  }

  def md5(s: String): String = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outJson = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // pin the large-N paths so fingerprints reflect cluster-scale plans
    // (same pins as PlanAudit — the two artifacts must describe the
    // same plans)
    spark.conf.set("graft.globalrank.smallThreshold", "0")
    spark.conf.set("graft.pagerank.smallThreshold", "0")
    spark.conf.set("graft.labelprop.smallThreshold", "0")
    val rows = scala.collection.mutable.LinkedHashMap[String, (String, Int)]()
    var failed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val canon = canonical(plan)
        rows(name) = (md5(canon), canon.count(_ == '('))
      } catch {
        case e: Throwable =>
          rows(name) = ("BUILD_FAILED", 0)
          failed += 1
          System.err.println(s"[planfp] $name FAILED: ${e.getMessage.take(120)}")
      }
    }
    val body = {
      val fps = rows.map { case (name, (fp, nodes)) =>
        s"""  "$name": {"fp": "$fp", "nodes": $nodes}"""
      }.mkString(",\n")
      s"""{
         | "metric": "plan_fingerprint",
         | "n_queries": ${rows.size},
         | "n_build_failed": $failed,
         | "canonicalization": "class names sans Exec/codegen-ids; joins+=joinType; shuffles+=partitioning scheme; scans+=read cols+pushed filters; subqueries folded; literals/ids/paths/counts excluded; AQE initial plan",
         | "fingerprints": {
         |$fps
         | }
         |}""".stripMargin
    }
    spark.stop()
    outJson.foreach { path =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), body + "\n")
      println(s"[planfp] artifact -> $path")
    }
    println(s"[planfp] done: ${rows.size} queries, $failed build-failed")
    if (failed > 0) sys.exit(1)
  }
}
