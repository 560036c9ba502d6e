package graft

import org.apache.spark.sql.functions._

/** Laws for the plan-fingerprint canonicalization (VERDICT r14 ask #5):
  * the fingerprint must be BLIND to literals/ids/data (else every round
  * re-fingerprints everything) and SENSITIVE to the plan shapes the
  * tripwire exists to catch — a broadcast flipping to sort-merge, a
  * pushed filter or pruned column disappearing from the scan.
  */
class PlanFingerprintSpec extends SparkSpec {

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    PlanFingerprint.md5(
      PlanFingerprint.canonical(df.queryExecution.executedPlan))

  test("literal-invariance: same shape, different constants -> same fingerprint") {
    val t = Tables.lineitem(spark, sf())
    assert(fp(t.filter(col("l_quantity") > 5).groupBy("l_returnflag").count())
      === fp(t.filter(col("l_quantity") > 7).groupBy("l_returnflag").count()))
  }

  test("join-strategy sensitivity: broadcast vs sort-merge -> different fingerprint") {
    val li = Tables.lineitem(spark, sf())
    val ord = Tables.orders(spark, sf()).select("o_orderkey", "o_orderpriority")
    val b = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
    val m = li.hint("merge").join(ord.hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
    assert(fp(b) !== fp(m))
  }

  test("scan sensitivity: lost pushdown or extra read column -> different fingerprint") {
    val base = Tables.lineitem(spark, sf())
    val pushed = base.filter(col("l_quantity") > 5).select("l_orderkey")
    // identical operator tree (Project/Filter/Scan), but abs() is not a
    // translatable source filter -> the scan loses its GreaterThan
    // pushdown; only the scan metadata distinguishes the two plans
    val unpushable = base.filter(abs(col("l_quantity")) > 5)
      .select("l_orderkey")
    assert(fp(pushed) !== fp(unpushable))
    val wide = base.filter(col("l_quantity") > 5)
      .select("l_orderkey", "l_partkey")
    assert(fp(pushed) !== fp(wide))
  }

  test("determinism within a session: rebuilt plan -> identical fingerprint") {
    def q = Tables.orders(spark, sf()).groupBy("o_orderpriority")
      .agg(sum("o_totalprice").as("s")).orderBy("o_orderpriority")
    assert(fp(q) === fp(q))
  }

  test("executed mode (r16): final adaptive plan fingerprints, " +
      "deterministic, and distinct from the initial-plan hash shape") {
    def fpExec(df: org.apache.spark.sql.DataFrame): String = {
      df.count() // execute so the adaptive plan is FINAL
      PlanFingerprint.md5(PlanFingerprint.canonical(
        df.queryExecution.executedPlan, executed = true))
    }
    def q = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    // deterministic: two executions of the same query agree
    assert(fpExec(q) === fpExec(q))
    // the executed canonical traverses AQE bookkeeping transparently:
    // no partition COUNTS leak into the string (a config-only change
    // must not re-fingerprint), but the final plan IS visible
    val df = q
    df.count()
    val canon = PlanFingerprint.canonical(
      df.queryExecution.executedPlan, executed = true)
    assert(!canon.contains("AdaptiveSparkPlan"),
      "AQE wrapper resolved to its final plan")
    assert(canon.contains("Join") || canon.contains("HashedRelation"),
      "join visible in the executed shape")
  }
}
