package graft

import org.apache.spark.sql.functions._

/** SURVEY §7 flags Spark 4's ANSI default (`spark.sql.ansi.enabled=true`)
  * as a trap: a plain `CAST('12x' AS DOUBLE)` or `x / 0` THROWS under
  * ANSI and returns NULL without it. The declared queries that touch
  * fallible arithmetic therefore use the `try_` forms (`try_cast`,
  * `try_divide`), which are NULL-on-error in BOTH modes — so the rows
  * the DuckDB oracle asserts (its `TRY_CAST` / guarded CASE) are what
  * Spark produces regardless of the session's ANSI setting. This spec
  * pins that invariance explicitly, plus the underlying trap.
  */
class AnsiModeSpec extends SparkSpec {

  private def withAnsi[A](on: Boolean)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try f finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  for (q <- Seq("try_safe_arithmetic", "validate_required"))
    test(s"$q is ANSI-invariant (the oracle's NULL-on-error rows hold in both modes)") {
      val on = withAnsi(on = true)(SparkEntry.queries(q)(spark, sf()).collect())
      val off = withAnsi(on = false)(SparkEntry.queries(q)(spark, sf()).collect())
      assert(on.nonEmpty)
      assert(on.toSeq === off.toSeq,
        s"$q output depends on spark.sql.ansi.enabled — oracle is mode-fragile")
    }

  test("the trap the try_ forms avoid: plain CAST throws under ANSI, NULLs without") {
    import spark.implicits._
    def casted = Seq("12", "12x").toDF("raw")
      .select(expr("CAST(raw AS DOUBLE)").as("v"))
    val err = withAnsi(on = true)(intercept[Exception](casted.collect()))
    assert(err.getMessage.contains("CAST_INVALID_INPUT"),
      s"expected the ANSI cast error, got: ${err.getMessage.take(200)}")
    assert(withAnsi(on = false)(casted.collect())
      .map(r => Option(r.get(0))).toSeq === Seq(Some(12.0), None))
  }
}
