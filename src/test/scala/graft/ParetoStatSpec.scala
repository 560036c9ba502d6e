package graft

import org.apache.spark.sql.functions._

/** Semantic pins for ParetoStatOps + deleted-interpolation — dominance
  * soundness/completeness and mass-partition laws.
  */
class ParetoStatSpec extends SparkSpec {

  test("skyline_2d_pareto: sound and complete against brute-force dominance") {
    val sky = operators.ParetoStatOps.queries("skyline_2d_pareto")(
      spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    val all = Tables.part(spark, sf())
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"),
        col("p_size").cast("long").as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)
    // soundness: nothing dominates a frontier point
    sky.foreach(p => assert(!all.exists(q => dominates(q, p)),
      s"frontier point $p is dominated"))
    // completeness: every non-frontier point is dominated
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1)).foreach(p =>
      assert(all.exists(q => dominates(q, p)),
        s"non-frontier point $p is undominated"))
  }

  test("jackknife_loo_nation: closed-form LOO means reconcile") {
    val rows = operators.ParetoStatOps.queries("jackknife_loo_nation")(
      spark, sf()).collect()
    assert(rows.nonEmpty)
    val per = Tables.customer(spark, sf())
      .select(col("c_nationkey").cast("long").as("nation"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (nAll, sAll) = (per.length.toLong, per.map(_._2).sum)
    rows.foreach { r =>
      val g = r.getLong(0)
      val (nG, sG) = (per.count(_._1 == g).toLong,
        per.filter(_._1 == g).map(_._2).sum)
      assert(r.getLong(1) === nG)
      val num = (sAll - sG) * 1000000L
      val expected = num / (nAll - nG) // JVM / truncates like Spark DIV
      assert(r.getLong(2) === expected, s"nation $g LOO mean")
      assert(r.getLong(3) >= 0, "jackknife variance nonnegative")
    }
    assert(rows.map(_.getLong(3)).distinct.length === 1,
      "jk variance is a constant column")
  }

  test("deleted_interpolation_lambdas: masses partition the bigram tokens") {
    val Array(r) = operators.SmoothingOps.queries(
      "deleted_interpolation_lambdas")(spark, sf()).collect()
    val nBigrams = Tables.documents(spark, sf())
      .select(size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 2)
      .agg(sum(expr("CAST(n - 1 AS BIGINT)"))).collect()(0).getLong(0)
    assert(r.getLong(1) + r.getLong(2) === nBigrams,
      "λ masses partition the bigram token count")
    assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    assert(r.getLong(0) >= 1, "at least one bigram type")
  }

  test("theil_inequality_decomp: additive decomposition against exact Theil") {
    val rows = operators.ParetoStatOps.queries("theil_inequality_decomp")(
      spark, sf()).collect()
    val xs = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf())
        .select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nation")), "o_custkey")
      .groupBy("nation", "o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.map(_.getLong(2)).sum === xs.map(_._2).sum,
      "cents conserved across nations")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, "within-group Theil is nonnegative")
      assert(r.getLong(4) <= r.getLong(3),
        "weighting by revenue share contracts the within term")
    }
    // exact total Theil in Scala vs the decomposition's sum
    val n = xs.length.toDouble
    val mu = xs.map(_._2).sum.toDouble / n
    val tExact = xs.map { case (_, x) =>
      x / mu * math.log(x / mu) }.sum / n
    val tDecomp = (rows.map(_.getLong(4)).sum +
      rows.map(_.getLong(5)).sum) / 1e9
    assert(math.abs(tDecomp - tExact) < 1e-4,
      s"T=within+between: $tDecomp vs $tExact")
  }

  test("atkinson_inequality: AM-GM bound and exact leaf replay") {
    import org.apache.spark.sql.functions._
    val rows = operators.ParetoStatOps
      .queries("atkinson_inequality")(spark, sf()).collect()
    assert(rows.length === Tables.nation(spark, sf()).count())
    rows.foreach { r =>
      val a = r.getLong(4)
      // geomean <= mean (AM-GM), and the leaf floors only lower the
      // geomean, so A in [0, 1e6]; strictly > 0 with unequal incomes
      assert(a >= 0L && a <= 1000000L)
      // terminal-leaf replay from the exact integer triplet
      val (n, sx, ls) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expect = 1000000L - math.floor(
        math.exp(ls.toDouble / n / 1e9) * n / sx.toDouble * 1e6).toLong
      assert(a === expect, "Atkinson leaf replay")
    }
    // independent lsum replay for the largest nation
    val target = rows.maxBy(_.getLong(1))
    val xs = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf())
        .selectExpr("c_custkey AS o_custkey",
          "CAST(c_nationkey AS BIGINT) AS nation"), "o_custkey")
      .filter(col("nation") === target.getLong(0))
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(_.getLong(1)).filter(_ > 0)
    assert(xs.length.toLong === target.getLong(1))
    assert(xs.sum === target.getLong(2))
    assert(xs.map(x => math.floor(math.log(x.toDouble) * 1e9).toLong).sum
      === target.getLong(3), "lsum leaf-exact replay")
  }

  test("lorenz_asymmetry_nation: exact replay + share bounds") {
    val cust = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf())
        .selectExpr("c_custkey AS o_custkey",
          "CAST(c_nationkey AS BIGINT) AS nation"), "o_custkey")
      .groupBy("nation", "o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => BigInt(t._2))).toMap
    val rows = operators.ParetoStatOps.queries(
      "lorenz_asymmetry_nation")(spark, sf()).collect()
    assert(rows.length === cust.size, "one row per nation")
    rows.foreach { r =>
      val (nat, n, tot, m, lm, lac) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val xs = cust(nat)
      val total = xs.sum
      val below = xs.filter(x => x * xs.length < total)
      assert(n === xs.length.toLong && tot === total.toLong)
      assert(m === below.length.toLong && lm === below.sum.toLong)
      assert(lac === m * 1000000L / n + (BigInt(lm) * 1000000 / total).toLong,
        s"nation $nat LAC replay")
      // below-mean customers hold a SMALLER revenue share than their
      // count share (each is below average by definition)
      assert(BigInt(lm) * n <= BigInt(m) * tot, s"nation $nat share order")
      assert(lac >= 0 && lac < 2000000L, "F + L each a fraction")
    }
  }
}
