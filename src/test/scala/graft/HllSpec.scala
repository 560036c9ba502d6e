package graft

import org.apache.spark.sql.functions._

/** The mergeable-sketch distinct-count surface (`hll_count_rollup` —
  * BigQuery HLL_COUNT.{INIT,MERGE,EXTRACT} analog). Estimates are
  * engine-specific, so the driver's check is rows-only; these laws pin
  * what matters: ε-accuracy against the exact counts and the monoid
  * property (union of partial sketches == sketch of the whole), which
  * is what makes sketch rollups correct under ANY partitioning.
  */
class HllSpec extends SparkSpec {

  test("HLL rollup: estimates within 5% of exact; merged == whole-table sketch") {
    // since r15 the QUERY emits exact counts + the est_ok/merge_ok
    // ε-verdicts (oracle-checked); the raw-estimate laws are pinned here
    // against the same sketch expressions the query evaluates
    val rows = SparkEntry.queries("hll_count_rollup")(spark, sf()).collect()
    val exact = Tables.customer(spark, sf())
      .groupBy("c_nationkey").agg(countDistinct("c_custkey").as("d"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    rows.filter(_.getLong(0) >= 0).foreach { r =>
      assert(r.getLong(1) === exact(r.getLong(0)), "exact distinct wrong")
      assert(r.getBoolean(3), s"nation ${r.getLong(0)}: est_ok false")
      assert(r.getBoolean(4), "per-nation merge_ok must be vacuously true")
    }
    val g = rows.find(_.getLong(0) == -1L)
      .getOrElse(fail("missing global rollup row"))
    assert(g.getBoolean(3) && g.getBoolean(4),
      "global est_ok / merge_ok verdicts must hold")
    // raw-estimate ε law, re-derived from the sketches directly
    val perEst = Tables.customer(spark, sf())
      .groupBy("c_nationkey")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("c_custkey"), lit(12))).as("est"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    perEst.foreach { case (nk, est) =>
      val e = exact(nk).toDouble
      assert(math.abs(est - e) / e <= 0.05,
        s"nation $nk: est $est vs exact $e")
    }
    // merge law at the spec's FIXED partitioning: union of the
    // per-nation sketches estimates exactly what one sketch over the
    // whole table estimates (across partitionings only ε-closeness
    // holds — the query's merge_ok pins 1%; see the invariance test)
    val unioned = Tables.customer(spark, sf())
      .groupBy("c_nationkey")
      .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head.getLong(0)
    val whole = Tables.customer(spark, sf())
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("c_custkey"), lit(12))).as("e"))
      .head.getLong(0)
    assert(unioned === whole,
      "unioned partial sketches disagree with the whole-table sketch")
  }

  test("HLL estimates stable within 2% under repartitioning (the r5 invariance-sweep class)") {
    // DataSketches HLL union is NOT bit-invariant across merge orders
    // (coupon-promotion order moves the estimate ~0.4% on the fixture;
    // measured 1498/1492/1491 for exact 1500 under 4/7/32 shuffle
    // partitions) — which is WHY the sketch keys are held to a relative
    // tolerance, not bit identity, in scripts/invariance.sh. This pins
    // the tolerance in CI: estimates from deliberately different
    // partitionings must stay within 2% of each other.
    def est(parts: Int): Long =
      Tables.customer(spark, sf())
        .repartition(parts, col("c_custkey"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("c_custkey"), lit(12))).as("e"))
        .head.getLong(0)
    val es = Seq(2, 5, 17).map(est)
    val (lo, hi) = (es.min.toDouble, es.max.toDouble)
    assert((hi - lo) / hi <= 0.02,
      s"HLL estimate moved ${(hi - lo) / hi * 100}% across partitionings: $es")
  }

  test("sketch estimates are cross-sf monotone (G7/D3, r10 VERDICT ask #4)") {
    // The two rows-only sketch queries can still be pinned STRUCTURALLY
    // across data scales: the fixtures grow ~10x per sf step, so any
    // correct ε≤5% estimator must report strictly more distincts at the
    // larger scale — a sketch that ignored its input (or saturated)
    // would fail this while still passing a single-sf tolerance check.
    val sfs = Seq(sf("sf0.001"), sf("sf0.01"))
    // G7: the global rollup estimate, re-derived from the sketches the
    // query unions (the query itself now emits exact + verdicts)
    val g7 = sfs.map { d =>
      Tables.customer(spark, d)
        .groupBy("c_nationkey")
        .agg(hll_sketch_agg(col("c_custkey"), lit(12)).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
        .head.getLong(0)
    }
    assert(g7(1) > g7(0) * 5,
      s"hll_count_rollup global estimate not ~10x across sf: $g7")
    // D3: approx tracks exact at BOTH scales and grows with the data
    val d3 = sfs.map { d =>
      val r = Tables.lineitem(spark, d)
        .agg(approx_count_distinct(col("l_orderkey")).as("a"),
          countDistinct(col("l_orderkey")).as("e")).head
      (r.getLong(0), r.getLong(1)) // (approx, exact)
    }
    // approx_count_distinct's default rsd is 0.05 — individual draws
    // routinely land past 1 sigma (6.4% observed at sf0.001), so the
    // per-scale bound is 2x rsd (the bound count_distinct_approx's
    // approx_ok verdict pins per-row under the oracle)
    d3.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.10,
        s"approx_count_distinct off by >10%: approx=$approx exact=$exact")
    }
    assert(d3(1)._1 > d3(0)._1 * 5,
      s"approx_orders not ~10x across sf: ${d3.map(_._1)}")
    // and the queries' own verdicts hold at both scales
    sfs.foreach { d =>
      assert(SparkEntry.queries("count_distinct_approx")(spark, d)
        .head.getBoolean(1), s"approx_ok false at $d")
      assert(SparkEntry.queries("hll_count_rollup")(spark, d)
        .collect().forall(r => r.getBoolean(3) && r.getBoolean(4)),
        s"hll_count_rollup verdict false at $d")
    }
  }

  test("hll_intersection_estimate: set algebra + every ε-verdict true") {
    val rows = SparkEntry.queries("hll_intersection_estimate")(spark, sf())
      .collect()
    val nTypes = Tables.events(spark, sf())
      .select("event_type").distinct().count()
    assert(rows.length === nTypes * (nTypes - 1) / 2, "all unordered pairs")
    rows.foreach { r =>
      val (a, b, ea, eb, inter, union, ok) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6))
      assert(a < b, "canonical pair order")
      assert(inter <= math.min(ea, eb), "∩ bounded by both sides")
      assert(union === ea + eb - inter, "inclusion–exclusion")
      assert(union >= math.max(ea, eb))
      assert(ok, s"sketch intersection for ($a, $b) outside 5% of union")
    }
  }
}
