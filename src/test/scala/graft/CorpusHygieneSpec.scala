package graft

import org.apache.spark.sql.functions._

/** Semantic pins for CorpusHygieneOps — the accounting identities and
  * closed-form laws the oracle hash can't name.
  */
class CorpusHygieneSpec extends SparkSpec {
  private def run(key: String) =
    operators.CorpusHygieneOps.queries(key)(spark, sf())

  test("dup_chunk_fraction: source partition + share bounds") {
    val rows = run("dup_chunk_fraction").collect()
    val nSources = Tables.documents(spark, sf())
      .select("source").distinct().count()
    assert(rows.length === nSources, "one row per source")
    assert(rows.map(_.getLong(1)).sum ===
      Tables.documents(spark, sf()).count(), "docs partitioned by source")
    rows.foreach { r =>
      val (n, flagged, mean) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(flagged <= n)
      assert(mean >= 0 && mean < 1000000, "dup share is a proper fraction")
    }
  }

  test("dup_chunk_fraction: per-doc share reconciles with a direct distinct count") {
    // recompute one doc's duplicate share from raw text
    val doc = Tables.documents(spark, sf())
      .orderBy("doc_id").select("doc_id", "text").first()
    val ws = doc.getString(1).split(" ")
    val chunks = ws.grouped(2).map(_.mkString(" ")).toSeq
    val expected = (chunks.size - chunks.distinct.size).toLong *
      1000000L / chunks.size
    val got = Tables.documents(spark, sf())
      .filter(col("doc_id") === doc.getLong(0))
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(explode(expr(
        """transform(sequence(0, CAST(ceil(size(ws) / 2.0) AS INT) - 1),
          |  i -> array_join(slice(ws, i * 2 + 1, 2), ' '))""".stripMargin))
        .as("c"))
      .agg(count(lit(1)).as("n"), countDistinct("c").as("nd"))
      .select(expr("(n - nd) * 1000000 DIV n")).first().getLong(0)
    assert(got === expected, "window slicing = grouped(2) reference")
  }

  test("softdedup_weighting: every cluster contributes ≈ unit mass") {
    val labels = spark.read.parquet(
      operators.TrainingDataOps.ccLabels(spark, sf()))
    val perCluster = labels.groupBy("component")
      .agg(count(lit(1)).as("sz"))
      .withColumn("cluster_mass", expr("sz * (1000000 DIV sz)"))
      .collect()
    perCluster.foreach { r =>
      val (sz, mass) = (r.getLong(1), r.getLong(2))
      // s·⌊1e6/s⌋ ∈ (1e6 − s, 1e6]: unit mass up to the floor remainder
      assert(mass <= 1000000L && mass > 1000000L - sz)
    }
    // report-level: effective mass never exceeds nominal, and equals it
    // exactly iff every doc of the source is a singleton
    run("softdedup_weighting").collect().foreach { r =>
      val (n, eff, disc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(eff <= n * 1000000L)
      assert(disc === (n * 1000000L - eff) / n)
    }
  }

  test("wilson_ci_flag_rate: interval brackets the point rate and tightens with n") {
    val rows = run("wilson_ci_flag_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k, rate, lo, hi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(k <= n)
      assert(lo >= 0 && hi <= 1000000, "bounds clipped to [0, 1]")
      assert(lo <= rate + 1 && rate <= hi + 1,
        s"interval [$lo, $hi] excludes point rate $rate (k=$k n=$n)")
      // Wilson never collapses: lo < hi strictly for 0 < k < n
      if (k > 0 && k < n) assert(lo < hi)
    }
    // closed-form replay of one source in Scala IEEE arithmetic
    val r0 = rows.head
    val (n, k) = (r0.getLong(1).toDouble, r0.getLong(2).toDouble)
    val z2 = 1.96 * 1.96
    val p = k / n
    val denom = 1.0 + z2 / n
    val center = (p + z2 / (2.0 * n)) / denom
    val half = 1.96 * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n) / denom
    assert(r0.getLong(4) === math.floor(math.max(0.0, center - half) * 1e6).toLong)
    assert(r0.getLong(5) === math.floor(math.min(1.0, center + half) * 1e6).toLong)
  }

  test("proportional_quota_fill: quotas sum exactly to the budget") {
    val rows = run("proportional_quota_fill").collect()
    val budget = 100L
    assert(rows.map(_.getLong(3)).sum === budget,
      "largest-remainder allocation is exact")
    val total = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (nCell, quota) = (r.getLong(2), r.getLong(3))
      val ideal = budget.toDouble * nCell / total
      // Hamilton quota property: every cell gets ⌊ideal⌋ or ⌈ideal⌉
      assert(quota === math.floor(ideal).toLong ||
        quota === math.ceil(ideal).toLong,
        s"cell quota $quota outside [⌊$ideal⌋, ⌈$ideal⌉]")
    }
  }

  test("importance_weight_ess: Kish bounds and the equal-weights identity") {
    val rows = run("importance_weight_ess").collect()
    assert(rows.nonEmpty)
    // direct weight recompute for the cross-check
    val labels = spark.read.parquet(
      operators.TrainingDataOps.ccLabels(spark, sf()))
    val w = labels.join(
        labels.groupBy("component").agg(count(lit(1)).as("sz")), "component")
      .withColumn("w_fp", expr("1000000 DIV sz"))
      .join(Tables.documents(spark, sf()).select("doc_id", "source"), "doc_id")
      .select("source", "w_fp")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1))).toMap
    rows.foreach { r =>
      val (src, n, ess, ratio) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // Cauchy–Schwarz: 1 ≤ ESS ≤ n, with equality iff weights equal
      assert(ess >= 1 && ess <= n, s"$src ESS $ess outside [1, $n]")
      assert(ratio <= 1000000)
      val ws = w(src)
      val sw = ws.map(BigInt(_)).sum
      val sww = ws.map(x => BigInt(x) * x).sum
      assert(ess === (sw * sw / sww).toLong, s"$src ESS replay")
      assert(ratio === (sw * sw * 1000000 / (sww * n)).toLong)
      if (ws.distinct.length == 1)
        assert(ess === n, s"$src equal weights must give ESS = n")
      else assert(ess < n, s"$src unequal weights must give ESS < n")
    }
  }
}
