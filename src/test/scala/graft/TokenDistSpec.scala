package graft

import org.apache.spark.sql.functions._

/** Semantic pins for TokenDistOps: probability-mass bounds for the
  * sampling table, the keep-rate range law and its high-frequency
  * direction, burstiness lower-bound/ordering, and the Simpson
  * Hill-number bounds.
  */
class TokenDistSpec extends SparkSpec {
  private def run(key: String) =
    operators.TokenDistOps.queries(key)(spark, sf()).collect()

  test("negative_sampling_table: probs descend; top-20 mass < 1") {
    val rows = run("negative_sampling_table")
    assert(rows.length === 20)
    val probs = rows.map(_.getLong(3))
    assert(probs.sameElements(probs.sortBy(-_)))
    assert(probs.sum < 1000000L, "top-20 is a strict subset of the mass")
    rows.foreach { r =>
      val (f, powFp) = (r.getLong(1), r.getLong(2))
      assert(powFp === math.floor(math.pow(f.toDouble, 0.75) * 1e6).toLong)
    }
  }

  test("frequent_word_subsampling: keep rate in (0, 1]; mass bounded") {
    val rows = run("frequent_word_subsampling")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mass, rate) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate > 0 && rate <= 1000000L)
      assert(mass <= n * 1000000L, "kept mass bounded by full mass")
      assert(rate === mass / n)
    }
  }

  test("term_burstiness_topk: b >= 1e6 (tf >= df) and ordered") {
    val rows = run("term_burstiness_topk")
    assert(rows.length === 20)
    val bs = rows.map(_.getLong(3))
    assert(bs.sameElements(bs.sortBy(-_)))
    rows.foreach { r =>
      val (tf, df, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(df >= 5 && tf >= df, "a term occurs at least once per doc")
      assert(b === tf * 1000000L / df && b >= 1000000L)
    }
  }

  test("simpson_diversity_by_source: Hill-number bounds + token conservation") {
    val rows = run("simpson_diversity_by_source")
    val totalTokens = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " "))).count()
    assert(rows.map(_.getLong(1)).sum === totalTokens,
      "tokens partitioned by source")
    rows.foreach { r =>
      val (n, types, sim, eff, even) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(types >= 1 && types <= n)
      // D in [1/types, 1]: uniform minimizes, single-type maximizes
      assert(sim >= 1000000000L / types - 1 && sim <= 1000000000L,
        "Simpson index bounds")
      assert(eff >= 1 && eff <= types,
        "effective vocabulary cannot exceed observed types")
      assert(even >= 0 && even <= 1000000L, "evenness is a fraction")
      if (types == n) assert(eff === types, "all-hapax source is even")
    }
  }

  test("pielou_evenness_by_source: exact replay + H <= ln S bound") {
    val counts = Tables.documents(spark, sf())
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = run("pielou_evenness_by_source")
    assert(rows.length === counts.size, "one row per source")
    rows.foreach { r =>
      val (src, n, types, h, j) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val cs = counts(src)
      assert(n === cs.sum && types === cs.length.toLong)
      val hExp = cs.map { c =>
        val p = c.toDouble / n
        math.floor(-p * math.log(p) * 1e9).toLong
      }.sum
      assert(h === hExp, s"$src entropy leaf-sum replay")
      val lnS = math.floor(math.log(types.toDouble) * 1e9).toLong
      assert(j === (BigInt(h) * 1000000 / lnS).toLong, s"$src J replay")
      // H <= ln S (Jensen); floors only lower H, so J stays <= 1e6
      assert(j >= 0 && j <= 1000000L, s"$src evenness is a fraction")
    }
  }
}
