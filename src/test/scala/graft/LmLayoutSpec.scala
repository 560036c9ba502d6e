package graft

import org.apache.spark.sql.functions._

/** Laws of the maintained bigram-LM serving layout (r18, VERDICT r17
  * ask #6): the CDC-maintained model must equal a from-scratch rebuild
  * of the post-merge corpus table-by-table AND through the consumer's
  * eyes (perplexity top-k), and the consumers that switched from
  * per-query model builds to the persisted layout must return exactly
  * what the inline build returned.
  */
class LmLayoutSpec extends SparkSpec {

  test("incremental_lm_maintain: every parity row reads three equal " +
      "counts (maintained == rebuild, tables and top-k alike)") {
    val rows = SparkEntry.queries("incremental_lm_maintain")(spark, sf())
      .collect()
    assert(rows.length === 5)
    val classes = rows.map(_.getString(0)).toSet
    assert(classes === Set("c2_parity", "c1_parity", "uni_parity",
      "corpus_stats", "ppl_topk_parity"))
    rows.foreach { r =>
      val (n, nr, ne) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0, s"${r.getString(0)}: empty relation proves nothing")
      assert(n === nr && n === ne,
        s"${r.getString(0)}: n_rows $n, in_rebuild $nr, all_equal $ne")
    }
    val tk = rows.find(_.getString(0) == "ppl_topk_parity").get
    assert(tk.getLong(1) === 10L, "consumer check must cover the full top-10")
  }

  test("layout-backed M1 equals the inline model build it replaced") {
    val d = sf()
    val docs = Tables.documents(spark, d)
    // the pre-r18 formulation: model counted inline from the corpus
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("a"))
    val words = toks.select(explode(col("a")).as("w"))
    val vdf = words.select("w").distinct().agg(count(lit(1)).as("v"))
    val bi = toks.filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(a) - 1),
          |  i -> named_struct('w1', element_at(a, i), 'w2', element_at(a, i + 1)))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    val inline = bi.join(c2, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vdf))
      .withColumn("nll", expr(
        "CAST(round(ln(CAST(c1 + v AS DOUBLE) / (c2 + 1)) * 1000000.0) AS BIGINT)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll").as("nll_sum"))
      .withColumn("avg_nll_fp", expr("nll_sum DIV n_bigrams"))
      .select("doc_id", "n_bigrams", "avg_nll_fp")
      .orderBy(col("avg_nll_fp").desc, col("doc_id")).limit(20)
    val layout = SparkEntry.queries("bigram_lm_perplexity")(spark, d)
    assert(layout.collect().toSeq === inline.collect().toSeq)
  }

  test("base layout stats are self-consistent with the persisted tables") {
    val p = graft.operators.LmLayoutOps.baseLm(spark, sf())
    val uni = spark.read.parquet(s"$p.uni")
    val st = spark.read.parquet(s"$p.stats").head
    assert(st.getLong(0) === uni.count(), "v == |uni|")
    assert(st.getLong(1) ===
      uni.agg(sum("cu")).head.getLong(0), "nn == sum(cu)")
    // c1 is the bigram-prefix marginal of c2
    val c2 = spark.read.parquet(p)
    val c1 = spark.read.parquet(s"$p.c1")
    val marg = c2.groupBy("w1").agg(sum("c2").as("m"))
    assert(c1.join(marg, "w1").filter(col("c1") =!= col("m")).count() === 0L)
    assert(c1.count() === marg.count())
  }
}
