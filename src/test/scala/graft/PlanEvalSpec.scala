package graft

import org.apache.spark.sql.functions._

/** Semantic pins for PlanEvalOps — the winnowing selection law, the
  * FK-join cardinality identity, and the B³ bounds the oracle hash
  * can't name.
  */
class PlanEvalSpec extends SparkSpec {
  private def run(key: String) =
    operators.PlanEvalOps.queries(key)(spark, sf())

  test("winnowing_fingerprints: density tracks 2/(w+1) and fingerprints cover windows") {
    val rows = run("winnowing_fingerprints").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nFps, density, shared) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nDocs > 0 && nFps > 0)
      // winnowing's expected density is 2/(w+1) = 400000 ppm at w=4;
      // guaranteed bounds: ≥ 1/w (one selection per w disjoint
      // windows), ≤ 1 (can't select more than the grams)
      assert(density >= 200000 && density <= 1000000,
        s"density $density outside the winnowing envelope")
      assert(shared >= 0 && shared <= 1000000)
    }
  }

  test("winnowing_fingerprints: the min-key rule replays in Scala for one doc") {
    val doc = Tables.documents(spark, sf())
      .filter(size(split(col("text"), " ")) >= 7)
      .orderBy("doc_id").select("doc_id", "text").first()
    val ws = doc.getString(1).split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = (0 to ws.length - 3)
      .map(i => md5hex(ws.slice(i, i + 3).mkString(" ")))
    val keys = grams.zipWithIndex
      .map { case (h, p) => (f"${h}_${100000 - p}%06d", p) }
    val expected = (0 to grams.size - 4)
      .map(wi => keys.slice(wi, wi + 4).map(_._1).min.take(32))
      .distinct.toSet
    val got = {
      val df = Tables.documents(spark, sf())
        .filter(col("doc_id") === doc.getLong(0))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), (size(col("ws")) - 2).as("n_grams"),
          posexplode(expr(
            """transform(sequence(0, size(ws) - 3),
              |  i -> md5(array_join(slice(ws, i + 1, 3), ' ')))"""
              .stripMargin)).as(Seq("pos", "h")))
        .withColumn("hk",
          expr("concat(h, '_', lpad(CAST(100000 - pos AS STRING), 6, '0'))"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
      df.withColumn("sel", min("hk").over(w))
        .filter(col("pos") <= col("n_grams") - 4)
        .select(substring(col("sel"), 1, 32)).distinct()
        .collect().map(_.getString(0)).toSet
    }
    assert(got === expected, "window-min selection = direct Scala replay")
  }

  test("join_cardinality_estimate: FK identity and error accounting") {
    val rows = run("join_cardinality_estimate").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).toSeq ===
      Seq("lineitem_orders", "lineitem_part", "orders_customer"))
    val li = Tables.lineitem(spark, sf()).count()
    rows.foreach { case (name, na, nb, ndvA, ndvB, est, actual, err) =>
      assert(ndvA <= na && ndvB <= nb)
      // complete FK joins: every fact row matches exactly one dim row
      if (name.startsWith("lineitem")) assert(actual === li,
        s"$name: FK join must preserve the fact table")
      // System-R estimate replay
      val expectEst = (BigInt(na) * nb / BigInt(math.max(ndvA, ndvB))).toLong
      assert(est === expectEst)
      val diff = BigInt(est) - actual
      val expectErr = (diff * 1000000 / actual).toLong // BigInt / truncates
      assert(err === expectErr, s"$name err_ppm")
    }
  }

  test("bcubed_cluster_eval: bounds and the harmonic-mean dominance") {
    val Array(r) = run("bcubed_cluster_eval").collect()
    val (n, nc, nl, p, rec, f1) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0 && nc > 0 && nl > 0)
    assert(nc <= n && nl <= n)
    assert(p > 0 && p <= 1000000, s"precision $p")
    assert(rec > 0 && rec <= 1000000, s"recall $rec")
    // the harmonic mean of two positives lies in [min, 2·min)
    // (H = 2PR/(P+R) ≥ min since P,R ≥ min; < 2·min since H < 2P, 2R);
    // ±1 for the integer floor
    assert(f1 >= math.min(p, rec) - 1 && f1 <= 2 * math.min(p, rec),
      s"F1 $f1 outside [min, 2·min) of ($p, $rec)")
    // every item is its own size-1 intersection at minimum:
    // Σ m²/sc ≥ Σ m·(m/sc) ≥ ... ≥ n·(1/max cluster) > 0 — and when
    // every cluster is pure, precision is exactly 1e6. The fixture's
    // clustering is pure iff p == 1e6; assert consistency with a
    // direct purity read instead of assuming either way.
    val labels = spark.read.parquet(
      operators.TrainingDataOps.ccLabels(spark, sf()))
    val cls = Tables.embeddings(spark, sf())
      .select(col("vec_id").as("doc_id"), col("label"))
    val mixed = labels.join(cls, "doc_id")
      .groupBy("component")
      .agg(countDistinct("label").as("nl"), count(lit(1)).as("sz"))
      .filter(col("nl") > 1).count()
    if (mixed == 0) assert(p === 1000000, "pure clusters ⇒ B³ precision 1")
    else assert(p < 1000000, "mixed clusters ⇒ B³ precision < 1")
  }
}
