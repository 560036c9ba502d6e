package graft

import org.apache.spark.sql.functions._

/** Laws for the r16 CDC-maintained serving layouts (pHash signatures,
  * kNN-graph edges) that the DuckDB hash oracle can't name directly:
  *
  *   1. maintained == rebuild BIT-EQUALITY at the row level (the audit
  *      queries report counts; this pins the keys/values themselves);
  *   2. the kNN LOCALITY law (the 100 TB point): on a corpus whose
  *      cells ARE distinct, a batch touching one cell recomputes only
  *      that cell's edges — every other cell's edges carry over
  *      verbatim with `prov = 'carried'` (the fixture's k=4 coarse
  *      quantizer can't show this — a 30% CDC batch touches all 4
  *      cells — so the law is pinned on synthetic cells);
  *   3. the pHash maintain re-signs ONLY the batch: carried signature
  *      rows are bit-identical to the BASE layout (not merely to the
  *      rebuild), proving no carried object was ever re-hashed;
  *   4. the widened Z17 rows: the media delete set is absent from the
  *      maintained pHash layout, and the vec delete set is absent from
  *      BOTH endpoints of the maintained edge layout.
  */
class IncrementalServeSpec extends SparkSpec {
  import operators.{IncrementalKnnOps, IncrementalPhashOps}

  test("phash maintain: maintained == rebuild per key; carried rows " +
      "bit-equal to BASE (batch-only re-sign)") {
    val d = sf()
    val inc = spark.read.parquet(IncrementalPhashOps.incLayout(spark, d))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reb = spark.read.parquet(IncrementalPhashOps.rebuildLayout(spark, d))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === reb, "maintained layout == from-scratch re-sign")
    val base = spark.read.parquet(
        operators.MultimodalOps.phashLayout(spark, d))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val carried = inc.keys.filter(k =>
      k < 1000000000L && (k / 25) % 10 != 3)
    assert(carried.nonEmpty)
    carried.foreach(k => assert(inc(k) === base(k),
      s"carried $k re-used the base signature verbatim"))
    // retired keys absent (the Z17 5_phash_signatures row)
    base.keys.filter(k => (k / 25) % 10 == 7)
      .foreach(k => assert(!inc.contains(k), s"deleted media $k erased"))
  }

  test("knn maintain: audit classes all-equal; delete set absent from " +
      "both edge endpoints (Z17 6_knn_edges)") {
    val d = sf()
    val audit = operators.IncrementalKnnOps
      .queries("incremental_knn_maintain")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    Seq("recomputed", "fresh_update", "fresh_insert", "key_parity")
      .filter(audit.contains).foreach { c =>
        val (n, nr, ne) = audit(c)
        assert(n == nr && n == ne, s"$c: $n/$nr/$ne all equal")
      }
    Seq("retired_src", "retired_dst").foreach { c =>
      val (n, nr, ne) = audit(c)
      assert(n > 0 && nr == 0 && ne == 0, s"$c: absent from both layouts")
    }
  }

  test("knn locality law: a one-cell batch recomputes only that cell") {
    import spark.implicits._
    // 3 well-separated synthetic cells, 3 vectors each
    def vec(cell: Int, i: Int): Array[Float] = {
      val a = Array.fill(4)(0.0f)
      a(cell) = 1.0f
      a(3) = 0.1f * i
      a
    }
    val vecs = for (c <- 0 until 3; i <- 0 until 3)
      yield ((c * 10 + i).toLong, vec(c, i), c)
    val base = vecs.toDF("vec_id", "embedding", "cell")
    val baseEdges = IncrementalKnnOps.topkEdges(spark, base)
      .localCheckpoint()
    // batch: delete vec 21 and insert vec 23 — touches ONLY cell 2
    val post = vecs.filter(_._1 != 21L).toDF("vec_id", "embedding", "cell")
      .unionByName(Seq((23L, vec(2, 5), 2)).toDF("vec_id", "embedding", "cell"))
    val affected = Seq(2).toDF("cell")
    val out = IncrementalKnnOps.maintainEdges(spark, baseEdges, post, affected)
      .collect()
    val provByCell = out.groupBy(_.getAs[Int]("cell"))
      .view.mapValues(_.map(_.getAs[String]("prov")).toSet).toMap
    assert(provByCell(0) === Set("carried"), "cell 0 untouched")
    assert(provByCell(1) === Set("carried"), "cell 1 untouched")
    assert(provByCell(2) === Set("recomputed"), "cell 2 recomputed")
    // recomputed cell dropped the retired vec and ranked the insert
    val cell2 = out.filter(_.getAs[Int]("cell") == 2)
    assert(!cell2.exists(r => r.getAs[Long]("src") == 21L ||
      r.getAs[Long]("dst") == 21L), "retired vec absent from cell 2 edges")
    assert(cell2.exists(r => r.getAs[Long]("src") == 23L),
      "inserted vec has edges")
    // carried cells are bit-identical to the base layout
    val baseRows = baseEdges.collect()
      .filter(r => r.getAs[Int]("cell") != 2)
      .map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cosine"))).toSet
    val carriedRows = out.filter(_.getAs[String]("prov") == "carried")
      .map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cosine"))).toSet
    assert(carriedRows === baseRows, "carried edges verbatim")
    graft.functions.Checkpoints.release(baseEdges)
  }
}
