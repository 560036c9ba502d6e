package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Laws for IncrementalMaintainOps that the DuckDB hash oracle can't
  * name directly:
  *
  *   1. the maintained signature layout is BIT-EQUAL to a from-scratch
  *      rebuild on the post-merge corpus (the audit query reports the
  *      counts; this pins the row-level equality itself);
  *   2. the incremental component relabel reproduces a DRIVER-SIDE
  *      from-scratch closure (plain-Scala band/bucket/cap/slot replay +
  *      union-find — independent of GraphOps AND of the oracle's
  *      recursive CTE);
  *   3. the LOCALITY law (the 100 TB point): a 1-doc CDC batch
  *      re-resolves exactly the components bucket-reachable from that
  *      doc — nothing else is touched, and untouched docs keep their
  *      labels verbatim.
  */
class IncrementalMaintainSpec extends SparkSpec {
  import operators.{IncrementalMaintainOps, LlmOps}

  private val Bands = 4
  private val Rows = 4
  private val Cap = 1000
  private val DupSlots = 8

  private def collectSigs(path: String): Map[Long, Vector[Long]] =
    spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap

  /** Plain-Scala from-scratch closure: band rows → global bucket sizes →
    * sub-cap candidate pairs → ≥DupSlots slot agreement → union-find
    * with min-id canonical labels.
    */
  private def fullCC(sigs: Map[Long, Vector[Long]]): Map[Long, Long] = {
    val bandRows = sigs.toSeq.flatMap { case (id, sg) =>
      (0 until Bands).map(k => ((k, sg.slice(k * Rows, k * Rows + Rows)), id))
    }
    val sizes = bandRows.groupBy(_._1).view.mapValues(_.size).toMap
    val cands: Set[(Long, Long)] = bandRows.filter(t => sizes(t._1) <= Cap)
      .groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2)
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
    val edges = cands.filter { case (a, b) =>
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } >= DupSlots
    }
    val parent = scala.collection.mutable.Map[Long, Long]() ++
      sigs.keys.map(k => k -> k)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // union-to-min keeps the root the component minimum
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    sigs.keys.map(k => k -> find(k)).toMap
  }

  test("maintained signature layout is bit-equal to the from-scratch rebuild") {
    val inc = collectSigs(IncrementalMaintainOps.incLayout(spark, sf()))
    val reb = collectSigs(IncrementalMaintainOps.rebuildLayout(spark, sf()))
    assert(inc.keySet === reb.keySet, "post-merge key sets")
    inc.foreach { case (id, sg) =>
      assert(sg === reb(id), s"doc $id signature carried/recomputed wrong")
    }
    // the CDC classes all materially exist on the fixture
    assert(inc.keys.count(_ >= 1000000000L) > 0, "inserts present")
    assert(inc.keys.count(id => id < 1000000000L && id % 10 == 3) > 0,
      "updates present")
    assert(!inc.keySet.exists(id => id < 1000000000L && id % 10 == 7),
      "deletes retired")
  }

  test("incremental_cc_relabel reproduces a driver-side from-scratch closure") {
    val sigs = collectSigs(IncrementalMaintainOps.incLayout(spark, sf()))
    val expect = fullCC(sigs)
    val expSizes = expect.values.groupBy(identity).view.mapValues(_.size).toMap
    val out = IncrementalMaintainOps.queries("incremental_cc_relabel")(
      spark, sf()).collect()
    assert(out.length === sigs.size, "one row per post-merge doc")
    out.foreach { case Row(id: Long, comp: Long, sz: Long, rep: Boolean) =>
      assert(comp === expect(id), s"doc $id component")
      assert(sz === expSizes(comp).toLong, s"doc $id cluster size")
      assert(rep === (id == comp), s"doc $id representative flag")
    }
    // the fixture exercises real structure: multi-doc clusters exist
    assert(expSizes.values.exists(_ >= 2), "fixture has dup clusters")
  }

  test("locality: a 1-doc update re-resolves only bucket-reachable components") {
    import spark.implicits._
    val baseP = LlmOps.minhashLayout(spark, sf())
    val ccP = IncrementalMaintainOps.mhccBase(spark, sf())
    val base = collectSigs(baseP)
    val baseLabels = spark.read.parquet(ccP).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // craft a 1-doc batch OUTSIDE the standing CDC classes: perturb one
    // signature slot of the smallest %10==2 doc
    val docId = base.keys.filter(_ % 10 == 2).min
    val oldSig = base(docId)
    val newSig = oldSig.updated(0, oldSig(0) + 1L)
    val incSigs = base.updated(docId, newSig)
    val incDf = incSigs.toSeq.toDF("doc_id", "sig")
    val oldBatch = Seq((docId, oldSig)).toDF("doc_id", "sig")
    val newBatch = Seq((docId, newSig)).toDF("doc_id", "sig")
    val baseSizes = spark.read.parquet(s"$ccP.bandsizes")
    val (labelsDf, subNodesDf) = IncrementalMaintainOps.maintainLabels(
      incDf, spark.read.parquet(ccP), baseSizes, oldBatch, newBatch)
    val labels = labelsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val subNodes = subNodesDf.collect().map(_.getLong(0)).toSet

    // (a) spliced labels == full from-scratch closure on the new state
    val expect = fullCC(incSigs)
    assert(labels === expect, "incremental splice == full rebuild")

    // (b) the subgraph is EXACTLY the bucket-reachable components:
    // docs whose old component contains a doc sharing a band bucket
    // with the perturbed doc's old or new signature
    val affBuckets = (0 until Bands).flatMap(k => Seq(
      (k, oldSig.slice(k * Rows, k * Rows + Rows)),
      (k, newSig.slice(k * Rows, k * Rows + Rows)))).toSet
    val affDocs = incSigs.keys.filter(id => (0 until Bands).exists(k =>
      affBuckets((k, incSigs(id).slice(k * Rows, k * Rows + Rows))))).toSet + docId
    val affComps = affDocs.map(baseLabels)
    val expectedSub = base.keys.filter(id => affComps(baseLabels(id))).toSet
    assert(subNodes === expectedSub, "subgraph = bucket-reachable components")
    assert(subNodes.size < base.size,
      "a 1-doc batch must not re-resolve the whole corpus")

    // (c) untouched docs keep their labels verbatim
    (labels.keySet -- subNodes).foreach { id =>
      assert(labels(id) === baseLabels(id), s"untouched doc $id relabeled")
    }
  }

  test("incremental_bm25_maintain: carried postings untouched; additive df replays") {
    import org.apache.spark.sql.functions._
    val s = spark
    val incP = operators.IncrementalBm25Ops.incIndex(s, sf())
    val baseP = operators.IncrementalBm25Ops.baseIndex(s, sf())
    // locality: every carried doc's postings are BIT-IDENTICAL to the
    // base index — maintenance never rewrites rows it did not retire
    val batchKeys = Tables.documents(s, sf())
      .filter(col("doc_id") % 10 === 3 || col("doc_id") % 10 === 7)
      .select("doc_id")
    val carriedBase = s.read.parquet(baseP)
      .join(batchKeys, Seq("doc_id"), "left_anti")
    val carriedInc = s.read.parquet(incP)
      .filter(col("doc_id") < 1000000000L && col("doc_id") % 10 =!= 3)
    assert(carriedBase.count() === carriedInc.count())
    assert(carriedBase.join(carriedInc, Seq("doc_id", "w", "tf"))
      .count() === carriedBase.count(), "carried postings bit-identical")
    // additive df law: maintained df == recount over maintained postings
    val recount = s.read.parquet(incP).groupBy("w")
      .agg(count(lit(1)).as("df2"))
    val dfI = s.read.parquet(s"$incP.df")
    assert(dfI.count() === recount.count())
    assert(dfI.join(recount, "w").filter(col("df") === col("df2"))
      .count() === dfI.count(), "additive df equals full recount")
    // the audit's own laws, replayed off the query output
    val rows = operators.IncrementalBm25Ops
      .queries("incremental_bm25_maintain")(s, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    rows.foreach { case (cls, (n, nr, ne)) =>
      if (cls == "retired_delete") assert(nr === 0L && ne === 0L, cls)
      else assert(n === nr && nr === ne, s"$cls parity broken: $n/$nr/$ne")
    }
    assert(rows("topk_parity") === ((10L, 10L, 10L)),
      "consumer-visible BM25 top-10 identical on maintained vs rebuild")
  }
}
