package graft

import org.apache.spark.sql.functions._

/** Semantic pins for AuditOps + the weighted-percentile StatOps row —
  * the sketch law, split-accounting, and weighted-rank properties the
  * oracle hash can't name.
  */
class AuditSpec extends SparkSpec {

  test("countmin_heavy_hitters: sketch never underestimates, anywhere") {
    val rows = operators.AuditOps.queries("countmin_heavy_hitters")(
      spark, sf()).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"${r.getString(0)}: est < exact")
      assert(r.getLong(2) === r.getLong(1) + r.getLong(3))
    }
    // exact counts reconcile with a direct count for the top token
    val top = rows.head
    val exact = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === top.getString(0)).count()
    assert(top.getLong(1) === exact)
    // ordered by exact desc then word
    val keys = rows.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sorted.sameElements(keys))
  }

  test("split_leakage_audit: classes partition the confirmed pair set") {
    val rows = operators.AuditOps.queries("split_leakage_audit")(
      spark, sf()).collect()
    val confirmed = {
      val stored = spark.read.parquet(
        operators.LlmOps.minhashLayout(spark, sf()))
      functions.TextSim.signatureBandPairs(stored, numBands = 4, rowsPerBand = 4)
        .filter(col("n_match") >= 8).count()
    }
    assert(rows.map(_.getLong(2)).sum === confirmed,
      "per-class pair counts partition the confirmed pairs")
    val splits = Set("train", "val", "test")
    rows.foreach { r =>
      assert(splits(r.getString(0)) && splits(r.getString(1)))
      assert(r.getString(0) <= r.getString(1), "classes are unordered pairs")
      assert(r.getBoolean(4) === (r.getString(0) != r.getString(1)))
      assert(r.getLong(3) <= r.getLong(2), "exposed docs ≤ pairs")
    }
  }

  test("weighted_percentile_value: picks satisfy the weighted-rank law") {
    val rows = operators.StatOps.queries("weighted_percentile_value")(
      spark, sf()).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf())
      .select(col("l_returnflag").as("grp"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("w"))
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val grp = r.getString(0)
      val pts = data(grp).map(x => (x.getLong(1), x.getLong(2)))
      val tot = pts.map(_._2).sum
      assert(r.getLong(1) === tot, s"$grp: total weight reconciles")
      for ((q, idx) <- Seq((50, 2), (90, 3))) {
        val pick = r.getLong(idx)
        val wAtOrBelow = pts.filter(_._1 <= pick).map(_._2).sum
        val wBelow = pts.filter(_._1 < pick).map(_._2).sum
        assert(wAtOrBelow * 100 >= tot * q,
          s"$grp p$q: cumulative weight reaches the quantile")
        assert(wBelow * 100 < tot * q,
          s"$grp p$q: pick is the SMALLEST qualifying value")
        assert(pts.exists(_._1 == pick), s"$grp p$q: pick is attained")
      }
    }
  }

  test("hash_uniformity_audit: exact chi2 replay from driver-side md5; z leaf pinned") {
    val Array(r) = operators.AuditOps
      .queries("hash_uniformity_audit")(spark, sf()).collect()
    val (n, hit, chi2, dof, z, ok) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
    // driver-side replay: first md5 byte of every doc_id
    val ids = Tables.documents(spark, sf()).select("doc_id")
      .collect().map(_.getLong(0))
    val counts = new Array[Long](256)
    ids.foreach { id =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))(0) & 0xff
      counts(b) += 1
    }
    assert(n === ids.length.toLong)
    assert(hit === counts.count(_ > 0).toLong)
    val q = counts.map(o => BigInt(256 * o - n).pow(2)).sum
    assert(BigInt(chi2) === q * 1000000 / (256 * BigInt(n)),
      "pure-integer chi2 replay")
    assert(dof === 255L)
    assert(z === math.floor((chi2.toDouble / 1e6 - 255.0) /
      math.sqrt(510.0) * 1e6).toLong, "z leaf replay")
    assert(ok === (math.abs(z) <= 3000000L))
  }
}
