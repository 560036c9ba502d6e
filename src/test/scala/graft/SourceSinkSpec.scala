package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** S3 (staging JSON round trip), S4 (type-routed partitioned sink),
  * S5 (overwrite/--replace) — the side-effecting §2.A rows
  * (app.py:84-92, app.py:207, README.md:188).
  */
class SourceSinkSpec extends SparkSpec {

  test("FAILFAST load throws on a malformed staged line (bq load rejection)") {
    val dir = tmpDir("graft_failfast")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/stage.json"),
      """{"event_id":1,"value":1.5}
        |{"event_id":2,"value":BROKEN
        |""".stripMargin)
    // PERMISSIVE quarantines the bad line... (cached: Spark disallows
    // raw-file queries referencing only the corrupt-record column)
    val permissive = spark.read
      .schema("event_id LONG, value DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
    finally permissive.unpersist()
    // ...FAILFAST rejects the load outright
    val ex = intercept[Exception] {
      spark.read.schema("event_id LONG, value DOUBLE")
        .option("mode", "FAILFAST").json(dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m => m.toLowerCase.contains("malformed")
        || m.contains("FAILFAST")), msgs(ex).mkString("; "))
  }

  test("S3: JSON staging round trip is lossless under the declared schema") {
    val out = tmpDir("graft_s3")
    val src = Tables.orders(spark, sf())
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date_str"))
    src.write.mode(SaveMode.Overwrite).json(out)
    val back = spark.read
      .schema("o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_date_str STRING")
      .json(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("S4: partitionBy writes Hive-style type-routed layout") {
    val out = tmpDir("graft_s4")
    Tables.events(spark, sf())
      .withColumn("route",
        when(col("event_type") === "click", "clicks").otherwise("other"))
      .write.mode(SaveMode.Overwrite).partitionBy("route").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("route=clicks") && dirs.contains("route=other"))
    // partition pruning: reading one route must not lose rows vs a filter
    val clicksDirect = spark.read.parquet(s"$out/route=clicks").count()
    val clicksFiltered = Tables.events(spark, sf())
      .filter(col("event_type") === "click").count()
    assert(clicksDirect === clicksFiltered)
  }

  test("S5: SaveMode.Overwrite replaces table contents (bq load --replace)") {
    val out = tmpDir("graft_s5")
    Tables.nation(spark, sf()).write.mode(SaveMode.Overwrite).parquet(out)
    assert(spark.read.parquet(out).count() === 25)
    Tables.region(spark, sf()).write.mode(SaveMode.Overwrite).parquet(out)
    assert(spark.read.parquet(out).count() === 5) // fully replaced, not appended
  }

  test("S6c: V2 paged sink — commit protocol builds a key-ordered exact manifest") {
    val out = tmpDir("graft_s6c")
    Tables.part(spark, sf())
      .select(col("p_partkey"), lit(0).as("page"))
      .repartitionByRange(4, col("p_partkey"))
      .sortWithinPartitions("p_partkey")
      .write.format("graft.sources.PagedJsonSource")
      .option("path", out).mode(SaveMode.Overwrite).save()
    val entries = graft.sources.PagedJsonSource
      .readManifest(new java.io.File(out))
      .getOrElse(fail("commit() did not write a manifest"))
    // every listed file exists; bounds are key-ordered and non-overlapping
    // (range-partitioned + sorted input ⇒ disjoint pages)
    entries.foreach { case graft.sources.PageMeta(f, lo, hi, n) =>
      assert(new java.io.File(out, f).isFile, s"manifest lists missing $f")
      assert(n.exists(_ > 0), s"page $f missing row count")
      assert(lo <= hi)
    }
    assert(entries.sliding(2).forall {
      case Seq(a, b) => a.hi < b.lo
      case _ => true
    }, "pages overlap — manifest not key-disjoint")
    // read-back through the manifest is the identity on the key set
    val back = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", out).load().select("p_partkey")
    val want = Tables.part(spark, sf()).select("p_partkey")
    assert(back.count() === want.count())
    assert(back.except(want).count() === 0 && want.except(back).count() === 0)
  }

  test("S6e: losing speculative attempt's abort cannot delete the winner's pages") {
    // Drive the V2 writer protocol by hand: two attempts for the SAME
    // partition (speculation/retry), winner commits, loser aborts. With
    // attempt-unique file names the loser's abort must leave every file
    // the winner reported in its commit message intact.
    val out = tmpDir("graft_s6e")
    val factory = new graft.sources.PagedWriterFactory(out,
      graft.sources.PagedJsonSource.schema)
    def runAttempt(taskId: Long) = {
      val w = factory.createWriter(partitionId = 0, taskId = taskId)
      (1L to 120L).foreach(k => w.write(
        org.apache.spark.sql.catalyst.InternalRow(k, 0)))
      w
    }
    val winner = runAttempt(taskId = 7L)
    val loser = runAttempt(taskId = 8L)
    val msg = winner.commit().asInstanceOf[graft.sources.PageFileCommit]
    loser.abort() // the race: abort lands AFTER the winner committed
    msg.files.foreach { m =>
      assert(new java.io.File(out, m.file).isFile,
        s"loser's abort deleted the winner's committed page ${m.file}")
      assert(m.n.exists(_ > 0), s"page ${m.file} missing row count")
    }
    // and the winner's pages carry all 120 rows
    assert(msg.files.flatMap(_.n).sum === 120L)
  }

  test("S6f: pushed LIMIT returns the full row count across SHORT pages") {
    val out = tmpDir("graft_s6f")
    // 3 uneven writer partitions ⇒ each partition's tail flush is a
    // short page (e.g. 50+16 / 50+17 / 50+17 for 200 keys), so a
    // ceil(limit/PageSize) page take would come up short
    Tables.part(spark, sf())
      .select(col("p_partkey"), lit(0).as("page"))
      .repartitionByRange(3, col("p_partkey"))
      .sortWithinPartitions("p_partkey")
      .write.format("graft.sources.PagedJsonSource")
      .option("path", out).mode(SaveMode.Overwrite).save()
    val total = Tables.part(spark, sf()).count()
    val lim = math.min(100L, total).toInt
    val got = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", out).load().limit(lim).collect().length
    assert(got === lim, s"pushed limit returned $got of $lim rows")
  }

  test("S6d: V2 paged sink append MERGES the prior manifest (no data drop)") {
    val out = tmpDir("graft_s6d")
    val all = Tables.part(spark, sf()).select(col("p_partkey"), lit(0).as("page"))
    val mid = all.agg(max("p_partkey")).head.getLong(0) / 2
    def write(df: org.apache.spark.sql.DataFrame, mode: SaveMode): Unit =
      df.repartitionByRange(2, col("p_partkey"))
        .sortWithinPartitions("p_partkey")
        .write.format("graft.sources.PagedJsonSource")
        .option("path", out).mode(mode).save()
    write(all.filter(col("p_partkey") <= mid), SaveMode.Overwrite)
    write(all.filter(col("p_partkey") > mid), SaveMode.Append)
    // the second commit must keep the first write's manifest entries
    val back = spark.read.format("graft.sources.PagedJsonSource")
      .option("path", out).load().select("p_partkey")
    val want = all.select("p_partkey")
    assert(back.count() === want.count(), "append dropped prior pages")
    assert(back.except(want).count() === 0 && want.except(back).count() === 0)
  }
}
