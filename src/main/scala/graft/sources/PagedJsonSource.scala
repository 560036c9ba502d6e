package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal DataSourceV2 over a directory of fixed-size JSON "pages" —
  * the structural form of the reference's offset-paginated REST ingest
  * (/root/reference/app.py:154-163: first page's `total` plans the
  * remaining offset fetches; each fetch is an independent HTTP GET).
  * Here each page is a local ndjson file (the sandbox has no network, so
  * the transport is the filesystem), and the Spark mapping is exact:
  *
  *   - one page = one [[InputPartition]] → every page is fetched by its
  *     own task, in parallel, exactly like the reference's fan-out;
  *   - `SupportsPushDownLimit`: LIMIT n plans only ceil(n/pageSize)
  *     pages — the "stop paginating once you have enough" optimization,
  *     done by the planner instead of imperative code. Pages are whole
  *     files, so the push is PARTIAL (Spark keeps its own LIMIT on top);
  *   - `SupportsPushDownRequiredColumns`: the reader materializes only
  *     the projected fields;
  *   - `SupportsPushDownFilters`: the staging manifest records each
  *     page's key bounds, and range/equality predicates on `p_partkey`
  *     prune whole pages by those stats before any page is opened — the
  *     same stats-pruning contract as parquet row groups or an Iceberg
  *     manifest. Pushed filters are also kept as residuals (pages carry
  *     rows outside the bound only at their edges), so Spark re-applies
  *     them row-level and pruning can never change results.
  *
  * At 100 TB the same shape holds: partitions-per-page keeps memory per
  * task bounded by the page size the upstream API already enforces.
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedJsonTable(properties.get("path"))
}

/** One manifest entry: page file name, inclusive key bounds, and (when
  * the producer recorded it) the page's row count — the same per-file
  * stats tuple an Iceberg manifest or a parquet footer carries. `n`
  * is optional for manifest-format compatibility; aggregate pushdown
  * of COUNT requires it.
  */
final case class PageMeta(file: String, lo: Long, hi: Long, n: Option[Long])

object PagedJsonSource {
  val PageSize = 50
  // nullable: the WRITE-side schema check rejects nullable inputs into
  // non-null columns, and fixture scans are nullable by default
  val schema: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = true),
    StructField("page", IntegerType, nullable = true)))

  private val entryRe =
    """\{"file":"([^"]+)","lo":(-?\d+),"hi":(-?\d+)(?:,"n":(\d+))?\}""".r

  private def parseManifest(lines: Iterator[String]): Seq[PageMeta] =
    lines.collect {
      case entryRe(f, lo, hi, n) =>
        PageMeta(f, lo.toLong, hi.toLong, Option(n).map(_.toLong))
    }.toSeq

  /** Manifest entries in commit order, if a manifest is present. */
  def readManifest(dir: java.io.File): Option[Seq[PageMeta]] = {
    val m = new java.io.File(dir, "_manifest.ndjson")
    if (!m.isFile) None
    else {
      val src = scala.io.Source.fromFile(m)
      try Some(parseManifest(src.getLines()))
      finally src.close()
    }
  }

  /** True when the table path is an HTTP(S) endpoint — the reference's
    * actual transport (app.py:154-163 fans out offset GETs against a
    * throttled REST API). Pages and the manifest are then fetched by
    * [[HttpPages.fetch]] with 429/Retry-After + 5xx retry semantics.
    */
  def isHttp(path: String): Boolean =
    path != null && (path.startsWith("http://") || path.startsWith("https://"))

  /** Transport-dispatching manifest read. Over HTTP the manifest is
    * REQUIRED — there is no directory listing to fall back on, so a
    * missing/failing manifest endpoint throws rather than silently
    * planning zero pages. That includes the WELL-FORMED-BUT-WRONG 200
    * (ADVICE r17 #4): a captive portal, proxy error page, or wrong
    * endpoint returns 200 with a body that matches no manifest entry —
    * parsing it to an empty page list would silently plan an empty
    * table, so a body with zero parseable entries (or any non-blank
    * line that is not an entry) fails as loudly as a 404.
    */
  def readManifestAt(path: String): Option[Seq[PageMeta]] =
    if (isHttp(path)) {
      val url = s"${path.stripSuffix("/")}/_manifest.ndjson"
      val lines = HttpPages.fetch(url).linesIterator.toSeq
        .filter(_.trim.nonEmpty)
      val entries = parseManifest(lines.iterator)
      if (entries.isEmpty || entries.size != lines.size)
        throw new java.io.IOException(
          s"GET $url returned 200 but the body is not a manifest " +
            s"(${entries.size} of ${lines.size} lines parse as entries) - " +
            "refusing to plan a silently-empty table")
      Some(entries)
    } else readManifest(new java.io.File(path))

  def writeManifest(dir: java.io.File, entries: Seq[PageMeta]): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, "_manifest.ndjson").toPath,
      entries.map { m =>
        s"""{"file":"${m.file}","lo":${m.lo},"hi":${m.hi}""" +
          m.n.map(v => s""","n":$v""").getOrElse("") + "}"
      }.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

class PagedJsonTable(path: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // the reference's API concurrency semaphore, sized per read
    // (app.py:36-45,101): resolved on the DRIVER from the session conf
    // and shipped with the reader factory
    new PagedScanBuilder(path,
      scala.util.Try(org.apache.spark.sql.SparkSession.active.conf
          .get("graft.http.maxConcurrent")).toOption
        .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
        .getOrElse(HttpPages.DefaultMaxConcurrent))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(!PagedJsonSource.isHttp(path),
      s"paged_json: HTTP paths are read-only (the reference API has no " +
        s"write surface): $path")
    new PagedWriteBuilder(path, info.schema())
  }
}

class PagedScanBuilder(path: String,
    maxConcurrent: Int = HttpPages.DefaultMaxConcurrent) extends ScanBuilder
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var limit: Int = -1
  private var required: StructType = PagedJsonSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var aggKinds: Option[Seq[String]] = None
  private var aggDesc: Seq[String] = Nil
  override def pushLimit(n: Int): Boolean = { limit = n; true }
  // whole-file pages: we prune page COUNT, not rows within a page
  override def isPartiallyPushed: Boolean = true
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("p_partkey", _) | GreaterThan("p_partkey", _)
         | GreaterThanOrEqual("p_partkey", _) | LessThan("p_partkey", _)
         | LessThanOrEqual("p_partkey", _) => true
      case _ => false
    }
    filters // ALL remain residual: pruning is page-granular, not row-exact
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown answered from the MANIFEST alone —
    * MIN/MAX(p_partkey) from the per-page key bounds, COUNT(*) from the
    * per-page row counts — the same trick parquet's DSv2 scan plays
    * with footer stats: zero data files are opened. Pushdown is
    * COMPLETE ([[supportCompletePushDown]]): Spark only attempts
    * aggregate pushdown when NO post-scan filter remains, this source
    * keeps every filter residual, and group-by/limit cases are
    * rejected — so whenever pushdown fires, the manifest stats are the
    * exact final answer and no aggregate node is planned at all.
    */
  /** MIN/MAX(p_partkey) / COUNT(*) kinds answerable from the manifest,
    * or None if anything in the aggregation (or the scan state: residual
    * filters, limit, group-by) puts it outside the manifest's reach.
    */
  private def manifestAggKinds(aggregation: Aggregation): Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    def isKey(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: NamedReference =>
          nr.fieldNames.length == 1 && nr.fieldNames.head == "p_partkey"
        case _ => false
      }
    if (aggregation.groupByExpressions.nonEmpty || pushed.nonEmpty || limit >= 0)
      return None
    // validate against the CURRENT manifest; values are re-derived at
    // planInputPartitions so a held DataFrame sees the same table state
    // the row-scan path would (both read the manifest per execution)
    val metas = PagedJsonSource.readManifestAt(path)
      .getOrElse(return None)
    val haveCounts = metas.forall(_.n.isDefined)
    Some(aggregation.aggregateExpressions.toSeq.map {
      case m: Min if isKey(m.column) => "min"
      case m: Max if isKey(m.column) => "max"
      case _: CountStar if haveCounts => "count"
      case _ => return None
    })
  }

  /** COMPLETE pushdown — "BigQuery answers COUNT(*) from table
    * metadata" made literal: with no residual filter, no limit and no
    * grouping, the manifest stats ARE the final answer, so Spark plans
    * NO aggregate at all above the scan (PlanSpec asserts it). Page
    * bounds are exact min/max per page (writer computes them from the
    * buffer, sorted or not), so min/lo and max/hi compose exactly.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    manifestAggKinds(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    manifestAggKinds(aggregation) match {
      case Some(kinds) =>
        aggKinds = Some(kinds)
        aggDesc = aggregation.aggregateExpressions.toSeq.map(_.describe)
        true
      case None => false
    }

  override def build(): Scan = aggKinds match {
    case Some(ks) => new PagedAggScan(path, ks, aggDesc)
    case None => new PagedScan(path, required, limit, pushed, maxConcurrent)
  }
}

/** Scan for a pushed-down aggregation: one partition, one row, computed
  * from `_manifest.ndjson` when the scan EXECUTES (planInputPartitions),
  * not when the aggregation was pushed — matching the row-scan path's
  * per-execution manifest read. No page file is ever opened.
  */
class PagedAggScan(path: String, kinds: Seq[String], descs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(kinds.indices.map(i =>
    StructField(s"pushed_agg_$i", LongType, nullable = true)))
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonAggScan(path=$path, PushedAggregates=[${descs.mkString(", ")}])"
  override def planInputPartitions(): Array[InputPartition] = {
    val metas = PagedJsonSource.readManifestAt(path)
      .getOrElse(Nil)
    val values: Seq[Any] = kinds.map {
      case "min" =>
        if (metas.isEmpty) null else java.lang.Long.valueOf(metas.map(_.lo).min)
      case "max" =>
        if (metas.isEmpty) null else java.lang.Long.valueOf(metas.map(_.hi).max)
      case "count" =>
        // pushAggregation validated counts against the manifest IT read;
        // this is a different read — if entries without `n` appeared in
        // between (legacy manifest, concurrent append), summing the rest
        // would silently undercount. Fail loudly instead.
        if (metas.exists(_.n.isEmpty))
          throw new IllegalStateException(
            s"$path: manifest entries lack row counts; cannot answer pushed COUNT")
        java.lang.Long.valueOf(metas.flatMap(_.n).sum)
    }
    Array(AggResultPartition(values.toArray))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val vals = p.asInstanceOf[AggResultPartition].values
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow = InternalRow.fromSeq(
            vals.toSeq.map {
              case null => null
              case l: java.lang.Long => l.longValue()
            })
          override def close(): Unit = ()
        }
    }
}

case class AggResultPartition(values: Array[Any]) extends InputPartition

class PagedScan(path: String, required: StructType, val pushedLimit: Int,
    val pushed: Array[Filter] = Array.empty,
    maxConcurrent: Int = HttpPages.DefaultMaxConcurrent)
    extends Scan with Batch
    with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan(path=$path, pushedLimit=$pushedLimit, " +
      s"pushedFilters=[${pushed.mkString(", ")}])"

  /** Runtime (DPP-style) filtering: when this table is joined on
    * `p_partkey` against a filtered dimension, Spark executes the dim
    * side first and hands the surviving keys back as an IN filter —
    * `planInputPartitions` then drops every page whose [lo, hi] bounds
    * contain none of them. Same mechanism as dynamic partition pruning
    * on a Hive layout, but at page granularity off the manifest stats;
    * filters stay residual row-level, so pruning can't change results.
    */
  private var runtimeKeys: Option[Set[Long]] = None
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("p_partkey"))
  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case org.apache.spark.sql.sources.In("p_partkey", vs) =>
        // accept ANY numeric boxing (a key cast can deliver Integer);
        // if any value is null or non-numeric the key set would be
        // incomplete, so disable pruning entirely — a no-op is safe,
        // a shrunken key set silently loses rows
        val keys = vs.map {
          case n: java.lang.Number => Some(n.longValue())
          case _ => None
        }
        runtimeKeys =
          if (keys.exists(_.isEmpty)) None else Some(keys.flatten.toSet)
      case EqualTo("p_partkey", v: Long) => runtimeKeys = Some(Set(v))
      case _ => ()
    }

  /** Key range implied by the pushed filters, as [lo, hi] inclusive. */
  private def keyRange: (Long, Long) =
    pushed.foldLeft((Long.MinValue, Long.MaxValue)) { case ((lo, hi), f) =>
      f match {
        case EqualTo("p_partkey", v: Long) => (math.max(lo, v), math.min(hi, v))
        case GreaterThan("p_partkey", v: Long) => (math.max(lo, v + 1), hi)
        case GreaterThanOrEqual("p_partkey", v: Long) => (math.max(lo, v), hi)
        case LessThan("p_partkey", v: Long) => (lo, math.min(hi, v - 1))
        case LessThanOrEqual("p_partkey", v: Long) => (lo, math.min(hi, v))
        case _ => (lo, hi)
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    // (location, pageId, Option[(lo, hi)]) — the manifest, when present,
    // IS the table listing (commit-protocol output, key-ordered); the raw
    // glob is only the LOCAL manifest-less fallback (over HTTP there is
    // no listing, and readManifestAt throws loudly instead). Page id is
    // intrinsic (manifest position / file name), so pruning cannot
    // renumber surviving pages.
    val http = PagedJsonSource.isHttp(path)
    val pages: Seq[(String, Int, Option[(Long, Long)], Option[Long])] =
      PagedJsonSource.readManifestAt(path) match {
        case Some(entries) => entries.zipWithIndex.map { case (m, i) =>
          val loc =
            if (http) s"${path.stripSuffix("/")}/${m.file}"
            else new java.io.File(new java.io.File(path), m.file)
              .getAbsolutePath
          (loc, i, Some((m.lo, m.hi)), m.n)
        }
        case None => new java.io.File(path).listFiles()
          .filter(_.getName.matches("page-\\d+\\.ndjson"))
          .sortBy(_.getName).toSeq
          .map(f => (f.getAbsolutePath,
            f.getName.stripPrefix("page-").stripSuffix(".ndjson").toInt,
            None, None))
      }
    val (lo, hi) = keyRange
    // stats pruning: drop pages whose [lo,hi] is disjoint with the pushed
    // key range (pages without stats are always kept), then with the
    // runtime keys when a DPP-style filter arrived
    val files = pages.filter(_._3.forall {
      case (plo, phi) => phi >= lo && plo <= hi &&
        runtimeKeys.forall(_.exists(k => k >= plo && k <= phi))
    })
    val keep =
      if (pushedLimit < 0) files
      else {
        // take pages until the CUMULATIVE row count covers the limit —
        // pages can be short (a writer partition's tail flush), so a
        // ceil(limit/PageSize) page count could return fewer rows than
        // the limit and the residual post-scan LIMIT cannot recover
        // them. Unknown counts contribute their minimum (1 row):
        // over-taking is always safe under partial pushdown.
        var cum = 0L
        files.takeWhile { f =>
          val take = cum < pushedLimit
          cum += f._4.getOrElse(1L)
          take
        }
      }
    keep.map { case (loc, idx, _, _) =>
      PagedPartition(loc, idx): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required, maxConcurrent)
}

case class PagedPartition(file: String, page: Int) extends InputPartition

/** V2 WRITE path — the commit protocol builds the manifest: each task
  * writes its own page files and reports (file, lo, hi) per page in its
  * commit message; the driver's `commit()` assembles the key-ordered
  * manifest in one atomic step (exactly how Iceberg/Delta turn task-side
  * file stats into a table snapshot). `abort()` deletes the task's
  * files, so a failed write leaves the previous manifest — and therefore
  * the readable table — untouched. Input should be range-partitioned and
  * sorted on the key for key-disjoint pages; the writer re-cuts pages at
  * `PageSize` rows regardless of the incoming `page` column.
  */
class PagedWriteBuilder(path: String, inputSchema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new PagedWrite(path, inputSchema, doTruncate)
}

case class PageFileCommit(files: Seq[PageMeta])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class PagedWrite(path: String, inputSchema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite = this

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    new PagedWriterFactory(path, inputSchema)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val dir = new java.io.File(path)
    val committed = messages.toSeq
      .flatMap { case PageFileCommit(fs) => fs }
    // Append (BATCH_WRITE without truncate) must MERGE the prior
    // manifest, not replace it — the manifest IS the table listing, so
    // dropping prior entries would silently unlink committed data.
    val prior =
      if (truncate) Nil
      else PagedJsonSource.readManifest(dir).getOrElse(Nil)
    val merged = (prior ++ committed).sortBy(_.lo)
    if (truncate) {
      val keep = committed.map(_.file).toSet
      dir.listFiles().filter(f => f.getName.endsWith(".ndjson")
        && !f.getName.startsWith("_") && !keep(f.getName)).foreach(_.delete())
    }
    PagedJsonSource.writeManifest(dir, merged)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit =
    messages.foreach {
      case PageFileCommit(fs) =>
        fs.foreach(f => new java.io.File(path, f.file).delete())
      case _ =>
    }
}

class PagedWriterFactory(path: String, inputSchema: StructType)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    val keyIdx = inputSchema.fieldIndex("p_partkey")
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      private val files = scala.collection.mutable.ArrayBuffer.empty[PageMeta]
      private var seq = 0

      private def flush(): Unit = if (buf.nonEmpty) {
        // taskId makes the name ATTEMPT-unique: a retried or speculative
        // attempt for the same partition must never collide with the
        // attempt it races, or its abort() would delete files the winning
        // attempt already reported in its commit message (the standard V2
        // commit-protocol rule; see FileCommitProtocol's attempt paths).
        val name = f"part-$partitionId%05d-$taskId-$seq%05d.ndjson"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$path/$name"),
          buf.map(k => s"""{"p_partkey":$k}""").mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // bounds from min/max, NOT head/last: nothing at this boundary
        // enforces key-sorted input, and these stats feed page pruning
        // AND pushed MIN/MAX aggregates — an unsorted write must degrade
        // to wide-but-correct bounds, never to wrong ones
        files += PageMeta(name, buf.min, buf.max, Some(buf.length.toLong))
        buf.clear(); seq += 1
      }

      override def write(row: InternalRow): Unit = {
        buf += row.getLong(keyIdx)
        if (buf.length >= PagedJsonSource.PageSize) flush()
      }
      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        flush(); PageFileCommit(files.toSeq)
      }
      override def abort(): Unit =
        files.foreach(f => new java.io.File(path, f.file).delete())
      override def close(): Unit = ()
    }
  }
}

class PagedReaderFactory(required: StructType,
    maxConcurrent: Int = HttpPages.DefaultMaxConcurrent)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagedPartition]
    new PartitionReader[InternalRow] {
      // HTTP pages are fetched through the retrying transport (429 →
      // Retry-After, 5xx → exponential backoff) — one GET per task,
      // the reference's fan-out, all tasks sharing the JVM-global
      // per-authority permit pool (app.py's API_CONCURRENCY_LIMIT);
      // local pages stream off disk
      private val source: Option[scala.io.Source] =
        if (PagedJsonSource.isHttp(pp.file)) None
        else Some(scala.io.Source.fromFile(pp.file))
      private val it: Iterator[String] = source match {
        case Some(src) => src.getLines()
        case None =>
          HttpPages.fetch(pp.file, maxConcurrent = maxConcurrent)
            .linesIterator
      }
      private var current: InternalRow = _
      private val keyRe = "\"p_partkey\"\\s*:\\s*(-?\\d+)".r
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val line = it.next()
          val k = keyRe.findFirstMatchIn(line)
            .map(_.group(1).toLong)
            .getOrElse(throw new IllegalStateException(
              s"malformed page line in ${pp.file}: $line"))
          current = InternalRow.fromSeq(required.fieldNames.toSeq.map {
            case "p_partkey" => k
            case "page" => pp.page
          })
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = source.foreach(_.close())
    }
  }
}
