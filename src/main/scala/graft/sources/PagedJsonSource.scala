package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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

object PagedJsonSource {
  val PageSize = 50
  // nullable: the WRITE-side schema check rejects nullable inputs into
  // non-null columns, and fixture scans are nullable by default
  val schema: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = true),
    StructField("page", IntegerType, nullable = true)))

  private val entryRe =
    """\{"file":"([^"]+)","lo":(-?\d+),"hi":(-?\d+)\}""".r

  /** Manifest entries (file, lo, hi) in commit order, if present. */
  def readManifest(dir: java.io.File): Option[Seq[(String, Long, Long)]] = {
    val m = new java.io.File(dir, "_manifest.ndjson")
    if (!m.isFile) None
    else {
      val src = scala.io.Source.fromFile(m)
      try Some(src.getLines().collect {
        case entryRe(f, lo, hi) => (f, lo.toLong, hi.toLong)
      }.toSeq)
      finally src.close()
    }
  }

  def writeManifest(dir: java.io.File,
      entries: Seq[(String, Long, Long)]): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, "_manifest.ndjson").toPath,
      entries.map { case (f, lo, hi) =>
        s"""{"file":"$f","lo":$lo,"hi":$hi}"""
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
    new PagedScanBuilder(path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new PagedWriteBuilder(path, info.schema())
}

class PagedScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownLimit with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var limit: Int = -1
  private var required: StructType = PagedJsonSource.schema
  private var pushed: Array[Filter] = Array.empty
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
  override def build(): Scan = new PagedScan(path, required, limit, pushed)
}

class PagedScan(path: String, required: StructType, val pushedLimit: Int,
    val pushed: Array[Filter] = Array.empty) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan(path=$path, pushedLimit=$pushedLimit, " +
      s"pushedFilters=[${pushed.mkString(", ")}])"

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
    val dir = new java.io.File(path)
    // (file, pageId, Option[(lo, hi)]) — the manifest, when present, IS the
    // table listing (commit-protocol output, key-ordered); the raw glob is
    // only the manifest-less fallback. Page id is intrinsic (manifest
    // position / file name), so pruning cannot renumber surviving pages.
    val pages: Seq[(java.io.File, Int, Option[(Long, Long)])] =
      PagedJsonSource.readManifest(dir) match {
        case Some(entries) => entries.zipWithIndex.map { case ((f, lo, hi), i) =>
          (new java.io.File(dir, f), i, Some((lo, hi)))
        }
        case None => dir.listFiles()
          .filter(_.getName.matches("page-\\d+\\.ndjson"))
          .sortBy(_.getName).toSeq
          .map(f => (f,
            f.getName.stripPrefix("page-").stripSuffix(".ndjson").toInt,
            None))
      }
    val (lo, hi) = keyRange
    // stats pruning: drop pages whose [lo,hi] is disjoint with the pushed
    // key range (pages without stats are always kept)
    val files = pages.filter(_._3.forall {
      case (plo, phi) => phi >= lo && plo <= hi
    })
    val keep =
      if (pushedLimit < 0) files
      else files.take(math.max(1,
        (pushedLimit + PagedJsonSource.PageSize - 1) / PagedJsonSource.PageSize))
    keep.map { case (f, idx, _) =>
      PagedPartition(f.getAbsolutePath, idx): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
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

case class PageFileCommit(files: Seq[(String, Long, Long)])
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
    val merged = (prior ++ committed).sortBy(_._2)
    if (truncate) {
      val keep = committed.map(_._1).toSet
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
        fs.foreach(f => new java.io.File(path, f._1).delete())
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
      private val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
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
        files += ((name, buf.head, buf.last))
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
        files.foreach(f => new java.io.File(path, f._1).delete())
      override def close(): Unit = ()
    }
  }
}

class PagedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagedPartition]
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(pp.file)
      private val it = source.getLines()
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
      override def close(): Unit = source.close()
    }
  }
}
