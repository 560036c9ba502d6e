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
  val schema: StructType = StructType(Seq(
    StructField("p_partkey", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false)))
}

class PagedJsonTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = PagedJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path)
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
    val manifest = new java.io.File(dir, "_manifest.ndjson")
    val entryRe =
      """\{"file":"([^"]+)","lo":(-?\d+),"hi":(-?\d+)\}""".r
    val stats: Map[String, (Long, Long)] =
      if (manifest.isFile)
        scala.io.Source.fromFile(manifest).getLines().collect {
          case entryRe(f, lo, hi) => f -> (lo.toLong, hi.toLong)
        }.toMap
      else Map.empty
    val (lo, hi) = keyRange
    val files = dir.listFiles()
      .filter(_.getName.matches("page-\\d+\\.ndjson"))
      .sortBy(_.getName)
      // stats pruning: drop pages whose [lo,hi] is disjoint with the
      // pushed key range (pages without stats are always kept)
      .filter(f => stats.get(f.getName)
        .forall { case (plo, phi) => phi >= lo && plo <= hi })
    val keep =
      if (pushedLimit < 0) files
      else files.take(math.max(1,
        (pushedLimit + PagedJsonSource.PageSize - 1) / PagedJsonSource.PageSize))
    // page id is intrinsic to the FILE (its name), so pruning a prefix
    // of pages cannot renumber the survivors
    keep.map { f =>
      val idx = f.getName.stripPrefix("page-").stripSuffix(".ndjson").toInt
      PagedPartition(f.getAbsolutePath, idx): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required)
}

case class PagedPartition(file: String, page: Int) extends InputPartition

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
