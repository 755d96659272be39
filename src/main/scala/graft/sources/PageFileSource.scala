package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 realization of `src_rest_paginated` (SURVEY.md §2.1):
  * a paginated source where each API page is one `page-N.json` envelope
  * file under `path`, exposed as rows `(page INT, body STRING)`.
  *
  * What makes this the 100 TB shape:
  *  - **one InputPartition per page** → a 10 000-page extract fans out as
  *    10 000 independent tasks, no driver bottleneck;
  *  - **pagination pushdown** (`SupportsPushDownFilters` on `page`):
  *    `WHERE page >= N` prunes partitions at PLANNING time — the resume
  *    path of the s5 checkpoint never even lists skipped pages' bytes,
  *    the batch analog of the reference pushing `data_filtro_api` into
  *    the API query (ref :333,:348).
  *
  * Usage: `spark.read.format("graft.sources.PageFileSource")
  *   .option("path", dir).load().filter($"page" >= 3)` then decode `body`
  * with EnvelopeReader's schema (from_json).
  */
class PageFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PageFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.PageFileSource requires .option(\"path\", <dir>)")
    new PageTable(path)
  }
}

object PageFileSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("body", StringType, nullable = false)))

  private val PageFile = """page-(\d+)\.json""".r

  /** Page files under `dir`, deduplicated by page number (first path in
    * (page, path) order wins, so `page-01.json` vs `page-1.json` can't
    * yield two rows); out-of-Int-range numbers are skipped, not fatal. */
  def listPages(dir: String): Seq[(Int, String)] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else {
      val stream = Files.list(Paths.get(dir))
      val all =
        try stream.iterator().asScala.flatMap { p =>
          p.getFileName.toString match {
            case PageFile(n) => n.toIntOption.map(_ -> p.toString)
            case _ => None
          }
        }.toSeq
        finally stream.close()
      all.sorted.distinctBy(_._1)
    }
}

class PageTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_pages($path)"
  override def schema(): StructType = PageFileSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PageScanBuilder(path)
}

/** Pushes page-range predicates into partition planning. Bounds are kept
  * as Long so strict-bound adjustment (`v ± 1`) cannot overflow — Spark
  * never re-applies a filter claimed in pushedFilters(), so a wrapped
  * bound would silently return wrong rows. A single match both decides
  * support and updates the bound (no second list to keep in sync). */
class PageScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownFilters {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var pushed = List.empty[Filter]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = filters.filterNot { f =>
      val consumed = f match {
        case GreaterThanOrEqual("page", v: Int) => lo = math.max(lo, v.toLong); true
        case GreaterThan("page", v: Int) => lo = math.max(lo, v.toLong + 1); true
        case LessThanOrEqual("page", v: Int) => hi = math.min(hi, v.toLong); true
        case LessThan("page", v: Int) => hi = math.min(hi, v.toLong - 1); true
        case EqualTo("page", v: Int) =>
          lo = math.max(lo, v.toLong); hi = math.min(hi, v.toLong); true
        case _ => false
      }
      if (consumed) pushed ::= f
      consumed
    }
    rest // Spark re-applies the rest; pushed ranges prune partitions
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def build(): Scan = new PageScan(path, lo, hi)
}

class PageScan(path: String, lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = PageFileSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_pages path=$path pageRange=[$lo,$hi]"

  override def planInputPartitions(): Array[InputPartition] =
    PageFileSource.listPages(path)
      .filter { case (n, _) => n >= lo && n <= hi }
      .map { case (n, p) => PagePartition(n, p): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val PagePartition(page, file) = partition: @unchecked
        new PartitionReader[InternalRow] {
          private var consumed = false
          override def next(): Boolean = !consumed && { consumed = true; true }
          override def get(): InternalRow =
            InternalRow(page, UTF8String.fromString(
              new String(Files.readAllBytes(Paths.get(file)), "UTF-8")))
          override def close(): Unit = ()
        }
      }
    }
}

case class PagePartition(page: Int, file: String) extends InputPartition
