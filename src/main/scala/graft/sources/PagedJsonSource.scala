package graft.sources

import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JsonToStructs}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.etl.ShiftSchemas

/** DataSourceV2 source for paginated JSON shift pages — the 100 TB-shape
  * implementation of the reference's HTTP source (S1) and batch-size
  * pushdown (S3) from SURVEY §2.1: one page file per input partition
  * (pages load in parallel, unlike the reference's sequential loop), with
  *
  *  - limit pushdown ([[SupportsPushDownLimit]]): a `LIMIT n` query stops
  *    each partition after n rows — the DSv2-native form of the
  *    reference's `limit` query parameter;
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): projections
  *    of the page envelope (e.g. just `links`) skip parsing `results`.
  *
  * Usage: `spark.read.format("graft.sources.PagedJsonSource")
  * .load(dir)` where `dir` holds one `*.json` page per file. JSON is
  * parsed on executors through Catalyst's own `JsonToStructs` against
  * the declared page schema — never inferred, never driver-side.
  */
class PagedJsonSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShiftSchemas.pageSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedJsonTable(
      Option(properties.get("path")).getOrElse(
        throw new IllegalArgumentException("path option required")))
}

private[sources] class PagedJsonTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($dir)"
  override def schema(): StructType = ShiftSchemas.pageSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(dir)
}

private[sources] class PagedJsonScanBuilder(dir: String)
  extends ScanBuilder with SupportsPushDownLimit
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var limit: Int = -1
  private var required: StructType = ShiftSchemas.pageSchema
  private var countPushed = false

  // partial push: each partition caps its output; Spark still applies the
  // global limit above (return false = "not fully pushed")
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema

  // COUNT(*) pushdown: the source is one-row-per-page-file, so a global
  // count is the page-directory FILE COUNT — answerable from a listing
  // without reading (or parsing) a single byte of page content. The
  // DSv2-native analog of parquet's footer-count: like any
  // metadata-backed count it trusts the layout (a malformed page that
  // would fail a full scan still counts — its row exists, its parse is
  // what fails). Complete pushdown (no partial re-agg above the scan);
  // anything beyond a bare grouping-free COUNT(*) is declined.
  private def isBareCountStar(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    isBareCountStar(agg) && limit < 0

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    if (isBareCountStar(agg) && limit < 0) { countPushed = true; true }
    else false

  override def build(): Scan =
    if (countPushed) new PagedJsonCountScan(dir)
    else new PagedJsonScan(dir, required, limit)
}

/** Completely-pushed COUNT(*): one partition, one row, file count from
  * the listing — no page bytes read. */
private[sources] class PagedJsonCountScan(dir: String) extends Scan with Batch {
  override def readSchema(): StructType =
    new StructType().add("count(*)", org.apache.spark.sql.types.LongType, nullable = false)
  override def description(): String = s"PagedJsonCountScan(dir=$dir, pushed=COUNT(*))"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val s = Files.list(Paths.get(dir))
    val n =
      try s.iterator().asScala.count(_.toString.endsWith(".json"))
      finally s.close()
    Array(PagedJsonCountPartition(n))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = if (emitted) false else { emitted = true; true }
          override def get(): InternalRow = new GenericInternalRow(
            Array[Any](p.asInstanceOf[PagedJsonCountPartition].n.toLong))
          override def close(): Unit = ()
        }
    }
}

private[sources] case class PagedJsonCountPartition(n: Int) extends InputPartition

private[sources] class PagedJsonScan(dir: String, schema: StructType, limit: Int)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String =
    s"PagedJsonScan(dir=$dir, limit=${if (limit < 0) "none" else limit}, schema=${schema.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val s = Files.list(Paths.get(dir))
    val files =
      try s.iterator().asScala.map(_.toString).filter(_.endsWith(".json")).toArray.sorted
      finally s.close()
    // one row per page file ⇒ a pushed LIMIT n needs at most n files: the
    // pushdown prunes whole input partitions, not just rows
    val chosen = if (limit >= 0) files.take(limit) else files
    chosen.map(f => PagedJsonPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory(schema, limit)
}

private[sources] case class PagedJsonPartition(file: String) extends InputPartition

private[sources] class PagedJsonReaderFactory(schema: StructType, limit: Int)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PagedJsonReader(partition.asInstanceOf[PagedJsonPartition].file, schema, limit)
}

/** Parses one page file into one InternalRow via Catalyst JsonToStructs. */
private[sources] class PagedJsonReader(file: String, schema: StructType, limit: Int)
  extends PartitionReader[InternalRow] {

  private var emitted = 0
  private var done = false
  private var current: InternalRow = _

  private lazy val parse: UTF8String => Any = {
    // FAILFAST: a malformed page must fail the task loudly. PERMISSIVE
    // (the default) would emit an all-null row — and since LIMIT pushdown
    // prunes to the first n page FILES, a swallowed page would corrupt
    // LIMIT semantics (fewer/null rows while later valid pages exist).
    val expr = JsonToStructs(schema, Map("mode" -> "FAILFAST", "timeZone" -> "UTC"),
      BoundReference(0, StringType, nullable = true), Some("UTC"))
    val input = new GenericInternalRow(1)
    (s: UTF8String) => { input.update(0, s); expr.eval(input) }
  }

  override def next(): Boolean =
    if (done || (limit >= 0 && emitted >= limit)) false
    else {
      val json = new String(Files.readAllBytes(Paths.get(file)), "UTF-8")
      // A page that fails to parse MUST fail the task, not emit 0 rows:
      // planInputPartitions prunes to the first `limit` files, so a
      // silently-dropped page would make LIMIT n return < n rows even
      // though later valid pages exist (partial pushdown may not drop
      // qualifying rows). Matches the reference's fetch-failure → error
      // contract (etl/app/main.py:44-49).
      val parsed =
        try parse(UTF8String.fromString(json))
        catch {
          case e: Exception => throw new IllegalStateException(
            s"unparseable page file: $file", e)
        }
      parsed match {
        case r: InternalRow => current = r; emitted += 1; done = true; true
        case _ => throw new IllegalStateException(
          s"unparseable page file: $file (null parse result for schema " +
            s"${schema.fieldNames.mkString(",")})")
      }
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
