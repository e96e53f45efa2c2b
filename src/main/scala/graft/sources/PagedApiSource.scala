package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructType, StringType, StructField}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 source emulating the reference's paginated Dataset-API scan
  * (S3/B4, reference `client/dimensions_api.go:82-97`): `MaxWorkers`
  * concurrent pagers × `BatchSize` items per page becomes
  * `planInputPartitions` = one partition per page, scheduled concurrently
  * by Spark — the idiomatic shape for an HTTP-paged source at scale
  * (pages fetch in parallel across executors, no driver bottleneck).
  *
  * The fetch itself is injectable: the `fetcher` option names a
  * [[DimensionPageFetcher]] implementation, instantiated reflectively on
  * the executor once per page partition — exactly where the reference
  * issues one `GetDimensions` HTTP call per page, so a `java.net.http`
  * client drops into the existing partition-per-page reader with no
  * planner change. Default is [[FakeDimensionFetcher]] (deterministic
  * generator, same seam as the reference's mocked `IClient`). Column
  * pruning is pushed down (SupportsPushDownRequiredColumns) so
  * `select(one_col)` does not materialize whole rows.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-paged-api")
  *   .option("instanceId", "42").option("totalItems", "1000")
  *   .option("pageSize", "100")
  *   .option("fetcher", "com.example.HttpDimensionFetcher") // optional
  *   .load()
  * }}}
  */
class PagedApiSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged-api"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties keep the caller's original key case — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedApiTable(
      opts.getOrDefault("instanceid", "42"),
      opts.getOrDefault("totalitems", "1000").toLong,
      opts.getOrDefault("pagesize", "100").toInt,
      opts.getOrDefault("fetcher", classOf[FakeDimensionFetcher].getName))
  }
}

object PagedApiSource {
  val schema: StructType = StructType(Seq(
    StructField("instance_id", StringType, nullable = false),
    StructField("dimension_id", StringType, nullable = false),
    StructField("option", StringType, nullable = false),
    StructField("code_list_id", StringType, nullable = false)))
}

/** One fetched dimension row (full source schema, pre-pruning). */
case class DimensionItem(
    instanceId: String, dimensionId: String, option: String, codeListId: String)

/** The injectable fetch seam (reference `client/dimensions_api.go:82-97`,
  * one call per page). Implementations must have a no-arg constructor —
  * they are instantiated reflectively on the executor, once per page
  * partition, so a real implementation can open an HTTP client per page
  * (or pool it in a companion) without serializing connection state
  * through the plan.
  */
trait DimensionPageFetcher extends Serializable {
  /** Fetch items [start, end) of `instanceId`'s dimension listing. */
  def fetchPage(instanceId: String, start: Long, end: Long): Iterator[DimensionItem]
}

/** Deterministic stand-in for the remote Dataset API: item i of an instance
  * is a pure function of (instanceId, i), so results are reproducible in
  * the DuckDB oracle via `range()`.
  */
class FakeDimensionFetcher extends DimensionPageFetcher {
  override def fetchPage(
      instanceId: String, start: Long, end: Long): Iterator[DimensionItem] =
    Iterator.range(start, end).map { i =>
      val t = FakeDimensionService.item(instanceId, i)
      DimensionItem(t._1, t._2, t._3, t._4)
    }
}

/** Deterministic stand-in for the remote Dataset API: item i of an instance
  * is a pure function of (instanceId, i), so results are reproducible in
  * the DuckDB oracle via `range()`.
  */
object FakeDimensionService {
  def item(instanceId: String, i: Long): (String, String, String, String) = (
    instanceId,
    s"${instanceId}_d${i % 7}",
    s"opt${i % 50}",
    s"cl${i % 7}")
}

private[sources] class PagedApiTable(
    instanceId: String, total: Long, pageSize: Int, fetcherClass: String)
    extends Table with SupportsRead {
  override def name(): String = s"paged_api($instanceId)"
  override def schema(): StructType = PagedApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(instanceId, total, pageSize, fetcherClass)
}

private[sources] class PagedScanBuilder(
    instanceId: String, total: Long, pageSize: Int, fetcherClass: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedApiSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new PagedScan(instanceId, total, pageSize, fetcherClass, required)
}

private[sources] class PagedScan(
    instanceId: String, total: Long, pageSize: Int, fetcherClass: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One input partition per API page — the parallel-pager parity. */
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = ((total + pageSize - 1) / pageSize).toInt
    (0 until pages).map { p =>
      val start = p.toLong * pageSize
      PagePartition(instanceId, start, math.min(start + pageSize, total)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required, fetcherClass)
}

private[sources] case class PagePartition(instanceId: String, start: Long, end: Long)
    extends InputPartition

private[sources] class PagedReaderFactory(required: StructType, fetcherClass: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagePartition]
    // executor-side construction: one fetcher (≡ one page request) per
    // partition; only the class NAME rides through the serialized plan
    val fetcher = Class
      .forName(fetcherClass, true, Thread.currentThread().getContextClassLoader)
      .getDeclaredConstructor().newInstance().asInstanceOf[DimensionPageFetcher]
    // map required column names to the full-schema field index once per page
    val fieldIdx = required.fieldNames.map(PagedApiSource.schema.fieldIndex)
    new PartitionReader[InternalRow] {
      private val items = fetcher.fetchPage(p.instanceId, p.start, p.end)
      private var cur: DimensionItem = _
      override def next(): Boolean = {
        if (items.hasNext) { cur = items.next(); true } else false
      }
      override def get(): InternalRow = {
        val full = Array(cur.instanceId, cur.dimensionId, cur.option, cur.codeListId)
        InternalRow.fromSeq(fieldIdx.map(j => UTF8String.fromString(full(j))).toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
