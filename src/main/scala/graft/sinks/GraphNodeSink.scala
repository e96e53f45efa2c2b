package graft.sinks

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Graph-node sink as a DataSourceV2 WRITE path (reference S5–S7: node +
  * edge inserts through the graph driver, `store/graph.go`) — the
  * write-side counterpart of [[graft.sources.PagedApiSource]].
  *
  * Contract modeled 1:1 on the DSv2 commit protocol, which is what gives a
  * cluster sink its exactly-once story:
  *   - one [[DataWriter]] per partition ATTEMPT buffers its rows and sends
  *     them only in `commit()` (a failed/zombie attempt's buffer dies with
  *     `abort()` — nothing partial becomes visible);
  *   - the driver's [[BatchWrite.commit]] sees exactly one
  *     [[WriterCommitMessage]] per partition (Spark guarantees a single
  *     committed attempt), so re-executed tasks cannot double-write;
  *   - per-attempt state is keyed by (partitionId, taskId) and promoted to
  *     the visible store keyed by partitionId — last committed attempt
  *     wins, making task retries idempotent.
  *
  * The "graph database" here is a JVM-local store (the same port seam as
  * [[BatchedPatchSink.PatchClient]]); a production impl would open a graph
  * driver per writer and run its transaction inside `commit()`.
  *
  * Usage: `df.write.format("graft-graph-sink").option("jobId", id).save()`
  * with rows of (id: string, label: string, props: string).
  */
class GraphNodeSinkProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-graph-sink"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraphNodeSink.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraphNodeSinkTable
  override def supportsExternalMetadata(): Boolean = true
}

private class GraphNodeSinkTable extends Table with SupportsWrite {
  override def name(): String = "graft-graph-sink"
  override def schema(): StructType = GraphNodeSink.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val jobId = info.options.getOrDefault("jobId", info.queryId)
    // fail fast on the driver: names AND types (a wrong type would
    // otherwise surface as a per-task ClassCastException in the writer)
    val got = info.schema().fields.map(f => (f.name, f.dataType))
    val want = GraphNodeSink.Schema.fields.map(f => (f.name, f.dataType))
    require(got.sameElements(want),
      s"graph sink expects ${want.mkString(",")}, got ${got.mkString(",")}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraphNodeBatchWrite(jobId)
      }
    }
  }
}

private class GraphNodeBatchWrite(jobId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraphNodeWriterFactory(jobId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val counts = messages.map { case m: GraphNodeCommit => m.rows }
    GraphNodeSink.jobCommits.put(jobId, counts.sum)
    // a re-run of the same jobId REPLACES its previous contents: sweep all
    // prior partitions first, or a rerun that commits fewer partitions
    // (AQE coalescing) would leave the old run's tail visible
    GraphNodeSink.store.keySet.asScala.filter(_._1 == jobId)
      .foreach(GraphNodeSink.store.remove)
    // promote every committed attempt's buffer to the visible store
    messages.foreach { case m: GraphNodeCommit =>
      val staged = GraphNodeSink.staged.remove((jobId, m.partitionId, m.taskId))
      if (staged != null) GraphNodeSink.store.put((jobId, m.partitionId), staged)
    }
    // drop leftovers from non-committed (speculative/failed) attempts
    GraphNodeSink.staged.keySet.asScala.filter(_._1 == jobId)
      .foreach(GraphNodeSink.staged.remove)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    GraphNodeSink.staged.keySet.asScala.filter(_._1 == jobId)
      .foreach(GraphNodeSink.staged.remove)
    GraphNodeSink.aborts.incrementAndGet(): Unit
  }
}

private class GraphNodeWriterFactory(jobId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraphNodeWriter(jobId, partitionId, taskId)
}

private class GraphNodeWriter(jobId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]

  override def write(row: InternalRow): Unit =
    buf += ((row.getString(0), row.getString(1), row.getString(2)))

  // nothing visible until commit: the executor-side half of exactly-once
  override def commit(): WriterCommitMessage = {
    GraphNodeSink.staged.put((jobId, partitionId, taskId), buf.toVector)
    GraphNodeCommit(partitionId, taskId, buf.size)
  }

  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

private case class GraphNodeCommit(partitionId: Int, taskId: Long, rows: Long)
    extends WriterCommitMessage

/** JVM-local stand-in for the graph store (valid under local[*]; the port
  * seam a real driver would replace).
  */
object GraphNodeSink {
  val Schema: StructType = StructType.fromDDL("id STRING, label STRING, props STRING")

  // (jobId, partitionId, taskId) → rows staged by a writer attempt
  private[sinks] val staged =
    new ConcurrentHashMap[(String, Int, Long), Vector[(String, String, String)]]()
  // (jobId, partitionId) → rows visible after driver commit
  val store = new ConcurrentHashMap[(String, Int), Vector[(String, String, String)]]()
  val jobCommits = new ConcurrentHashMap[String, Long]()
  val aborts = new AtomicLong(0)

  def rowsFor(jobId: String): Seq[(String, String, String)] =
    store.asScala.collect { case ((j, _), rows) if j == jobId => rows }.toSeq.flatten

  def reset(): Unit = { staged.clear(); store.clear(); jobCommits.clear(); aborts.set(0) }
}
