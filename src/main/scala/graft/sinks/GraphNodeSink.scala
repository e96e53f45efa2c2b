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
  * Where committed rows land is the [[GraphTarget]] seam (the reference's
  * `store.Storer` port): `target=memory` (default) is a JVM-local store,
  * `target=jdbc` with `url=jdbc:...` stages and promotes through a
  * relational database (embedded Derby in tests, a server in production).
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
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val target = opts.getOrDefault("target", "memory") match {
      case "memory" => new MemoryGraphTarget
      case "jdbc" =>
        val url = opts.get("url")
        require(url != null, "target=jdbc requires a url option")
        JdbcGraphTarget(url)
      case other => throw new IllegalArgumentException(
        s"unknown graph sink target '$other' (memory | jdbc)")
    }
    new GraphNodeSinkTable(target)
  }
  override def supportsExternalMetadata(): Boolean = true
}

private class GraphNodeSinkTable(target: GraphTarget) extends Table with SupportsWrite {
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
        override def toBatch: BatchWrite = new GraphNodeBatchWrite(jobId, target)
      }
    }
  }
}

private class GraphNodeBatchWrite(jobId: String, target: GraphTarget) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side, before any task runs: tables/state ready for staging
    target.init()
    new GraphNodeWriterFactory(jobId, target)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.map { case m: GraphNodeCommit => m }
    // Spark guarantees exactly one committed attempt per partition; the
    // target atomically replaces the job's visible rows with exactly
    // these attempts' staged rows
    target.promote(jobId, commits.map(m => (m.partitionId, m.taskId)).toSeq,
      commits.map(_.rows).sum)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    target.abortJob(jobId)
    GraphNodeSink.aborts.incrementAndGet(): Unit
  }
}

private class GraphNodeWriterFactory(jobId: String, target: GraphTarget)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraphNodeWriter(jobId, partitionId, taskId, target)
}

private class GraphNodeWriter(
    jobId: String, partitionId: Int, taskId: Long, target: GraphTarget)
    extends DataWriter[InternalRow] {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]

  override def write(row: InternalRow): Unit =
    buf += ((row.getString(0), row.getString(1), row.getString(2)))

  // nothing visible until commit: the executor-side half of exactly-once
  override def commit(): WriterCommitMessage = {
    target.stage(jobId, partitionId, taskId, buf.toVector)
    GraphNodeCommit(partitionId, taskId, buf.size)
  }

  override def abort(): Unit = {
    buf.clear()
    target.abortAttempt(jobId, partitionId, taskId)
  }
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
