package graft.sinks

import java.sql.{Connection, DriverManager}

import scala.jdk.CollectionConverters._

/** Backend seam for [[GraphNodeSinkProvider]] — the `store.Storer` port of
  * the reference (`store/store.go:14-25`): where committed node rows
  * actually land. Two-phase contract mirroring the DSv2 protocol:
  *
  *   - executor side: `stage` persists one ATTEMPT's buffered rows keyed by
  *     (jobId, partitionId, taskId) — durable but NOT visible;
  *     `abortAttempt` discards them;
  *   - driver side: `promote` atomically replaces the job's visible rows
  *     with exactly the committed attempts' staged rows (Spark guarantees
  *     one committed attempt per partition) and clears the job's staging;
  *     `abortJob` clears staging without touching visible rows.
  *
  * Implementations must be serializable with a no-state-or-config-only
  * constructor: the target object rides inside the serialized
  * [[org.apache.spark.sql.connector.write.DataWriterFactory]].
  */
trait GraphTarget extends Serializable {
  def init(): Unit
  def stage(jobId: String, partitionId: Int, taskId: Long,
      rows: Vector[(String, String, String)]): Unit
  def abortAttempt(jobId: String, partitionId: Int, taskId: Long): Unit
  def promote(jobId: String, attempts: Seq[(Int, Long)], totalRows: Long): Unit
  def abortJob(jobId: String): Unit
}

/** JVM-local store (valid under local[*]) — the default target and the
  * test observation point; see [[GraphNodeSink]] for the inspection API.
  */
class MemoryGraphTarget extends GraphTarget {
  override def init(): Unit = ()

  override def stage(jobId: String, partitionId: Int, taskId: Long,
      rows: Vector[(String, String, String)]): Unit =
    GraphNodeSink.staged.put((jobId, partitionId, taskId), rows): Unit

  override def abortAttempt(jobId: String, partitionId: Int, taskId: Long): Unit =
    GraphNodeSink.staged.remove((jobId, partitionId, taskId)): Unit

  override def promote(jobId: String, attempts: Seq[(Int, Long)], totalRows: Long): Unit = {
    GraphNodeSink.jobCommits.put(jobId, totalRows)
    // a re-run of the same jobId REPLACES its previous contents: sweep all
    // prior partitions first, or a rerun that commits fewer partitions
    // (AQE coalescing) would leave the old run's tail visible
    GraphNodeSink.store.keySet.asScala.filter(_._1 == jobId)
      .foreach(GraphNodeSink.store.remove)
    attempts.foreach { case (partitionId, taskId) =>
      val staged = GraphNodeSink.staged.remove((jobId, partitionId, taskId))
      if (staged != null) GraphNodeSink.store.put((jobId, partitionId), staged)
    }
    // drop leftovers from non-committed (speculative/failed) attempts
    abortJob(jobId)
  }

  override def abortJob(jobId: String): Unit =
    GraphNodeSink.staged.keySet.asScala.filter(_._1 == jobId)
      .foreach(GraphNodeSink.staged.remove)
}

/** JDBC-backed target — the live-write variant of the `store.Storer` seam
  * (a relational stand-in for the reference's Neptune/Neo4j driver; tests
  * run it against embedded Derby, production points `url` at a server so
  * driver and executors reach the same database).
  *
  * Exactly-once via the standard staging-table pattern: task `commit`
  * inserts the attempt's rows into `GRAFT_NODES_STAGING` in one
  * transaction; the driver's `promote` runs ONE transaction that replaces
  * the job's rows in `GRAFT_NODES` with the committed attempts'
  * staging rows — a reader never observes a partial job, and re-executed
  * or speculative attempts are never promoted.
  */
case class JdbcGraphTarget(url: String) extends GraphTarget {

  private def withConn[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** In one transaction; rolls back on any failure. */
  private def inTxn[A](f: Connection => A): A = withConn { conn =>
    conn.setAutoCommit(false)
    try { val r = f(conn); conn.commit(); r }
    catch { case e: Throwable => conn.rollback(); throw e }
  }

  override def init(): Unit = withConn { conn =>
    // existence check via DatabaseMetaData instead of catching a vendor
    // SQLState: Derby says X0Y32, PostgreSQL 42P07, MySQL 42S01 — the
    // metadata call is the portable spelling of CREATE TABLE IF NOT EXISTS
    def exists(tableName: String): Boolean = {
      val rs = conn.getMetaData.getTables(null, null, tableName, null)
      try rs.next() finally rs.close()
    }
    def createIdempotent(tableName: String, ddl: String): Unit =
      if (!exists(tableName)) {
        val st = conn.createStatement()
        try st.executeUpdate(ddl): Unit
        catch {
          // two concurrent first writes can still race the check; if the
          // table exists by the time we create, the goal is already met
          case e: java.sql.SQLException if exists(tableName) => ()
        } finally st.close()
      }
    createIdempotent(
      "GRAFT_NODES_STAGING",
      """CREATE TABLE GRAFT_NODES_STAGING (
        |  JOB_ID VARCHAR(256) NOT NULL,
        |  PART_ID INT NOT NULL,
        |  TASK_ID BIGINT NOT NULL,
        |  ID VARCHAR(1024) NOT NULL,
        |  LABEL VARCHAR(256) NOT NULL,
        |  PROPS VARCHAR(8192))""".stripMargin)
    createIdempotent(
      "GRAFT_NODES",
      """CREATE TABLE GRAFT_NODES (
        |  JOB_ID VARCHAR(256) NOT NULL,
        |  PART_ID INT NOT NULL,
        |  ID VARCHAR(1024) NOT NULL,
        |  LABEL VARCHAR(256) NOT NULL,
        |  PROPS VARCHAR(8192))""".stripMargin)
  }

  override def stage(jobId: String, partitionId: Int, taskId: Long,
      rows: Vector[(String, String, String)]): Unit = inTxn { conn =>
    val ps = conn.prepareStatement(
      "INSERT INTO GRAFT_NODES_STAGING (JOB_ID, PART_ID, TASK_ID, ID, LABEL, PROPS) " +
        "VALUES (?, ?, ?, ?, ?, ?)")
    try {
      rows.foreach { case (id, label, props) =>
        ps.setString(1, jobId); ps.setInt(2, partitionId); ps.setLong(3, taskId)
        ps.setString(4, id); ps.setString(5, label); ps.setString(6, props)
        ps.addBatch()
      }
      ps.executeBatch(): Unit
    } finally ps.close()
  }

  override def abortAttempt(jobId: String, partitionId: Int, taskId: Long): Unit =
    inTxn { conn =>
      val ps = conn.prepareStatement(
        "DELETE FROM GRAFT_NODES_STAGING WHERE JOB_ID = ? AND PART_ID = ? AND TASK_ID = ?")
      try { ps.setString(1, jobId); ps.setInt(2, partitionId); ps.setLong(3, taskId)
        ps.executeUpdate(): Unit
      } finally ps.close()
    }

  override def promote(jobId: String, attempts: Seq[(Int, Long)], totalRows: Long): Unit =
    inTxn { conn =>
      def exec(sql: String)(bind: java.sql.PreparedStatement => Unit): Unit = {
        val ps = conn.prepareStatement(sql)
        try { bind(ps); ps.executeUpdate(): Unit } finally ps.close()
      }
      // replace-the-job semantics, atomically with the promotion
      exec("DELETE FROM GRAFT_NODES WHERE JOB_ID = ?")(_.setString(1, jobId))
      attempts.foreach { case (partitionId, taskId) =>
        exec(
          "INSERT INTO GRAFT_NODES (JOB_ID, PART_ID, ID, LABEL, PROPS) " +
            "SELECT JOB_ID, PART_ID, ID, LABEL, PROPS FROM GRAFT_NODES_STAGING " +
            "WHERE JOB_ID = ? AND PART_ID = ? AND TASK_ID = ?") { ps =>
          ps.setString(1, jobId); ps.setInt(2, partitionId); ps.setLong(3, taskId)
        }
      }
      exec("DELETE FROM GRAFT_NODES_STAGING WHERE JOB_ID = ?")(_.setString(1, jobId))
    }

  override def abortJob(jobId: String): Unit = inTxn { conn =>
    val ps = conn.prepareStatement("DELETE FROM GRAFT_NODES_STAGING WHERE JOB_ID = ?")
    try { ps.setString(1, jobId); ps.executeUpdate(): Unit } finally ps.close()
  }
}
