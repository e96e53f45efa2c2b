package graft.sinks

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{ceil, col, count, lit}

/** Batched PATCH sink (reference S10/O1, `client/dimensions_api.go:100-105`
  * + `handler/incoming_instance_handler.go:269-279`): the reference sends
  * ONE PATCH per batch of option updates "so that the mongodb lock will be
  * acquired only once per batch" (~40 ms/lock).
  *
  * Spark parity: partition ≡ batch. Updates are repartitioned so each
  * partition holds ≈ batchSize rows, then `foreachPartition` issues exactly
  * one client call per partition. The client is a port (same seam as the
  * reference's mocked `IClient`); production would hold an HTTP connection
  * pool per executor, initialized once per partition.
  */
object BatchedPatchSink {

  /** HTTP If-Match wildcard — matches any entity version (the reference
    * always passes this, `headers.IfMatchAnyETag`, so its PATCHes never
    * conflict; the token surface still exists for callers that do care).
    */
  val EtagAny = "*"

  /** The conditional-update token mismatched (HTTP 412): the entity was
    * modified since the caller read the ETag it passed as If-Match.
    */
  class PreconditionFailedException(msg: String) extends RuntimeException(msg)

  /** One PATCH call: all updates of one partition, guarded by an If-Match
    * precondition, returning the entity's NEW ETag (reference
    * `PatchInstanceDimensions` returns the post-update etag). Throw
    * [[PreconditionFailedException]] on a token mismatch. Implementations
    * must be Serializable — they ship to executors.
    */
  trait PatchClient extends Serializable {
    def patch(updates: Seq[Row], ifMatch: String): String
  }

  /** Test/default client: counts calls and rows via accumulator-free
    * JVM-local atomics (valid under local[*]; a cluster impl would use
    * Spark accumulators or real HTTP side effects). Accepts any If-Match.
    */
  class RecordingClient extends PatchClient {
    def patch(updates: Seq[Row], ifMatch: String): String = {
      val n = RecordingClient.calls.incrementAndGet()
      RecordingClient.rows.addAndGet(updates.size)
      RecordingClient.maxBatch.getAndUpdate(m => math.max(m, updates.size))
      s"rec-$n"
    }
  }
  object RecordingClient {
    val calls = new AtomicLong(0)
    val rows = new AtomicLong(0)
    val maxBatch = new AtomicLong(0)
    def reset(): Unit = { calls.set(0); rows.set(0); maxBatch.set(0) }
  }

  /** Optimistic-concurrency client: tracks the entity version, rejects a
    * stale If-Match with 412 semantics, bumps and returns the ETag on
    * success — the behavior a real Dataset API exhibits behind the
    * reference's always-wildcard calls.
    */
  class VersionedClient extends PatchClient {
    def patch(updates: Seq[Row], ifMatch: String): String = {
      val next = VersionedClient.version.updateAndGet { v =>
        if (ifMatch != EtagAny && ifMatch != s"v$v")
          throw new PreconditionFailedException(
            s"If-Match $ifMatch does not match current etag v$v")
        v + 1
      }
      s"v$next"
    }
  }
  object VersionedClient {
    val version = new AtomicLong(0)
    def reset(): Unit = version.set(0)
  }

  /** Write `updates` through the client, one call per ≈batchSize rows —
    * the minimal-call-count path (the reference's reason for batching is
    * one store lock per call). The sizing count and the send share one
    * materialization: the frame is persisted across the two passes instead
    * of recomputing its (possibly expensive) lineage.
    *
    * `ifMatch` is forwarded to every call. A SPECIFIC etag is only sound
    * when the write fits one batch (the first successful call bumps the
    * entity version, so later batches would 412) — multi-batch writes
    * should pass [[EtagAny]], which is also what the reference always does.
    */
  def write(
      updates: DataFrame, batchSize: Int, client: PatchClient,
      ifMatch: String = EtagAny): Int = {
    // persist only if the caller hasn't — unpersisting a caller-owned
    // cache would evict state they still need (persist isn't refcounted)
    val ownCache = updates.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownCache) updates.persist()
    try {
      val n = updates.count()
      val numParts = math.max(1, math.ceil(n.toDouble / batchSize).toInt)
      updates.repartition(numParts).foreachPartition { (rows: Iterator[Row]) =>
        val batch = rows.toSeq
        if (batch.nonEmpty) { client.patch(batch, ifMatch); () }
      }
      numParts
    } finally { if (ownCache) { updates.unpersist(); () } }
  }

  /** Shuffle-free variant: chunk each existing partition into ≤ batchSize
    * calls locally. No count, no exchange, single pass — the 100 TB default
    * when the per-call overhead is small; trades a few extra calls (≤ one
    * underfull call per input partition) for never moving the data.
    */
  def writeLocal(
      updates: DataFrame, batchSize: Int, client: PatchClient,
      ifMatch: String = EtagAny): Unit =
    updates.foreachPartition { (rows: Iterator[Row]) =>
      // grouped() never yields an empty batch
      rows.grouped(batchSize).foreach { batch => client.patch(batch, ifMatch); () }
    }
}
