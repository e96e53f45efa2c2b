package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Health states for a streaming query — the data-plane counterpart of the
  * reference's per-dependency health checkers
  * (cmd/dp-dimension-importer/main.go:227-282, 30 s cadence): instead of
  * polling dependencies, Spark pushes progress events, and "healthy" means
  * the query is running AND has reported progress recently.
  */
object Health {
  sealed trait Status
  case object Starting extends Status
  case object Ok extends Status
  case object Stopped extends Status
  final case class Failed(error: String) extends Status
}

/** Point-in-time health of one query. */
final case class QueryHealth(
    name: String,
    status: Health.Status,
    lastEventMs: Long,
    totalInputRows: Long,
    numProgressEvents: Long) {

  /** Healthy = running and not stale: last event within `staleAfterMs`.
    * A Starting query gets the same grace window from registration — a big
    * first batch must not flip a liveness endpoint red and crash-loop the
    * process before the first progress event can possibly arrive.
    */
  def healthy(nowMs: Long, staleAfterMs: Long): Boolean =
    (status == Health.Ok || status == Health.Starting) &&
      nowMs - lastEventMs <= staleAfterMs
}

/** A [[StreamingQueryListener]] that maintains a queryId → [[QueryHealth]]
  * map — register once per session (`spark.streams.addListener`) and poll
  * [[snapshot]] from a liveness endpoint. Thread-safe; events arrive on the
  * streaming listener bus.
  */
final class HealthMonitor extends StreamingQueryListener {
  private val state = new ConcurrentHashMap[UUID, QueryHealth]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    state.put(
      e.id,
      QueryHealth(Option(e.name).getOrElse(""), Health.Starting,
        System.currentTimeMillis(), 0L, 0L))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    state.compute(p.id, (_, old) => {
      val prev = Option(old)
        .getOrElse(QueryHealth(Option(p.name).getOrElse(""), Health.Starting, 0L, 0L, 0L))
      prev.copy(
        status = Health.Ok,
        lastEventMs = System.currentTimeMillis(),
        totalInputRows = prev.totalInputRows + p.numInputRows,
        numProgressEvents = prev.numProgressEvents + 1)
    })
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    state.compute(e.id, (_, old) => {
      val prev = Option(old).getOrElse(QueryHealth("", Health.Starting, 0L, 0L, 0L))
      val status = e.exception match {
        case Some(err) => Health.Failed(err)
        case None      => Health.Stopped
      }
      prev.copy(status = status, lastEventMs = System.currentTimeMillis())
    })

  def health(id: UUID): Option[QueryHealth] = Option(state.get(id))

  def snapshot: Map[UUID, QueryHealth] = {
    val b = Map.newBuilder[UUID, QueryHealth]
    state.forEach((k, v) => b += k -> v)
    b.result()
  }

  /** Overall liveness: every tracked query is either healthy or cleanly
    * stopped — a Failed or stale query flips the surface to unhealthy,
    * matching the reference's "any critical checker down → 500" semantics.
    */
  def allHealthy(staleAfterMs: Long, nowMs: Long = System.currentTimeMillis()): Boolean =
    snapshot.values.forall(h =>
      h.status == Health.Stopped || h.healthy(nowMs, staleAfterMs))
}

/** Graceful shutdown for streaming queries — the reference's SIGTERM path
  * (cmd/dp-dimension-importer/main.go:146-224): stop consuming, flush
  * in-flight work within a shutdown budget, then close.
  */
object Drain {

  /** Process everything already available within `budgetMs`, then stop the
    * query. Returns true when the drain finished inside the budget (clean
    * stop — all delivered data flushed to the sinks); false when the budget
    * expired and the query was stopped with work pending. Either way the
    * checkpoint + idempotent sinks make a later restart safe (asserted in
    * StreamingSpec).
    */
  def drain(query: StreamingQuery, budgetMs: Long): Boolean = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val flush = Future(query.processAllAvailable())
    try {
      Await.ready(flush, budgetMs.millis)
      // a future that FAILED inside the budget (sink threw mid-batch) is
      // not a clean drain — only a successfully completed flush counts
      flush.value.exists(_.isSuccess)
    } catch {
      case _: java.util.concurrent.TimeoutException => false
    } finally {
      // unconditionally, even if the Await was interrupted: leaving the
      // query running past the shutdown budget is the one unacceptable
      // outcome (also unblocks a still-running processAllAvailable)
      query.stop()
    }
  }
}
