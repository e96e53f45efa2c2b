package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class UserEvent(user_id: Long, event_type: String, value: Double)
final case class UserRunningState(n: Long, total: Double)
final case class UserRunning(user_id: Long, n: Long, total: Double)

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState`
  * (the reference needs no cross-event state beyond the graph DB — SURVEY
  * §2.6 ST3 — but a complete streaming engine does): a per-user running
  * count/total that survives across micro-batches in the state store.
  *
  * At scale: state is partitioned by key across executors, checkpointed
  * with the query; a timeout (here NoTimeout; production: event-time
  * timeout + watermark) bounds state growth.
  */
object StatefulOps {

  def runningPerUser(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningState, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunningState(n, total)
          state.update(next)
          UserRunning(uid, n, math.rint(total * 100) / 100)
      }
  }

  private val AlertStep = 100.0

  /** Threshold alerts via `flatMapGroupsWithState`: one output row per
    * 100-unit level a user's running total crosses in a batch — zero, one,
    * or many rows per group per batch, the output shape
    * `mapGroupsWithState` (exactly one row) cannot express. State is the
    * same running aggregate; levels already announced are never re-emitted
    * across batches. Output carries only batch-boundary-INVARIANT fields
    * (the level and its threshold): stamping a "current total" would make
    * the row depend on how the backlog was chunked into micro-batches and
    * break sink idempotency across restarts.
    */
  def thresholdAlerts(events: Dataset[UserEvent]): Dataset[UserAlert] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunningState, UserAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          val levelBefore = math.floor(prev.total / AlertStep).toLong
          batch.foreach { e => n += 1; total += e.value }
          state.update(UserRunningState(n, total))
          val levelAfter = math.floor(total / AlertStep).toLong
          ((levelBefore + 1) to levelAfter).iterator
            .map(l => UserAlert(uid, l, math.floor(l * AlertStep * 100 + 0.5).toLong))
      }
  }

  /** Streaming exact dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps one state entry per key only
    * until the watermark passes the key's event time, unlike a plain
    * streaming `dropDuplicates` whose state grows forever. This is the
    * 100 TB-stream form of ST1 idempotency — the cross-batch anti-join in
    * ImporterStream dedups against a *persisted* table; this dedups
    * in-flight arrivals (at-least-once sources redeliver within seconds,
    * so a short watermark bounds state tightly).
    */
  def dedupedWithinWatermark[T](
      events: Dataset[T], tsCol: String, delay: String, keys: String*): Dataset[T] =
    events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}

final case class UserAlert(user_id: Long, level: Long, threshold_e2: Long)
