package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Spark 4 arbitrary-state API (`transformWithState`): the successor to
    * `[flat]mapGroupsWithState` with MULTIPLE named, independently-typed,
    * independently-TTL'd state variables per key. Here: a ValueState
    * counter, a ValueState exact-integer total, and a bounded ListState
    * of recent values — three state shapes one old-API state object would
    * have to bundle and rewrite wholesale on every update; column-family-
    * backed variables update only what changed. Requires the RocksDB
    * state store provider (the production backend).
    */
  def userStats(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}

final case class UserSnapshot(user_id: Long, n: Long, total_e2: Long, recent_max_e2: Long)

final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
final case class SessionSummary(user_id: Long, n: Long, last_ts_ms: Long)
final case class SessionProgress(n: Long, lastTsMs: Long, timerMs: Long)

/** Event-time TIMERS via `transformWithState` — the capability neither
  * `flatMapGroupsWithState` timeouts nor `session_window` aggregation
  * expresses cleanly: a per-key timer registered at (last event time +
  * gap), re-armed on every arrival, firing `handleExpiredTimer` when the
  * WATERMARK passes it. The session summary is emitted by the timer — on
  * time progress, not on a later arrival for the key — so an idle user's
  * session closes even if that user never sends another event.
  */
class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, TimedEvent, SessionSummary] {

  @transient private var prog: ValueState[SessionProgress] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    prog = getHandle.getValueState[SessionProgress](
      "session", Encoders.product[SessionProgress], TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[TimedEvent], tv: TimerValues): Iterator[SessionSummary] = {
    val prev = if (prog.exists()) prog.get() else SessionProgress(0L, 0L, 0L)
    var n = prev.n
    var last = prev.lastTsMs
    rows.foreach { e =>
      n += 1
      if (e.ts.getTime > last) last = e.ts.getTime
    }
    if (prev.timerMs != 0L) getHandle.deleteTimer(prev.timerMs) // re-arm
    val timer = last + gapMs
    getHandle.registerTimer(timer)
    prog.update(SessionProgress(n, last, timer))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long, tv: TimerValues,
      info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionSummary] = {
    val p = prog.get()
    prog.clear()
    Iterator.single(SessionSummary(key, p.n, p.lastTsMs))
  }
}

object SessionTimeoutProcessor {
  /** Gap-closed sessions: input must carry a watermark on `ts` (event
    * time drives the timers). RocksDB provider required.
    */
  def sessions(events: org.apache.spark.sql.Dataset[TimedEvent], gapMs: Long)
      : org.apache.spark.sql.Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimeoutProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Per-user stats over three independent state variables; bounded recent
  * list ([[UserStatsProcessor.RecentKeep]] entries) keeps per-key state
  * O(1) however long the stream runs.
  */
class UserStatsProcessor extends StatefulProcessor[Long, UserEvent, UserSnapshot] {
  import UserStatsProcessor.RecentKeep

  @transient private var cnt: ValueState[Long] = _
  @transient private var total: ValueState[Long] = _
  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    total = getHandle.getValueState[Long]("total_e2", Encoders.scalaLong, TTLConfig.NONE)
    recent = getHandle.getListState[Long]("recent_e2", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[UserEvent], tv: TimerValues): Iterator[UserSnapshot] = {
    var n = if (cnt.exists()) cnt.get() else 0L
    var t = if (total.exists()) total.get() else 0L
    rows.foreach { e =>
      n += 1
      val e2 = math.floor(e.value * 100 + 0.5).toLong
      t += e2
      recent.appendValue(e2)
    }
    val all = recent.get().toArray
    val keep = all.takeRight(RecentKeep)
    if (keep.length != all.length) recent.put(keep)
    cnt.update(n)
    total.update(t)
    Iterator.single(UserSnapshot(key, n, t, if (keep.isEmpty) 0L else keep.max))
  }
}

object UserStatsProcessor {
  val RecentKeep = 5
}

final case class UserAlert(user_id: Long, level: Long, threshold_e2: Long)

final case class StreamDoc(doc_id: Long, text: String)
final case class GatedDoc(doc_id: Long, n_tokens: Long, quality_e4: Long)

/** Streaming ingest quality gate: the SAME column formulas as the batch
  * t1/t2/t20 path ([[graft.operators.TextAnalysis.nTokensCol]] /
  * `qualityE4Col`) applied per micro-batch — one definition of the gate,
  * two runtimes, bit-equality asserted in `StreamingSpec`. Stateless and
  * map-only, so it composes freely with the stateful dedup operators
  * (`dedupedWithinWatermark` for exact, [[StreamingDedup]] for fuzzy,
  * [[StreamingSegmentDedup]] for span-level) into the full streaming
  * counterpart of the batch training-selection query (t20).
  */
object StreamingGates {
  def qualityGate(
      docs: Dataset[StreamDoc],
      minQualityE4: Long = graft.operators.TrainingPrep.MinQualityE4,
      minTokens: Long = graft.operators.TrainingPrep.MinTokens,
      maxTokens: Long = graft.operators.TrainingPrep.MaxTokens): Dataset[GatedDoc] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    docs.toDF()
      .select(
        col("doc_id"),
        graft.operators.TextAnalysis.nTokensCol(col("text")).as("n_tokens"),
        graft.operators.TextAnalysis.qualityE4Col(col("text")).as("quality_e4"))
      .filter(col("quality_e4") >= minQualityE4 &&
        col("n_tokens").between(minTokens, maxTokens))
      .as[GatedDoc]
  }
}
final case class ChangeRecord(key: Long, seq: Long, is_delete: Boolean, value: String)
final case class ChangeWinner(seq: Long, isDelete: Boolean, value: String)

/** Per-key last-writer-wins state for [[StreamingChangelog]]: the current
  * winner (seq, tombstone flag, payload) — O(1) per key regardless of how
  * many times the entity was updated.
  */
class ChangelogProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, ChangeRecord, ChangeRecord] {

  @transient private var st: ValueState[ChangeWinner] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[ChangeWinner](
      "winner", Encoders.product[ChangeWinner], ttl)

  override def handleInputRows(
      key: Long, rows: Iterator[ChangeRecord], tv: TimerValues): Iterator[ChangeRecord] = {
    val prev = if (st.exists()) Some(st.get()) else None
    val best = rows.foldLeft(prev) { (acc, r) =>
      if (acc.forall(_.seq < r.seq)) Some(ChangeWinner(r.seq, r.is_delete, r.value))
      else acc
    }
    best match {
      case Some(w) if prev.forall(_.seq < w.seq) =>
        st.update(w)
        Iterator.single(ChangeRecord(key, w.seq, w.isDelete, w.value))
      case _ => Iterator.empty // batch brought only stale rows: no delta
    }
  }
}

/** Streaming counterpart of batch u3
  * ([[graft.operators.MergeOps.applyChangelog]]): continuous CDC
  * materialization — a change feed arrives in micro-batches, each key's
  * rows fold into the stored winner by max seq, and the new winner is
  * emitted ONLY when it changes (an Update-mode delta stream: exactly
  * what a downstream materialized view consumes). Tombstone rows flow
  * through flagged so the consumer can delete.
  *
  * Because max over seq is commutative and idempotent, the converged
  * state is ORDER-INDEPENDENT: any arrival order, any batching, any
  * replay converges to the batch u3 snapshot (asserted in
  * `StreamingSpec` with deliberately shuffled batches) — a stronger
  * replay property than the dedup judges' monotone-arrival
  * prefix-consistency, and the reason a CDC consumer at 100 TB can read
  * partitioned Kafka topics with no cross-partition ordering guarantee.
  */
object StreamingChangelog {
  def materialize(
      feed: Dataset[ChangeRecord],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[ChangeRecord] = {
    import feed.sparkSession.implicits._
    feed.groupByKey(_.key)
      .transformWithState(
        new ChangelogProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }
}

final case class SegArrival(h: String, doc_id: Long)
final case class SegDupDelta(doc_id: Long, dup_delta: Long)
final case class SegHashState(announced: Boolean, doc0: Long, cnt0: Long)

/** Streaming segment-level dedup state (the incremental d10 signal): keyed
  * by segment hash via `transformWithState`. State per hash is O(1) by
  * construction — (first doc, its occurrence count) until a SECOND
  * distinct document arrives, at which point both sides' duplicated
  * counts are announced and the state collapses to a flag; every later
  * arrival emits its delta directly. The per-doc duplicated-segment
  * fraction is then a running sum of deltas — cross-document frequency
  * WITHOUT corpus state (contrast `StreamingGates`' earlier waiver: the
  * full frequency map isn't needed, only the 0/1/2+ transition).
  */
class SegmentDupProcessor(ttl: TTLConfig)
    extends StatefulProcessor[String, SegArrival, SegDupDelta] {

  @transient private var st: ValueState[SegHashState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[SegHashState](
      "seg", Encoders.product[SegHashState], ttl)

  override def handleInputRows(
      key: String, rows: Iterator[SegArrival], tv: TimerValues): Iterator[SegDupDelta] = {
    // "no first doc yet" is signaled by cnt0 == 0, NOT a doc_id sentinel:
    // negative doc ids are legitimate in this system (t23 plants semantic
    // clones at doc_id - 1e6), so no id value is safe to reserve
    var s = if (st.exists()) st.get() else SegHashState(false, 0L, 0L)
    val out = List.newBuilder[SegDupDelta]
    rows.foreach { a =>
      if (s.announced) out += SegDupDelta(a.doc_id, 1L)
      else if (s.cnt0 == 0L || s.doc0 == a.doc_id)
        s = SegHashState(announced = false, a.doc_id, s.cnt0 + 1L)
      else { // second distinct doc: this hash is now a duplicated segment
        out += SegDupDelta(s.doc0, s.cnt0)
        out += SegDupDelta(a.doc_id, 1L)
        s = SegHashState(announced = true, 0L, 0L)
      }
    }
    st.update(s)
    out.result().iterator
  }
}

/** Streaming counterpart of batch d10 ([[graft.operators.Dedup
  * .duplicatedSegments]]): same token segmentation and md5 segment hash
  * (stateless, map-only), then [[SegmentDupProcessor]] per hash. Summing
  * `dup_delta` per doc over the whole stream equals the batch
  * `n_dup_segments` exactly — asserted bit-equal in `StreamingSpec` on a
  * replayed corpus with the near-copies arriving batches later.
  */
object StreamingSegmentDedup {

  /** (segment hash, doc_id) per segment OCCURRENCE — the batch `segs`
    * relation as a stateless streaming projection.
    */
  private[graft] def segArrivals(
      docs: Dataset[StreamDoc], segTokens: Int): Dataset[SegArrival] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, expr, md5, split}
    docs.toDF()
      .withColumn("toks", split(col("text"), " "))
      .filter(s"size(toks) >= $segTokens")
      .select(
        col("doc_id"),
        org.apache.spark.sql.functions.explode(expr(
          s"""transform(sequence(0, size(toks) div $segTokens - 1),
             |  j -> concat_ws(' ', slice(toks, j * $segTokens + 1, $segTokens)))""".stripMargin))
          .as("seg"))
      .select(md5(col("seg").cast("binary")).as("h"), col("doc_id"))
      .as[SegArrival]
  }

  /** Duplicated-segment-count deltas per document. `stateTtl` bounds the
    * per-hash key space on an unbounded stream (an idle hash not seen for
    * that long is forgotten, the watermark analogue); pass `None` for
    * bounded backfills/tests where exact parity with a batch pass over
    * the same corpus is required.
    */
  def dupDeltas(
      docs: Dataset[StreamDoc],
      segTokens: Int = graft.operators.Dedup.SegmentTokens,
      stateTtl: Option[java.time.Duration] = Some(java.time.Duration.ofMinutes(30)))
      : Dataset[SegDupDelta] = {
    import docs.sparkSession.implicits._
    val (ttlConf, timeMode) = stateTtl match {
      case Some(d) => (TTLConfig(d), TimeMode.ProcessingTime())
      case None    => (TTLConfig.NONE, TimeMode.None())
    }
    segArrivals(docs, segTokens)
      .groupByKey(_.h)
      .transformWithState(
        new SegmentDupProcessor(ttlConf), timeMode, OutputMode.Append())
  }
}

final case class NearDupHit(doc_id: Long, dup_of: Long, band: Int, est_e4: Long)
final case class BandArrival(band: Int, bkey: String, doc_id: Long, sig: Seq[Long])
final case class BucketState(docs: List[(Long, Seq[Long])])

/** Streaming NEAR-duplicate suppression — the fuzzy analogue of
  * `dedupedWithinWatermark`: MinHash signatures computed per row (no
  * shuffle — higher-order functions over the token array, same
  * [[graft.functions.PortableHash]] permutations as the batch d4
  * pipeline), LSH-banded so state is keyed by band bucket, and
  * `flatMapGroupsWithState` keeps the signatures seen per bucket so a
  * near-copy arriving ANY number of micro-batches later still collides.
  *
  * Scale shape: a doc costs `bands` state lookups on keys it hashes to —
  * state is partitioned by bucket across executors and each bucket holds
  * at most [[StreamingDedup.MaxBucketDocs]] signatures (hot buckets stop
  * absorbing, mirroring the batch pipeline's doc-frequency cap). The
  * signature-agreement estimate replaces the batch path's exact-Jaccard
  * verify: a stream cannot re-read earlier documents' shingle sets, so
  * near-dup decisions must come from the sketch alone — that is what
  * makes the signature the state, and why the sketch must be compact.
  */
object StreamingDedup {
  import graft.functions.PortableHash

  val NumPerms = 32
  val BandSize = 4
  val MaxBucketDocs = 64

  /** doc → (doc_id, sig array) with one projection: shingles, base
    * hashes, then the 32 permutation minima, all inside codegen HOFs.
    * Docs with fewer than 3 tokens have no shingles and are passed
    * through unexamined (no signature to compare), same as the batch
    * pipeline dropping them from the shingle index.
    */
  private[graft] def signed(docs: Dataset[StreamDoc]): Dataset[(Long, Seq[Long])] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.{array, col, expr, split}
    val shingled = docs.toDF()
      .withColumn("toks", split(col("text"), " "))
      .filter("size(toks) >= 3")
      .withColumn("xs", expr(
        s"""transform(
           |  array_distinct(transform(sequence(1, size(toks) - 2),
           |    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))),
           |  s -> cast(conv(substring(md5(cast(s AS binary)), 1, 15), 16, 10) AS bigint) % ${PortableHash.P}L)""".stripMargin))
    val sig = (0 until NumPerms).map(i =>
      expr(s"array_min(transform(xs, x -> (${PortableHash.permA(i)}L * x + ${PortableHash.permB(i)}L) % ${PortableHash.P}L))"))
    shingled.select(col("doc_id"), array(sig: _*).as("sig"))
      .as[(Long, Seq[Long])]
  }

  /** Near-duplicate detections: one row per (arriving doc, band) whose
    * bucket already held a signature agreeing on ≥ `threshold` of the
    * permutations. `dup_of` is the earliest matching doc in the bucket.
    * Downstream suppression = anti-join arrivals against distinct
    * doc_ids of this stream (per micro-batch, e.g. in foreachBatch).
    *
    * State is bounded on BOTH axes: [[MaxBucketDocs]] caps one bucket,
    * and `stateTtl` (default 30 min) expires idle buckets via a
    * processing-time timeout — a bucket nothing has hashed into for that
    * long is dropped, the same role the watermark plays for
    * [[StatefulOps.dedupedWithinWatermark]]. Without the TTL the key
    * SPACE (every band bucket ever seen) grows linearly with a
    * mostly-unique stream; pass `None` only for bounded backfills — or
    * tests, where it ALSO matters that `processAllAvailable` never goes
    * idle under pending processing-time timers (the engine keeps
    * scheduling timeout-check batches by design).
    */
  def nearDupHits(
      docs: Dataset[StreamDoc], threshold: Double = 0.5,
      stateTtl: Option[java.time.Duration] = Some(java.time.Duration.ofMinutes(30)))
      : Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val ttlMs = stateTtl.map(_.toMillis)
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val arrivals = signed(docs).flatMap { case (id, sig) =>
      (0 until NumPerms / BandSize).map { b =>
        val key = (0 until BandSize).map(r => sig(b * BandSize + r)).mkString(",")
        BandArrival(b, key, id, sig)
      }
    }
    arrivals
      .groupByKey(a => (a.band, a.bkey))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append, timeoutConf) {
        (_: (Int, String), batch: Iterator[BandArrival], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(BucketState(Nil)).docs
            val out = List.newBuilder[NearDupHit]
            // doc_id order makes replay deterministic however the source
            // chunks a backlog into batches
            batch.toSeq.sortBy(_.doc_id).foreach { a =>
              val hit = seen.reverseIterator // earliest first (list is LIFO)
                .map { case (sid, ssig) =>
                  val agree = ssig.iterator.zip(a.sig.iterator).count { case (x, y) => x == y }
                  (sid, agree.toDouble / NumPerms)
                }
                .find(_._2 >= threshold)
              hit.foreach { case (sid, est) =>
                out += NearDupHit(a.doc_id, sid, a.band,
                  math.floor(est * 10000.0 + 0.5).toLong)
              }
              if (seen.size < MaxBucketDocs) seen = (a.doc_id, a.sig) :: seen
            }
            state.update(BucketState(seen))
            ttlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}

final case class FunnelEvent(user_id: Long, event_type: String, sec: Long)
final case class FunnelState(signup: Long, click: Long, purchase: Long)
final case class FunnelRow(
    user_id: Long, signup_sec: Long,
    click_sec: Option[Long], purchase_sec: Option[Long], stage: Int)

/** Per-user funnel state machine — the at-arrival w8: O(1) state per user
  * (the three stage timestamps, -1 = unreached), advanced per event. Under
  * EVENT-TIME-ORDERED arrival (the stream's documented precondition, the
  * w9/dedup analog of monotone doc_id) this reproduces the batch funnel's
  * conditional-min semantics exactly: the first signup in time order IS
  * min(signup), the first qualifying click IS the min click inside the hop
  * window, and so on — every batch rule is a strict inequality, so
  * same-second ties cannot reorder outcomes. Rows within a micro-batch are
  * sorted by sec before folding, so intra-batch disorder is free; CROSS-
  * batch disorder is out of contract (an earlier-signup arrival could
  * widen a window already judged — that correction belongs to a batch
  * re-run, the same split as the gate's cut()).
  *
  * Scale: unlike a per-user ordered window over the event log, a power
  * user costs 12 bytes of state and O(events) streaming fold — never a
  * one-task sort. Emission is Update-mode: a row only when the stage
  * advances, so downstream sees a delta stream of funnel progress.
  */
class FunnelProcessor(hopSec: Long)
    extends StatefulProcessor[Long, FunnelEvent, FunnelRow] {

  @transient private var st: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelState](
      "funnel", Encoders.product[FunnelState], TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[FunnelEvent], tv: TimerValues): Iterator[FunnelRow] = {
    val before = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
    var s = before
    rows.toSeq.sortBy(_.sec).foreach { r =>
      r.event_type match {
        case "signup" if s.signup < 0 =>
          s = s.copy(signup = r.sec)
        case "click" if s.signup >= 0 && s.click < 0 &&
            r.sec > s.signup && r.sec <= s.signup + hopSec =>
          s = s.copy(click = r.sec)
        case "purchase" if s.click >= 0 && s.purchase < 0 &&
            r.sec > s.click && r.sec <= s.click + hopSec =>
          s = s.copy(purchase = r.sec)
        case _ => // stage already filled, out of window, or not a stage event
      }
    }
    if (s == before) Iterator.empty
    else {
      st.update(s)
      val stage = 1 + (if (s.click >= 0) 1 else 0) + (if (s.purchase >= 0) 1 else 0)
      Iterator.single(FunnelRow(
        key, s.signup,
        if (s.click >= 0) Some(s.click) else None,
        if (s.purchase >= 0) Some(s.purchase) else None,
        stage))
    }
  }
}

/** The streaming w8. `events` is the (user_id, event_type, sec) feed;
  * each emitted row is the user's funnel snapshot at that moment (stage
  * strictly advances per emission, so "latest row per user" is the
  * converged funnel — StreamingSpec pins it equal to the batch
  * [[graft.operators.RelationalOps.signupFunnel]] frame).
  */
object StreamingFunnel {
  def funnel(
      events: Dataset[FunnelEvent],
      hopSec: Long = graft.operators.RelationalOps.FunnelHopSec): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(hopSec), TimeMode.None(), OutputMode.Update())
  }
}
