package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.sinks.{H2Config, H2Sink}

/** Event row for typed stateful operators. */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** Per-user session state for flatMapGroupsWithState. */
final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming capability surface (SURVEY.md §2.3 streaming rows).
  *
  * Each transform is a pure Dataset→Dataset function so the same logic runs
  * against `readStream` file/kafka sources in production and MemoryStream
  * in tests. Scale posture: watermarks bound state, aggregations are keyed
  * by (window, type) or user_id so state distributes across executors; at
  * 100 TB/day you'd back this with the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`) — flagged here rather
  * than hardcoded since local tests use the default provider.
  */
object Streams {

  /** Tumbling-window counts with a 10-minute watermark for late data. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding windows: 1 hour window every 15 minutes. */
  def slidingValueSums(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("user_id"))
      .agg(sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("user_id"), col("total_value"))

  /** Session windows with a data-driven gap. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n"))

  /** Streaming dedup bounded by watermark (state is GC'd past it). */
  def dedupByEventId(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Running per-user totals as a plain streaming aggregation — the
    * canonical restart-recovery shape: the sum/count state lives in the
    * state store, so a query restarted from its checkpoint resumes the
    * totals (and the source offsets) exactly where the previous process
    * stopped. Exercised end-to-end across a stop/restart in StreamsSpec. */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Arbitrary stateful aggregation: running per-user totals via
    * flatMapGroupsWithState (update mode, processing-time timeout off). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          batch.foreach { e => n += 1; tot += e.value }
          val next = UserAgg(uid, n, tot)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Closed session emitted ON EVENT-TIME TIMEOUT — the state-machine
    * pattern behind every custom sessionizer: events accumulate into an
    * open per-user session, each batch re-arms a timeout at
    * `last_event + gap`, and the session is emitted when the WATERMARK
    * (not wall clock) passes that deadline — i.e. when no in-order event
    * could still extend it. Gap semantics hold in the DATA path too: a
    * batch whose (sorted) events jump more than the gap past the open
    * session closes it immediately and opens a new one, so a backfill
    * that delivers a user's whole history in one batch still emits one
    * session per gap, not one giant blob. An out-of-order event landing
    * inside the open session (late but within watermark) extends its
    * bounds on BOTH sides. Complements the declarative [[sessionCounts]]:
    * use this form when closing a session must run arbitrary logic.
    * Append-mode output; state removed on timeout-emit, so steady-state
    * size is one open session per active user. */
  final case class OpenSession(user_id: Long, n_events: Long,
                               start_ms: Long, last_ms: Long)

  def sessionsClosedByTimeout(events: Dataset[Event],
                              gapMs: Long = 30L * 60 * 1000): Dataset[OpenSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, OpenSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            var closed = List.empty[OpenSession]
            var cur = state.getOption
            for (t <- batch.map(_.ts.getTime).toSeq.sorted) {
              cur = cur match {
                case Some(s) if t > s.last_ms + gapMs =>
                  closed ::= s // gap inside the batch: close now, open anew
                  Some(OpenSession(uid, 1L, t, t))
                case Some(s) =>
                  Some(OpenSession(uid, s.n_events + 1L,
                    math.min(s.start_ms, t), math.max(s.last_ms, t)))
                case None =>
                  Some(OpenSession(uid, 1L, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // A replayed/stale session's deadline may already be behind
              // the watermark; Spark rejects such a timestamp, so clamp
              // just past it (fires on the next batch).
              state.setTimeoutTimestamp(
                math.max(s.last_ms + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Per-user running totals on the Spark 4 `transformWithState` API —
    * the successor to flatMapGroupsWithState: typed per-key `ValueState`
    * with first-class TTL, timers, and multiple state variables, backed
    * by the RocksDB state store (required by this API; at 100 TB/day
    * RocksDB is the right store anyway — state spills off-heap instead
    * of living in executor heap). */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Event, UserAgg] {
    @transient private var agg: ValueState[UserAgg] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserAgg] = {
      val prev = Option(agg.get()).getOrElse(UserAgg(key, 0L, 0.0))
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserAgg(key, n, tot)
      agg.update(next)
      Iterator.single(next)
    }
  }

  /** Running totals via transformWithState (requires the RocksDB state
    * store provider — see [[RunningTotalsProcessor]]). */
  def runningUserTotalsTws(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-stream interval join: each click joins views of the same user
    * within the preceding 15 minutes. Both sides carry watermarks so Spark
    * can bound join state: a view's row is droppable once the click-side
    * watermark passes view_ts + 15 min, which is what makes this runnable
    * indefinitely at scale (unbounded joins would accumulate state
    * forever). State is keyed by user_id and distributes across executors. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    c.join(v, expr(
      """c_user = v_user AND
        |view_ts >= click_ts - INTERVAL 15 MINUTES AND
        |view_ts <= click_ts""".stripMargin))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[clickViewJoin]] but a
    * click with no qualifying view must still be emitted — with nulls —
    * once it CAN no longer match. That "once" is the hard part outer
    * streaming joins exist to solve: the engine holds the unmatched click
    * in state until the view-side watermark passes the end of its match
    * interval, and only then emits the null-completed row (emitting
    * earlier could be contradicted by a late view). Same watermark-bounded
    * state posture as the inner form — droppable state, keyed by user,
    * runnable indefinitely. */
  def clickViewJoinLeftOuter(clicks: DataFrame, views: DataFrame): DataFrame =
    clickViewJoinOuter(clicks, views, "left_outer")

  /** Full outer adds the symmetric half: a view no click ever claims is
    * itself emitted null-completed once the click-side watermark passes
    * the last instant a qualifying click could exist (view_ts + 15 min).
    * The interval condition bounds BOTH sides, which is what makes outer
    * stream-stream joins plannable with droppable state at all. */
  def clickViewJoinOuter(clicks: DataFrame, views: DataFrame,
                         joinType: String): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    c.join(v, expr(
      """c_user = v_user AND
        |view_ts >= click_ts - INTERVAL 15 MINUTES AND
        |view_ts <= click_ts""".stripMargin), joinType)
      .select(col("click_id"), col("view_id"),
        coalesce(col("c_user"), col("v_user")).as("user_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Stream-static enrichment join: each streaming event picks up its
    * user's dimension row. The static side is a plain batch DataFrame —
    * re-read per micro-batch (so slowly-changing dimension updates are
    * picked up between triggers) and broadcast when it fits, which is the
    * right plan: the unbounded side never shuffles and carries no join
    * state (unlike stream-stream joins, nothing needs a watermark — the
    * static side is complete by definition). Left join keeps events whose
    * user is not in the dimension (dim_name null), the usual contract for
    * late-arriving dimension rows.
    *
    * Deliberately NO broadcast hint: a forced hint disables the size
    * check (the Tables.scala supplierDim hazard — a dimension that grows
    * past the 8 GB broadcast hard limit would then kill every
    * micro-batch), while un-hinted the planner broadcasts while the dim
    * fits and degrades to a shuffled join when it doesn't. */
  def enrichWithDim(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"), "left")

  /** Streaming top-k per user via the native [[graft.functions.TopKPairs]]
    * aggregate (`graft_topk`): the raw-binary buffer is exactly what the
    * streaming state store persists between microbatches, so the same
    * bounded-heap state that partial-merges map-side in batch also
    * incrementally merges across triggers — no re-aggregation of history. */
  def topEventsPerUser(events: DataFrame, k: Int): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(call_function("graft_topk", col("value"), col("event_id"), lit(k)).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("user_id"), (col("pos") + 1).cast("long").as("rk"),
        col("p.payload").as("event_id"), col("p.score").as("value"))

  /** Streaming heavy hitters per event kind via the native
    * [[graft.functions.FrequentItems]] Misra–Gries aggregate: like
    * [[topEventsPerUser]], the raw-binary sketch buffer is exactly what
    * the state store persists, so the bounded counter map merges
    * incrementally across triggers — per-key state stays ≤ cap entries
    * no matter how many distinct users flow through the stream. */
  def frequentUsersPerKind(events: DataFrame, cap: Int): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(call_function("graft_freq_items", col("user_id"), lit(cap)).as("sketch"))
      .select(col("event_type"), explode(col("sketch")).as("c"))
      .select(col("event_type"), col("c.item").as("user_id"), col("c.lb").as("lb"))

  /** Continuous push to H2 — the streaming analog of the reference's one
    * sink. Idempotent via [[H2Sink.writeBatch]]: each micro-batch loads
    * into a batchId-tagged staging table, then swaps it in with
    * DROP + RENAME, so a re-delivered batch rebuilds the identical target
    * and a crash mid-load never leaves a partial target visible. */
  def writeToH2[T](stream: Dataset[T], table: String, config: H2Config): DataStreamWriter[T] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[T], batchId: Long) =>
        H2Sink.writeBatch(batch.toDF(), table, batchId, config)
        ()
      }
}
