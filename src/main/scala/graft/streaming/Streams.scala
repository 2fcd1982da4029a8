package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}
import java.sql.Timestamp

/** Structured Streaming operators (SURVEY.md §2.4 ◻ rows). Each transform
  * takes a DataFrame so the SAME code runs over `spark.readStream` sources
  * and over `MemoryStream` in tests; the batch twins in
  * `graft.operators.EventTime` are the oracle-checkable versions of the
  * windowed aggregations.
  *
  * Scale: state stores are keyed by (window/event_id/user) and bounded by
  * the watermark — late state is evicted, so executor memory is
  * O(active keys), not O(stream history).
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** A document arriving on an ingest stream (curationChain input row). */
  final case class DocEvent(doc_id: Long, ts: Timestamp, source: String,
      text: String)

  final case class UserRunning(user_id: Long, n_events: Long, total: Double)

  /** Tumbling-window counts with a watermark: events later than 10 minutes
    * behind the max seen ts are dropped (append output emits only closed
    * windows). */
  def tumblingWithWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Q.dec4(sum(graft.Q.dec2(col("value")))).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Stateful dedup on event_id, bounded in time by the watermark
    * (built-in `dropDuplicatesWithinWatermark`, Spark ≥3.5). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Spark 4 `transformWithState` (state API v2, RocksDB-backed): per-user
    * running max value with typed ValueState. The modern replacement for
    * flatMapGroupsWithState — composable named state, timers, TTL. */
  class RunningMaxProcessor extends StatefulProcessor[Long, Event, UserRunning] {
    @transient private var maxSeen: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxSeen = getHandle.getValueState[Double](
        "maxSeen", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserRunning] = {
      var mx = if (maxSeen.exists()) maxSeen.get() else Double.MinValue
      var n = 0L
      rows.foreach { e => n += 1; if (e.value > mx) mx = e.value }
      maxSeen.update(mx)
      Iterator(UserRunning(key, n, mx))
    }
  }

  def runningMaxPerUser(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningMaxProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** One pre-centified event row (the `q_stream_stateful` input: the
    * double→DECIMAL(12,2)→cents conversion happens in the DataFrame layer
    * so the engines' cast semantics — not JVM double formatting — decide
    * rounding). */
  final case class ECents(event_id: Long, user_id: Long, cents: Long)

  /** Per-user cumulative state snapshot emitted once per micro-batch. All
    * fields are ORDER-INDEPENDENT reductions (count, sum, min, max), so the
    * per-user FINAL emission — the one with the largest n_events — is
    * deterministic no matter how the file source batches rows. */
  final case class UserCum(user_id: Long, n_events: Long, cents: Long,
      min_id: Long, max_id: Long)

  /** `transformWithState` (state API v2) with a product-typed ValueState:
    * per-user cumulative (count, cents, min/max event id), the RUNNING
    * value re-emitted after every batch that touches the user. The keyed
    * batch query reads back `max_by(·, n_events)` — monotone n_events makes
    * that the final state — so the whole streaming run is oracle-checkable
    * by a plain GROUP BY while the state machinery (RocksDB store, batch
    * boundaries, key exchange) runs for real. */
  class CumulativeProcessor extends StatefulProcessor[Long, ECents, UserCum] {
    @transient private var cum: ValueState[UserCum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[UserCum](
        "cum", Encoders.product[UserCum], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ECents],
        timerValues: TimerValues): Iterator[UserCum] = {
      var c = if (cum.exists()) cum.get()
        else UserCum(key, 0L, 0L, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        c = UserCum(key, c.n_events + 1, c.cents + e.cents,
          math.min(c.min_id, e.event_id), math.max(c.max_id, e.event_id))
      }
      cum.update(c)
      Iterator(c)
    }
  }

  def cumulativePerUser(events: Dataset[ECents]): Dataset[UserCum] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new CumulativeProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Running per-user state for the timer close-out processor. */
  final case class SessAcc(n: Long, max_ts: Long)

  /** A per-user close-out record emitted by an EVENT-TIME TIMER firing. */
  final case class SessionClose(user_id: Long, n_events: Long,
      closed_at: Timestamp)

  /** EVENT-TIME TIMERS through the state API v2 (the capability beyond
    * CumulativeProcessor's plain ValueState): each input batch refreshes
    * the user's running count and RE-ARMS a single timer at
    * (latest activity + gapMs); when the eviction watermark passes the
    * timer (fires iff timer ≤ watermark — TimerStateImpl's expiry
    * iterator stops at the first timer > threshold), handleExpiredTimer
    * emits the close-out record and clears state, so a later row would
    * start a fresh session. This is the inactivity-timeout pattern
    * flatMapGroupsWithState spelled with GroupStateTimeout.EventTimeTimeout
    * — here with composable named state + explicit timer registration. */
  class TimerCloseProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionClose] {
    @transient private var acc: ValueState[SessAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[SessAcc](
        "acc", Encoders.product[SessAcc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionClose] = {
      var a = if (acc.exists()) acc.get() else SessAcc(0L, Long.MinValue)
      rows.foreach(e => a = SessAcc(a.n + 1, math.max(a.max_ts, e.ts.getTime)))
      // one live timer per user: re-arm at the latest activity + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(a.max_ts + gapMs)
      acc.update(a)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
      val a = acc.get()
      acc.clear()
      Iterator(SessionClose(key, a.n,
        new Timestamp(expiredTimerInfo.getExpiryTimeInMs)))
    }
  }

  /** Per-user inactivity close-out driven by event-time timers. */
  def timerClose(events: Dataset[Event], gapMs: Long = 30 * 60000L,
      watermark: String = "10 minutes"): Dataset[SessionClose] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TimerCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream join with event-time bounds: each signup joins
    * purchases of the same user within `within` AFTER the signup. Both
    * sides carry watermarks so the join state is evicted once the bound
    * passes — state is O(in-flight interval), not O(stream).
    *
    * `joinType = "left_outer"` adds the conversion-funnel "never
    * purchased" rows: a signup with no in-window purchase is emitted
    * null-extended — but only once the watermark has passed its join
    * bound (the engine must KNOW no match can still arrive before it
    * may emit the non-match; until then the row sits in state). The
    * event-time bound on the stream side of the condition is what makes
    * outer emission possible at all — an unbounded outer stream-stream
    * join would have to hold every row forever.
    *
    * `"right_outer"` / `"full_outer"` (r10 verdict ask #3) add the
    * mirror-image rows: a purchase with no in-window signup null-extends
    * once the watermark passes ITS bound — a future signup must satisfy
    * signup_ts <= purchase_ts, so the purchase is provably unmatched as
    * soon as the watermark passes purchase_ts (vs signup_ts + within on
    * the left side: the two sides' eviction bounds are asymmetric because
    * the interval is one-directional). user_id is coalesced across the
    * two key columns so every outer row still carries its user. */
  def signupToPurchase(signups: DataFrame, purchases: DataFrame,
      within: String = "1 hour", joinType: String = "inner"): DataFrame = {
    val sg = signups.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("signup_id"), col("user_id"), col("ts").as("signup_ts"))
    val pu = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    sg.join(pu,
      col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("signup_ts") &&
      col("purchase_ts") <= col("signup_ts") + expr(s"INTERVAL $within"),
      joinType)
      .select(col("signup_id"), col("purchase_id"),
        coalesce(col("user_id"), col("p_user")).as("user_id"),
        col("signup_ts"), col("purchase_ts"))
  }

  /** Session-window aggregation under a watermark: per-user sessions
    * close after `gap` of inactivity; in append mode a session row is
    * emitted once the watermark passes its end (merging state is keyed
    * by (user, session) and evicted then — state is O(open sessions),
    * not O(stream)). The SAME code path runs batch-side as
    * q_stream_session_agg (EliminateEventTimeWatermark drops the
    * watermark node on a non-streaming child), giving the §2.4
    * watermark+session capability its DuckDB oracle; StreamingSpec
    * additionally asserts MemoryStream output equals the batch output
    * on the same rows. */
  def sessionAgg(events: DataFrame, gap: String = "20 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"),
        graft.Q.dec4(sum(graft.Q.dec2(col("value")))).as("total"),
        max(col("event_type")).as("last_type"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n"), col("total"), col("last_type"))

  /** Stream-static enrichment: the static side is a broadcast dimension —
    * re-read per micro-batch, never shuffled against the stream. */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left")

  /** The production sink pattern: `foreachBatch` gives each micro-batch a
    * batch DataFrame + id, enabling arbitrary batch sinks (upsert targets,
    * multi-table writes) with exactly-once via idempotent batch ids. */
  def writeBatches(df: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch_$id")
    }

  /** End-to-end streaming curation: the ingest shape of a training-data
    * pipeline run as micro-batches — watermark-bounded dedup on doc_id,
    * the Gopher quality gate, and deterministic hash split assignment.
    * The quality and split expressions are the SAME column trees as the
    * oracle-checked batch operators (`graft.llm.Curation.gopherPass` /
    * `splitAssign`), so batch parity holds by construction and is
    * asserted over the corpus in StreamingSpec.
    *
    * Scale: dedup state is bounded by the watermark; the gate and split
    * are stateless map-side expressions — per-micro-batch cost is one
    * pass, no shuffle beyond dedup's key exchange. */
  def curationChain(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("doc_id")
      .filter(graft.llm.Curation.gopherPass(length(col("text"))))
      .withColumn("split", graft.llm.Curation.splitAssign(col("doc_id")))
      .select(col("doc_id"), col("source"), col("split"))

  /** The LEGACY arbitrary-state API (`flatMapGroupsWithState`) carrying
    * the same order-free per-user reductions as CumulativeProcessor:
    * (count, cents, min/max id) re-emitted on every batch that touches
    * the user. Same oracle trick as q_stream_stateful — every field is
    * order-independent and n_events is strictly monotone per user, so the
    * max_by(·, n_events) read-back is the final state no matter how the
    * source batched rows or how the group iterator ordered them. */
  def runningPerUserLegacy(events: Dataset[ECents]): Dataset[UserCum] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserCum, UserCum](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[ECents], state: GroupState[UserCum]) =>
          var c = state.getOption.getOrElse(
            UserCum(key, 0L, 0L, Long.MaxValue, Long.MinValue))
          rows.foreach { e =>
            c = UserCum(key, c.n_events + 1, c.cents + e.cents,
              math.min(c.min_id, e.event_id), math.max(c.max_id, e.event_id))
          }
          state.update(c)
          Iterator.single(c)
      }
  }

  /** Arbitrary stateful processing: per-user running (count, sum) emitted on
    * every update — the `flatMapGroupsWithState` shape used for custom
    * session enrichment. */
  def runningPerUser(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserRunning(userId, n, total)
          state.update(next)
          Iterator(next)
      }
  }
}
