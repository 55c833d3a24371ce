package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Streaming-specific operators beyond the reference's surface:
  * watermark-bounded stream dedup and custom sessionization state.
  */
object StreamOps {

  /** Exactly-once-per-key within the watermark horizon: the streaming form
    * of exact dedup (state is bounded by the watermark, so memory is
    * O(keys per horizon), not O(stream)). */
  def dedupWithinWatermark(
      df: DataFrame,
      eventTimeCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming form of the corpus-cleaning pipeline
    * (TextQueries.cleanPipeline): per-document quality gate (pure
    * projection — no state) followed by exact dedup on the
    * normalized-text fingerprint within the watermark horizon. The same
    * quality/fingerprint expressions run in the batch path, so a corpus
    * cleaned incrementally converges to the batch-cleaned corpus; state is
    * O(fingerprints per horizon), the property that keeps an unbounded
    * document stream cleanable. Expects `text` and an event-time column.
    */
  def cleanDocStream(
      df: DataFrame,
      eventTimeCol: String,
      watermark: String,
      minQuality: Double = 0.35): DataFrame = {
    val scored = graft.operators.TextQueries.withQuality(
        df.withColumn("toks", graft.operators.TextQueries.toks(col("text"))))
      .withColumn("fingerprint",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .filter(col("quality_score") >= minQuality)
    scored
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .drop("toks")
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionSummary(
      user_id: Long, start: Timestamp, end: Timestamp, n_events: Long, value_sum: Double)

  /** Custom sessionization via flatMapGroupsWithState (event-time timeout):
    * closes a session when no event arrives within `gapMs` of the
    * watermark. Demonstrates the KeyValueGroupedDataset custom-state path
    * the built-in `session_window` cannot express (e.g. emitting per-event
    * side effects, capping session length, custom merge rules). */
  def sessionize(
      events: Dataset[SessionEvent],
      watermark: String = "10 minutes",
      gapMs: Long = 5 * 60 * 1000L): Dataset[SessionSummary] = {
    // state = (sessionStart, lastEventMs, nEvents, valueSum) — tuple encoder
    // (a nested private case class trips Janino codegen for the state row)
    type SessionState = (Long, Long, Long, Double)
    implicit val stateEnc: Encoder[SessionState] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val (start, last, n, total) = state.get
            state.remove()
            Iterator.single(SessionSummary(
              userId, new Timestamp(start), new Timestamp(last + gapMs), n, total))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some((start, last, n, total)) if t - last <= gapMs =>
                  cur = Some((start, t, n + 1, total + e.value))
                case Some((start, last, n, total)) =>
                  closed ::= SessionSummary(
                    userId, new Timestamp(start), new Timestamp(last + gapMs), n, total)
                  cur = Some((t, t, 1L, e.value))
                case None =>
                  cur = Some((t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  final case class RunningTotal(user_id: Long, n_events: Long, value_sum: Double)

  /** Spark 4's arbitrary-state API (`transformWithState` — the successor to
    * flatMapGroupsWithState): per-user running event count + value total in
    * a typed `ValueState`, one updated row emitted per key per micro-batch.
    * Requires the RocksDB state store provider; `ttl` bounds state lifetime
    * (processing-time TTL) so abandoned keys age out — the property that
    * keeps state size O(active keys), not O(all keys ever), on an unbounded
    * stream. */
  private class RunningTotalProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, SessionEvent, RunningTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
      var n = n0
      var s = s0
      rows.foreach { e => n += 1; s += e.value }
      totals.update((n, s))
      Iterator.single(RunningTotal(key, n, s))
    }
  }

  /** Event-time-timer sessionization on the transformWithState API — the
    * timer-driven equivalent of [[sessionize]]: state holds the open
    * session, a timer registered at (last event + gap) fires when the
    * WATERMARK passes it, emitting the closed session deterministically.
    * Demonstrates the full arbitrary-state surface (typed state + timers)
    * Spark 4 added over flatMapGroupsWithState. */
  private class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionSummary] {
    @transient private var st: ValueState[(Long, Long, Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("session",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionSummary]
      var cur = if (st.exists()) Some(st.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some((start, last, n, total)) if t - last <= gapMs =>
            cur = Some((start, t, n + 1, total + e.value))
          case Some((start, last, n, total)) =>
            closed ::= SessionSummary(
              key, new Timestamp(start), new Timestamp(last + gapMs), n, total)
            cur = Some((t, t, 1L, e.value))
          case None =>
            cur = Some((t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        st.update(s)
        getHandle.registerTimer(s._2 + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionSummary] =
      if (st.exists()) {
        val (start, last, n, total) = st.get()
        st.clear()
        Iterator.single(SessionSummary(
          key, new Timestamp(start), new Timestamp(last + gapMs), n, total))
      } else Iterator.empty
  }

  /** Timer-driven sessionization via transformWithState (event-time mode,
    * RocksDB state store required). */
  def sessionizeTws(
      events: Dataset[SessionEvent],
      watermark: String = "10 minutes",
      gapMs: Long = 5 * 60 * 1000L): Dataset[SessionSummary] = {
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user running totals over an unbounded stream via transformWithState
    * (update mode, processing-time TTL on idle keys). A non-NONE TTL needs
    * `TimeMode.ProcessingTime` — Spark's state handle refuses TTL config in
    * any other mode (StatefulProcessorCannotAssignTTLInTimeMode). */
  def runningTotals(
      events: Dataset[SessionEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningTotal] = {
    implicit val outEnc: Encoder[RunningTotal] = Encoders.product[RunningTotal]
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new RunningTotalProcessor(ttl), mode, OutputMode.Update())
  }
}
