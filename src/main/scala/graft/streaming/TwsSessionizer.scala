package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.sql.Timestamp

/** One closed session, as emitted when the watermark passes its gap
  * deadline. Mirrors [[EventStreams.sessionizeBatch]]'s aggregate row
  * (minus the per-user ordinal, which a streaming emitter cannot know
  * without total order). `total_value` rounded like the batch twin. */
final case class TwsSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

/** Event-time sessionization on `transformWithState` — the full surface of
  * the Spark 4 arbitrary-state API: a typed [[ValueState]] for the open
  * session, an EVENT-TIME TIMER armed at `session_end + gap` as the
  * close-out deadline, emission from [[handleExpiredTimer]] when the
  * watermark crosses it. Contrast with the `mapGroupsWithState`
  * sessionizer ([[EventStreams.sessionize]]), which needs processing-time
  * timeouts (wall-clock, replay-unstable) or never closes sessions at all;
  * the timer version closes them by DATA time, so a replay of the same
  * stream emits the same sessions.
  *
  * In-batch splitting matches the batch twin exactly: events are walked in
  * (ts, event_id) order and a gap strictly greater than `gapMs` closes the
  * current session inline (emitted immediately — its deadline has, by the
  * presence of the later event, already passed).
  *
  * State per user: ONE open session + ONE armed timer, O(active users)
  * total, off-heap in RocksDB.
  */
class TwsSessionizer(gapMs: Long) extends StatefulProcessor[Long, EventRow, TwsSession] {

  @transient private var sess: ValueState[TwsSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[TwsSession]("sess",
      Encoders.product[TwsSession], TTLConfig.NONE)

  private def closed(s: TwsSession): TwsSession =
    s.copy(total_value = BigDecimal(s.total_value)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  override def handleInputRows(user: Long, rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[TwsSession] = {
    val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var cur = if (sess.exists()) Option(sess.get()) else None
    val out = Seq.newBuilder[TwsSession]
    batch.foreach { e =>
      cur match {
        case Some(s) if e.ts.getTime - s.session_end.getTime <= gapMs =>
          cur = Some(s.copy(session_end = e.ts, n_events = s.n_events + 1,
            total_value = s.total_value + e.value))
        case Some(s) => // gap exceeded inside the batch: close inline
          out += closed(s)
          cur = Some(TwsSession(user, e.ts, e.ts, 1L, e.value))
        case None =>
          cur = Some(TwsSession(user, e.ts, e.ts, 1L, e.value))
      }
    }
    cur.foreach { s =>
      sess.update(s)
      // one live timer per key: re-arm the deadline at the new session end
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(s.session_end.getTime + gapMs)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsSession] = {
    // the watermark passed session_end + gap: no on-time event can extend
    // this session any more — emit and drop the state
    val out = closed(sess.get())
    sess.clear()
    Iterator.single(out)
  }
}

object TwsSessionizer {

  /** Streaming sessionization; `events` must already carry a watermark on
    * `ts` (event-time timers fire against it). RocksDB state store
    * required, as for [[TwsUserStats.userStatsStream]]. */
  def sessionStream(events: Dataset[EventRow], gapMinutes: Int = 30)(
      implicit spark: SparkSession): Dataset[TwsSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TwsSessionizer(gapMinutes.toLong * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
