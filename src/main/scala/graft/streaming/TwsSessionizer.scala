package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import java.sql.Timestamp

/** One closed session, as emitted when the watermark passes its gap
  * deadline. Mirrors [[EventStreams.sessionizeBatch]]'s aggregate row
  * (minus the per-user ordinal, which a streaming emitter cannot know
  * without total order). `total_value` rounded like the batch twin. */
final case class TwsSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

/** Event-time sessionization on `transformWithState` — the full surface of
  * the Spark 4 arbitrary-state API: a [[ListState]] of OPEN sessions, an
  * EVENT-TIME TIMER at the earliest close-out deadline, emission ONLY from
  * [[handleExpiredTimer]] when the watermark passes `session_end + gap`.
  *
  * OUT-OF-ORDER CORRECTNESS: incoming events are merged into the open-
  * session list by INTERVAL OVERLAP (an event within `gap` of a session on
  * EITHER side joins it, possibly bridging two sessions into one), so
  * arrival order — within and across micro-batches — cannot change the
  * result: any permutation of the same events yields the same merged
  * intervals. Events older than the watermark never reach us (Spark drops
  * them); everything younger is still mergeable, which is exactly why a
  * session may only be emitted once the watermark passes its deadline —
  * an inline "a later event proves the gap" emission would be wrong the
  * moment an out-of-order event inside the gap arrived in a later batch.
  *
  * State per user: the unsealed sessions only — the watermark seals (and
  * [[handleExpiredTimer]] evicts) anything older, so state is bounded by
  * sessions active within one watermark delay, not by stream history.
  * Contrast with the `mapGroupsWithState` sessionizer
  * ([[EventStreams.sessionize]]), which needs wall-clock timeouts and is
  * replay-unstable; this closes sessions by DATA time.
  */
class TwsSessionizer(gapMs: Long) extends StatefulProcessor[Long, EventRow, TwsSession] {

  @transient private var sess: ListState[TwsSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getListState[TwsSession]("sess",
      Encoders.product[TwsSession], TTLConfig.NONE)

  private def closed(s: TwsSession): TwsSession =
    s.copy(total_value = BigDecimal(s.total_value)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Merge intervals (with `gapMs` slack) after adding the new event —
    * O(n log n) in the number of UNSEALED sessions, which the watermark
    * keeps small. */
  private def merged(sessions: Seq[TwsSession]): Seq[TwsSession] =
    sessions.sortBy(s => (s.session_start.getTime, s.session_end.getTime))
      .foldLeft(Vector.empty[TwsSession]) { (acc, s) =>
        acc.lastOption match {
          case Some(p) if s.session_start.getTime <= p.session_end.getTime + gapMs =>
            acc.init :+ p.copy(
              session_end = if (s.session_end.after(p.session_end)) s.session_end
                else p.session_end,
              n_events = p.n_events + s.n_events,
              total_value = p.total_value + s.total_value)
          case _ => acc :+ s
        }
      }

  private def rearm(sessions: Seq[TwsSession]): Unit = {
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    if (sessions.nonEmpty)
      getHandle.registerTimer(sessions.map(_.session_end.getTime).min + gapMs)
  }

  override def handleInputRows(user: Long, rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[TwsSession] = {
    val singletons = rows.map(e =>
      TwsSession(user, e.ts, e.ts, 1L, e.value)).toSeq
    val all = merged(sess.get().toSeq ++ singletons)
    sess.put(all.toArray)
    rearm(all)
    Iterator.empty // emission happens ONLY when the watermark seals a session
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsSession] = {
    // seal every session the watermark has passed (end + gap <= watermark):
    // no on-time event can extend it any more
    val wm = timerValues.getCurrentWatermarkInMs()
    val (matured, open) = sess.get().toSeq
      .partition(s => s.session_end.getTime + gapMs <= wm)
    if (open.isEmpty) sess.clear() else sess.put(open.toArray)
    rearm(open)
    matured.sortBy(_.session_start.getTime).map(closed(_)).iterator
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
