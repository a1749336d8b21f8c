package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Running per-user statistics carried across micro-batches. All-integer
  * money arithmetic (cents) so the running stream total is bit-identical
  * to the batch aggregate — a double accumulator would drift with batch
  * boundaries. */
final case class UserStats(user_id: Long, n_events: Long, total_cents: Long,
    max_value: Double)

/** `transformWithState` showcase (the arbitrary-state API that supersedes
  * `mapGroupsWithState` in Spark 4): a per-user running aggregate held in a
  * typed [[ValueState]], one updated row emitted per user per micro-batch.
  *
  * Versus `mapGroupsWithState`, the processor owns N named state variables
  * (value/list/map) with per-state TTLs and explicit timers, and the state
  * schema can evolve between restarts. Backed by the RocksDB state store
  * (changelog-checkpointed at scale), so per-key state lives off-heap and
  * the executor heap holds only the keys of the current micro-batch — the
  * 100 TB posture for high-cardinality keyed state.
  *
  * TTL is [[TTLConfig.NONE]] here because the parity contract (final
  * streamed row per user == batch aggregate over all events) is the point;
  * a production pipeline would pass a TTL to bound state by recency, the
  * same tradeoff as the sessionizer's idle timeout
  * ([[EventStreams.sessionize]]).
  */
class UserStatsProcessor extends StatefulProcessor[Long, EventRow, UserStats] {

  @transient private var state: ValueState[UserStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserStats]("stats",
      Encoders.product[UserStats], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[UserStats] = {
    var n = 0L; var cents = 0L; var mx = Double.NegativeInfinity
    if (state.exists()) {
      val prev = state.get()
      n = prev.n_events; cents = prev.total_cents; mx = prev.max_value
    }
    rows.foreach { r =>
      n += 1
      // HALF_UP (half away from zero) to stay bit-identical to the batch
      // twin's Spark round() and the DuckDB oracle — math.round is
      // half-toward-+infinity and diverges for negative values landing
      // exactly on half a cent
      cents += BigDecimal(r.value * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      mx = math.max(mx, r.value)
    }
    val next = UserStats(user, n, cents, mx)
    state.update(next)
    Iterator.single(next)
  }
}

object TwsUserStats {

  /** Streaming form: requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` before starting the query). */
  def userStatsStream(events: Dataset[EventRow])(
      implicit spark: SparkSession): Dataset[UserStats] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** Batch twin with the same arithmetic — what the stream's final emitted
    * row per user must equal (MemoryStream parity in EventStreamsSpec;
    * the `x_stream_tws` oracle row checks this body against DuckDB). */
  def userStatsBatch(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("total_cents"),
        max(col("value")).as("max_value"))
}
