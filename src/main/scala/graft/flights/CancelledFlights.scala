package graft.flights

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 6 cancellation analyses (/root/reference/src/cancelled_flights.py)
  * as DataFrame programs, with the pandas-side shaping (dict decode,
  * percentage-of-total, sort+head) pulled into Spark.
  */
final class CancelledFlights(cancelled: DataFrame) {

  private val reasonDecode = typedLit(Decode.cancellationReasons)
  private val airlineDecode = typedLit(Decode.airlineNames)

  /** Cancellation counts per decoded reason, desc (ref
    * `plot_cancellation_reasons` :15-56; pandas `map` → map-literal decode,
    * unmapped codes keep the raw code like `fillna`). */
  def cancellationReasons: DataFrame =
    cancelled.groupBy("CANCELLATION_REASON").agg(count(lit(1)).as("count"))
      .select(
        coalesce(try_element_at(reasonDecode, col("CANCELLATION_REASON")),
          col("CANCELLATION_REASON")).as("CANCELLATION_REASON"),
        col("count"))
      .orderBy(col("count").desc)

  /** Reason counts + percentage of total (ref `plot_cancellation_reasons_pie`
    * :58-103; the pandas percentage step done with a broadcast 1-row total). */
  def cancellationReasonsPct: DataFrame = {
    val counts = cancellationReasons
    val total = counts.agg(sum(col("count")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("percentage", col("count") / col("__total") * 100)
      .drop("__total")
      .orderBy(col("count").desc)
  }

  /** Cancellations per calendar month, ascending (ref
    * `plot_cancellations_by_month` :105-137). MONTH is a zero-padded STRING
    * after preprocessing — string sort is identical to numeric here, as in
    * the reference. */
  def cancellationsByMonth: DataFrame =
    cancelled.groupBy("MONTH").count().orderBy("MONTH")

  /** Cancellations per day of week 1=Monday..7=Sunday (ref
    * `plot_cancellations_by_day_of_week` :139-170). */
  def cancellationsByDayOfWeek: DataFrame =
    cancelled.groupBy("DAY_OF_WEEK").count().orderBy("DAY_OF_WEEK")

  /** Cancellations per decoded airline, desc (ref `cancellation_per_airline`
    * :172-216; null-skipping count(CANCELLED) kept). */
  def cancellationsPerAirline: DataFrame =
    cancelled.groupBy("AIRLINE").agg(count(col("CANCELLED")).as("NUM_CANCELLATIONS"))
      .select(
        coalesce(try_element_at(airlineDecode, col("AIRLINE")), col("AIRLINE")).as("AIRLINE"),
        col("NUM_CANCELLATIONS"))
      .orderBy(col("NUM_CANCELLATIONS").desc)

  /** Top-10 origin airports by cancellations (ref `cancellations_per_airport`
    * :218-261; the pandas sort+head becomes orderBy.limit). */
  def cancellationsPerOriginAirport(topN: Int = 10): DataFrame =
    cancelled.groupBy("ORIGIN_AIRPORT").agg(count(col("CANCELLED")).as("NUM_CANCELLATIONS"))
      .orderBy(col("NUM_CANCELLATIONS").desc, col("ORIGIN_AIRPORT"))
      .limit(topN)

  /** Per-destination cancellations (computed by the reference at :234-237). */
  def cancellationsPerDestinationAirport: DataFrame =
    cancelled.groupBy("DESTINATION_AIRPORT").agg(count(col("CANCELLED")).as("NUM_CANCELLATIONS"))
      .orderBy(col("NUM_CANCELLATIONS").desc, col("DESTINATION_AIRPORT"))
}
