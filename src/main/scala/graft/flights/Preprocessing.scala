package graft.flights

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ETL stage (/root/reference/src/preprocessing.py:7-129)
  * with identical semantics, Spark-4-safe (try_to_timestamp for the
  * null-on-error "2400" case — PySpark 3.5 legacy `to_timestamp` yields
  * null there, ANSI-on Spark 4 would throw).
  *
  * Perf deltas vs the reference (behavior-preserving, SURVEY §4.2):
  * the two split branches are CACHED — the reference re-parses the CSV
  * through the whole withColumn stack for every one of its 16 analyses.
  */
object Preprocessing {

  /** Null percentage per column, single-row (ref: :14-26). One aggregate
    * pass computes counts; the total row count rides along as count(*) so
    * profiling is ONE job, not count()+select. */
  def nullPercentages(df: DataFrame): DataFrame = {
    val counts = df.select(
      df.columns.map(c => count(when(col(c).isNull, c)).as(c)) :+ count(lit(1)).as("__total"): _*)
    counts.select(df.columns.map(c => (col(c) / col("__total") * 100).as(c)): _*)
  }

  /** Rebuild SCHEDULED_DEPARTURE as a timestamp from YEAR/MONTH/DAY + HHMM
    * (ref `__conc_date` :28-53). MONTH/DAY become zero-padded STRINGS
    * afterwards, exactly like the reference (lpad's implicit cast). */
  def concDate(df0: DataFrame): DataFrame = {
    val df = df0
      .withColumn("MONTH", lpad(col("MONTH").cast("string"), 2, "0"))
      .withColumn("DAY", lpad(col("DAY").cast("string"), 2, "0"))
      .withColumn("SCHEDULED_DEPARTURE", lpad(col("SCHEDULED_DEPARTURE").cast("string"), 4, "0"))
      .withColumn("HOUR", col("SCHEDULED_DEPARTURE").substr(1, 2))
      .withColumn("MINUTE", col("SCHEDULED_DEPARTURE").substr(3, 2))
      .withColumn("SCHEDULED_DEPARTURE", concat(
        col("YEAR"), lit("-"), col("MONTH"), lit("-"), col("DAY"), lit(" "),
        col("HOUR"), lit(":"), col("MINUTE"), lit(":00")))
    df.withColumn("SCHEDULED_DEPARTURE",
      try_to_timestamp(col("SCHEDULED_DEPARTURE"), lit("yyyy-MM-dd HH:mm:ss")))
  }

  /** HHMM int column → "HH:MM:00" string (ref `__trasform_date` :55-72;
    * leaves HOUR/MINUTE scratch columns behind, same as the reference —
    * they're dropped later by the lenient drop list). */
  def transformDate(df0: DataFrame, column: String): DataFrame =
    df0
      .withColumn(column, lpad(col(column).cast("string"), 4, "0"))
      .withColumn("HOUR", col(column).substr(1, 2))
      .withColumn("MINUTE", col(column).substr(3, 2))
      .withColumn(column, concat(col("HOUR"), lit(":"), col("MINUTE"), lit(":00")))

  /** Drop lists — verbatim from the reference, INCLUDING names that don't
    * exist at drop time ('DATE') and the duplicated 'ARRIVAL_TIME'
    * (:85-88, :102-103); Scala drop is identically lenient. */
  val dropInit: Seq[String] = Seq("TAXI_OUT", "TAXI_IN", "WHEELS_ON", "WHEELS_OFF", "YEAR",
    "DAY", "DATE", "AIR_SYSTEM_DELAY", "SECURITY_DELAY", "AIRLINE_DELAY",
    "LATE_AIRCRAFT_DELAY", "WEATHER_DELAY", "DIVERTED", "FLIGHT_NUMBER",
    "TAIL_NUMBER", "AIR_TIME", "HOUR", "MINUTE")
  val dropCancelled: Seq[String] = Seq("DEPARTURE_TIME", "DEPARTURE_DELAY", "ELAPSED_TIME",
    "ARRIVAL_TIME", "ARRIVAL_TIME", "ARRIVAL_DELAY")
  val dropDelayed: Seq[String] = Seq("CANCELLED", "CANCELLATION_REASON")

  /** Full pipeline (ref `preprocessing_data` :123-129):
    * rebuild dates → lenient drop → split CANCELLED==1/==0 →
    * per-branch drops → delayed dropna(ELAPSED_TIME). Returns (cancelled,
    * delayed), both cached (the reference recomputes the whole chain per
    * analysis; at scale you'd materialize these once to parquet). */
  def preprocess(flights: DataFrame): (DataFrame, DataFrame) = {
    var df = concDate(flights)
    df = transformDate(df, "DEPARTURE_TIME")
    df = transformDate(df, "SCHEDULED_ARRIVAL")
    df = transformDate(df, "ARRIVAL_TIME")
    df = df.drop(dropInit: _*)
    val cancelled = df.filter(col("CANCELLED") === 1)
      .drop(dropCancelled: _*)
      .cache()
    val delayed = df.filter(col("CANCELLED") === 0)
      .drop(dropDelayed: _*)
      .na.drop(Seq("ELAPSED_TIME"))
      .cache()
    (cancelled, delayed)
  }
}
