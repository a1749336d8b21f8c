package graft.flights

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class PreprocessingSpec extends SparkSpec {

  lazy val flights: DataFrame = Ingest.readFlights(spark, resource("flights.csv"))

  test("explicit-schema CSV ingest reads all rows with declared types") {
    assert(flights.count() === 30)
    assert(flights.schema("DEPARTURE_DELAY").dataType.typeName === "integer")
    assert(flights.schema("CANCELLATION_REASON").dataType.typeName === "string")
  }

  test("concDate rebuilds SCHEDULED_DEPARTURE; '2400' parses to null (ref 2400 gotcha)") {
    val df = Preprocessing.concDate(flights)
    val ok = df.filter(col("FLIGHT_NUMBER") === 100)
      .select(date_format(col("SCHEDULED_DEPARTURE"), "yyyy-MM-dd HH:mm:ss"))
      .first().getString(0)
    assert(ok === "2015-01-01 06:00:00")
    // midnight coded as 2400 → invalid hour → null, NOT an ANSI error
    val midnight = df.filter(col("FLIGHT_NUMBER") === 401)
      .select(col("SCHEDULED_DEPARTURE")).first()
    assert(midnight.isNullAt(0))
    // 2-digit HHMM zero-pads: 30 → 00:30
    val padded = df.filter(col("FLIGHT_NUMBER") === 501)
      .select(date_format(col("SCHEDULED_DEPARTURE"), "HH:mm")).first().getString(0)
    assert(padded === "00:30")
  }

  test("transformDate renders HHMM ints as HH:MM:00 strings") {
    val df = Preprocessing.transformDate(flights, "DEPARTURE_TIME")
    val v = df.filter(col("FLIGHT_NUMBER") === 500)
      .select("DEPARTURE_TIME").first().getString(0)
    assert(v === "09:50:00")
    val v2 = df.filter(col("FLIGHT_NUMBER") === 401)
      .select("DEPARTURE_TIME").first().getString(0)
    assert(v2 === "00:05:00") // 5 → 0005
  }

  test("lenient drop ignores missing names (incl. 'DATE' and dup 'ARRIVAL_TIME')") {
    val dropped = flights.drop(Preprocessing.dropCancelled: _*)
    assert(!dropped.columns.contains("ARRIVAL_TIME"))
    assert(dropped.columns.contains("ORIGIN_AIRPORT"))
    // dropping nonexistent names is a no-op, not an error
    assert(flights.drop("DATE", "NO_SUCH").columns.length === 31)
  }

  test("preprocess splits cancelled/delayed; delayed drops null ELAPSED_TIME rows") {
    val (cancelled, delayed) = Preprocessing.preprocess(flights)
    assert(cancelled.count() === 8)
    // 22 CANCELLED=0 rows, one (flight 601) has null ELAPSED_TIME
    assert(delayed.count() === 21)
    assert(!cancelled.columns.contains("DEPARTURE_DELAY"))
    assert(!delayed.columns.contains("CANCELLATION_REASON"))
    assert(delayed.columns.contains("SCHEDULED_DEPARTURE"))
  }

  test("nullPercentages: one-row profile with exact percentages") {
    val (cancelled, _) = Preprocessing.preprocess(flights)
    val pct = Preprocessing.nullPercentages(cancelled)
    // all 8 cancelled rows have a CANCELLATION_REASON → 0% null
    assert(pct.select("CANCELLATION_REASON").first().getDouble(0) === 0.0)
    assert(pct.select("MONTH").first().getDouble(0) === 0.0)
  }
}
