package graft.flights

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CancelledFlightsSpec extends SparkSpec {

  lazy val cancelled: DataFrame = {
    val flights = Ingest.readFlights(spark, resource("flights.csv"))
    Preprocessing.preprocess(flights)._1
  }
  lazy val c = new CancelledFlights(cancelled)

  test("cancellationReasons decodes codes and orders desc (weather majority)") {
    val rows = c.cancellationReasons.collect()
    assert(rows.head.getString(0) === "Meteo") // B = 4 of 8 (slide-12 qualitative)
    assert(rows.head.getLong(1) === 4L)
    val names = rows.map(_.getString(0)).toSet
    assert(names === Set("Meteo", "Compagnia aerea", "Traffico aereo", "Sicurezza"))
  }

  test("cancellationReasonsPct sums to 100") {
    val total = c.cancellationReasonsPct.agg(sum("percentage")).first().getDouble(0)
    assert(math.abs(total - 100.0) < 1e-9)
  }

  test("cancellationsByMonth sorts by (string-typed) month like the reference") {
    val months = c.cancellationsByMonth.select("MONTH").collect().map(_.getString(0))
    assert(months === months.sorted) // zero-padded strings sort correctly
    assert(months.contains("12"))
  }

  test("cancellationsByDayOfWeek covers observed days ascending") {
    val days = c.cancellationsByDayOfWeek.select("DAY_OF_WEEK").collect().map(_.getInt(0))
    assert(days === days.sorted)
  }

  test("cancellationsPerAirline decodes with fallback; count(CANCELLED) per group") {
    val rows = c.cancellationsPerAirline.collect()
    assert(rows.exists(_.getString(0) == "ZZ")) // unmapped → raw code
    val aa = rows.find(_.getString(0) == "American Airlines Inc.").get
    assert(aa.getLong(1) === 2L) // flights 105, 106
  }

  test("cancellationsPerOriginAirport is a true top-k") {
    val top2 = c.cancellationsPerOriginAirport(2).collect()
    assert(top2.length === 2)
    assert(top2.head.getString(0) === "ORD") // 2 cancellations, others ≤ 1... ties by code
  }
}
