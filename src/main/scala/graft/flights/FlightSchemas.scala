package graft.flights

import org.apache.spark.sql.types._

/** Explicit schemas for the Kaggle "2015 Flight Delays and Cancellations"
  * tables (public; column inventory per SURVEY.md §1.3, witnessed at
  * /root/reference/main.py:24-29 and the drop/usage sites).
  *
  * The reference infers schemas (`inferSchema=True`), paying a full extra
  * scan per CSV and getting nondeterministic types; declaring them kills the
  * inference scan — at 100 TB that's the difference between one pass and two.
  */
object FlightSchemas {

  val flights: StructType = StructType(Seq(
    StructField("YEAR", IntegerType),
    StructField("MONTH", IntegerType),
    StructField("DAY", IntegerType),
    StructField("DAY_OF_WEEK", IntegerType),
    StructField("AIRLINE", StringType),
    StructField("FLIGHT_NUMBER", IntegerType),
    StructField("TAIL_NUMBER", StringType),
    StructField("ORIGIN_AIRPORT", StringType),
    StructField("DESTINATION_AIRPORT", StringType),
    StructField("SCHEDULED_DEPARTURE", IntegerType),
    StructField("DEPARTURE_TIME", IntegerType),
    StructField("DEPARTURE_DELAY", IntegerType),
    StructField("TAXI_OUT", IntegerType),
    StructField("WHEELS_OFF", IntegerType),
    StructField("SCHEDULED_TIME", IntegerType),
    StructField("ELAPSED_TIME", IntegerType),
    StructField("AIR_TIME", IntegerType),
    StructField("DISTANCE", IntegerType),
    StructField("WHEELS_ON", IntegerType),
    StructField("TAXI_IN", IntegerType),
    StructField("SCHEDULED_ARRIVAL", IntegerType),
    StructField("ARRIVAL_TIME", IntegerType),
    StructField("ARRIVAL_DELAY", IntegerType),
    StructField("DIVERTED", IntegerType),
    StructField("CANCELLED", IntegerType),
    StructField("CANCELLATION_REASON", StringType),
    StructField("AIR_SYSTEM_DELAY", IntegerType),
    StructField("SECURITY_DELAY", IntegerType),
    StructField("AIRLINE_DELAY", IntegerType),
    StructField("LATE_AIRCRAFT_DELAY", IntegerType),
    StructField("WEATHER_DELAY", IntegerType)))

  val airports: StructType = StructType(Seq(
    StructField("IATA_CODE", StringType),
    StructField("AIRPORT", StringType),
    StructField("CITY", StringType),
    StructField("STATE", StringType),
    StructField("COUNTRY", StringType),
    StructField("LATITUDE", DoubleType),
    StructField("LONGITUDE", DoubleType)))

  val airlines: StructType = StructType(Seq(
    StructField("IATA_CODE", StringType),
    StructField("AIRLINE", StringType)))
}

/** Static decode tables the reference keeps as pandas dicts
  * (/root/reference/src/delayed_flights.py:385-400,
  * src/cancelled_flights.py:25-34) — engine-side here, applied as map
  * literals with a coalesce fallback to the raw code (the `fillna` path). */
object Decode {
  val airlineNames: Map[String, String] = Map(
    "UA" -> "United Air Lines Inc.",
    "AA" -> "American Airlines Inc.",
    "US" -> "US Airways Inc.",
    "F9" -> "Frontier Airlines Inc.",
    "B6" -> "JetBlue Airways",
    "OO" -> "Skywest Airlines Inc.",
    "AS" -> "Alaska Airlines Inc.",
    "NK" -> "Spirit Air Lines",
    "WN" -> "Southwest Airlines Co.",
    "DL" -> "Delta Air Lines Inc.",
    "EV" -> "Atlantic Southeast Airlines",
    "HA" -> "Hawaiian Airlines Inc.",
    "MQ" -> "American Eagle Airlines Inc.",
    "VX" -> "Virgin America")

  val cancellationReasons: Map[String, String] = Map(
    "A" -> "Compagnia aerea",
    "B" -> "Meteo",
    "C" -> "Traffico aereo",
    "D" -> "Sicurezza")
}
