package graft.flights

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingest with declared schemas (ref: /root/reference/main.py:24-29 +
  * README.md:38-44 env-var config — same contract, minus the inference scan).
  */
object Ingest {

  def readFlights(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(FlightSchemas.flights).csv(path)

  def readAirports(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(FlightSchemas.airports).csv(path)

  def readAirlines(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(FlightSchemas.airlines).csv(path)

  /** The reference's `.env` contract: PATH_FLIGHTS / PATH_AIRPORT / PATH_AIRLINE. */
  def loadFromEnv(spark: SparkSession): (DataFrame, DataFrame, DataFrame) = (
    readFlights(spark, sys.env("PATH_FLIGHTS")),
    readAirports(spark, sys.env("PATH_AIRPORT")),
    readAirlines(spark, sys.env("PATH_AIRLINE")))
}

/** Driver-side scalar helpers. */
object Rounding {
  /** Python `round()` — banker's rounding (HALF_EVEN), NOT Spark `round`
    * (HALF_UP). Used for the reference's collect-scalar thresholds
    * (src/delayed_flights.py:33,184). */
  def halfEven(x: Double): Double =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
}
