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

  /** The reference's `.env` contract: PATH_FLIGHTS / PATH_AIRPORT /
    * PATH_AIRLINE, resolved with [[DotEnv.config]] (decouple parity:
    * process env first, then the `.env` file). */
  def loadFromEnv(spark: SparkSession,
      envFile: java.nio.file.Path = java.nio.file.Paths.get(".env"))
      : (DataFrame, DataFrame, DataFrame) = (
    readFlights(spark, DotEnv.config("PATH_FLIGHTS", envFile)),
    readAirports(spark, DotEnv.config("PATH_AIRPORT", envFile)),
    readAirlines(spark, DotEnv.config("PATH_AIRLINE", envFile)))
}

/** python-decouple `config()` parity (the reference's configuration
  * surface: /root/reference/main.py:21-29, README.md:38-44 shows the
  * `.env` file with `KEY = path` entries). Search order matches decouple:
  * a real environment variable wins, then the `.env` entry; a key defined
  * in neither raises (decouple's UndefinedValueError analogue). Format:
  * `KEY=VALUE` per line, whitespace around both trimmed, full-line `#`
  * comments and blanks skipped, one matching pair of single or double
  * quotes stripped from the value. */
object DotEnv {

  def parse(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        val k = l.take(i).trim
        val v0 = l.drop(i + 1).trim
        val v = if (v0.length >= 2 &&
            ((v0.head == '"' && v0.last == '"') ||
             (v0.head == '\'' && v0.last == '\''))) v0.substring(1, v0.length - 1)
          else v0
        k -> v
      }
      .toMap

  def load(path: java.nio.file.Path): Map[String, String] =
    if (java.nio.file.Files.isReadable(path))
      parse(java.nio.file.Files.readString(path))
    else Map.empty

  def config(key: String, envFile: java.nio.file.Path): String =
    sys.env.get(key).orElse(load(envFile).get(key)).getOrElse(
      throw new NoSuchElementException(
        s"$key not found: set the environment variable or define it in $envFile"))
}

/** Driver-side scalar helpers. */
object Rounding {
  /** Python `round()` — banker's rounding (HALF_EVEN), NOT Spark `round`
    * (HALF_UP). Used for the reference's collect-scalar thresholds
    * (src/delayed_flights.py:33,184). */
  def halfEven(x: Double): Double =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
}
