package graft.flights

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drop-in equivalent of the reference's driver script
  * (/root/reference/main.py:10-58): load the three CSVs, preprocess, run all
  * 16 analyses + graph metrics. Each analysis returns its DataFrame (the
  * data behind the reference's plot); `run()` returns them keyed by the
  * reference method name so a caller can render/save as they wish.
  *
  * Differences from the reference, all behavior-preserving:
  * declared schemas (no inference scan), cached split (the reference
  * re-parses the CSV per analysis), broadcast dims, top-k via limit.
  */
object FlightAnalysisRunner {

  def run(spark: SparkSession,
      flightsPath: String, airportsPath: String, airlinesPath: String): Map[String, DataFrame] = {
    val flights = Ingest.readFlights(spark, flightsPath)
    val airports = Ingest.readAirports(spark, airportsPath)
    val airlines = Ingest.readAirlines(spark, airlinesPath)

    val (cancelled, delayed) = Preprocessing.preprocess(flights)

    val d = new DelayedFlights(delayed, airports, airlines)
    val c = new CancelledFlights(cancelled)
    val g = new GraphFlights(delayed, airports)

    Map(
      // DelayedFlights (ref main.py:37-44)
      "origin_airport_pie" -> d.originAirportPct,
      "most_delay" -> d.mostDelay,
      "avg_delay" -> d.avgDelayPerAirline,
      "delay_analysis_hourly" -> d.hourlyDelayStats,
      "delay_analysis_time_slots" -> d.delaysPerTimeSlot,
      "graph_city_airline_delay" -> d.cityAirlineDelay,
      "most_delay_airport_most_flight" -> d.airportFlightsVsDelay,
      "route_most_delay" -> d.routeMostDelay,
      "plot_cities_with_most_delays" -> d.citiesWithMostDelaysLong(10),
      // CancelledFlights (ref main.py:47-52)
      "plot_cancellation_reasons" -> c.cancellationReasons,
      "plot_cancellation_reasons_pie" -> c.cancellationReasonsPct,
      "cancellation_per_airline" -> c.cancellationsPerAirline,
      "plot_cancellations_by_month" -> c.cancellationsByMonth,
      "plot_cancellations_by_day_of_week" -> c.cancellationsByDayOfWeek,
      "cancellations_per_airport" -> c.cancellationsPerOriginAirport(10),
      // GraphframeFlights (ref main.py:55-57)
      "graph_cities_in_degrees" -> g.airportInDegrees,
      "graph_cities_pagerank" -> g.airportPageRank,
      "graph_cities_triangle_count" -> g.airportTriangleCount,
      "graph_states_in_degrees" -> g.stateInDegrees,
      "graph_states_pagerank" -> g.statePageRank)
  }

  /** CLI: runMain graft.flights.FlightAnalysisRunner <flights.csv> <airports.csv> <airlines.csv>
    * (or env PATH_FLIGHTS/PATH_AIRPORT/PATH_AIRLINE like the reference's .env). */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("Flight Delays and Cancellations Analysis")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val Seq(f, ap, al) =
      if (args.length >= 3) args.take(3).toSeq
      else Seq(sys.env("PATH_FLIGHTS"), sys.env("PATH_AIRPORT"), sys.env("PATH_AIRLINE"))
    run(spark, f, ap, al).toSeq.sortBy(_._1).foreach { case (name, df) =>
      println(s"\n===== $name =====")
      df.show(20, truncate = false)
    }
    spark.stop()
  }
}
