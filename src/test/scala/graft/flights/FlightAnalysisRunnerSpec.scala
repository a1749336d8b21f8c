package graft.flights

import graft.SparkSpec

class FlightAnalysisRunnerSpec extends SparkSpec {

  test("full reference pipeline: all 20 analyses run end-to-end on the fixtures") {
    val out = FlightAnalysisRunner.run(spark,
      resource("flights.csv"), resource("airports.csv"), resource("airlines.csv"))
    assert(out.size === 20)
    out.foreach { case (name, df) =>
      val n = df.count()
      assert(n > 0, s"analysis $name returned no rows")
    }
    // qualitative check from the reference presentation (slide 12): weather
    // dominates cancellations on this fixture too
    val reasons = out("plot_cancellation_reasons").collect()
    assert(reasons.head.getString(0) === "Meteo")
  }
}
