package graft.flights

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DelayedFlightsSpec extends SparkSpec {

  lazy val airports: DataFrame = Ingest.readAirports(spark, resource("airports.csv"))
  lazy val airlines: DataFrame = Ingest.readAirlines(spark, resource("airlines.csv"))
  lazy val delayed: DataFrame = {
    val flights = Ingest.readFlights(spark, resource("flights.csv"))
    Preprocessing.preprocess(flights)._2
  }
  lazy val d = new DelayedFlights(delayed, airports, airlines)

  test("mostDelay keeps only cities above the banker-rounded mean flight count") {
    val counts = delayed.join(airports,
        delayed("ORIGIN_AIRPORT") === airports("IATA_CODE"))
      .groupBy("CITY").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = Rounding.halfEven(counts.values.sum.toDouble / counts.size)
    val expected = counts.filter(_._2 > threshold).keySet
    val got = d.mostDelay.select("CITY").collect().map(_.getString(0)).toSet
    assert(got === expected)
    // TOTAL_AVG_DELAY = (dep+arr)/2
    val row = d.mostDelay.collect().head
    val avg2 = (row.getDouble(1) + row.getDouble(2)) / 2
    assert(math.abs(row.getDouble(3) - avg2) < 1e-12)
  }

  test("avgDelayPerAirline: HALF_EVEN integer rounding + decode fallback for unmapped code") {
    val rows = d.avgDelayPerAirline.collect()
    val names = rows.map(_.getString(0)).toSet
    assert(names.contains("Zeta Zulu Airways") === false) // decode map, not the dim table
    assert(names.contains("ZZ")) // unmapped code falls back to raw (pandas fillna path)
    assert(names.contains("American Airlines Inc."))
    // ZZ: flight 600 only (601 was dropped by ELAPSED_TIME dropna):
    // dep=15 arr=15 → rounds to 15/15/15
    val zz = rows.find(_.getString(0) == "ZZ").get
    assert(zz.getInt(2) === 15 && zz.getInt(3) === 15 && zz.getInt(4) === 15)
  }

  test("avgDelayPerAirline counts skip null ARRIVAL_DELAY (count(col) semantics)") {
    // AA late flights: 100(12,25), 101(5,3), 102(dep null→kept? dep null,arr null →
    // filter (dep>0 | arr>0) is null-row → dropped), 103(5,3), 104(35,50) → 4 rows
    val aa = d.avgDelayPerAirline.collect().find(_.getString(0) == "American Airlines Inc.").get
    assert(aa.getLong(1) === 4L)
  }

  test("citiesWithMostDelays keeps the null-CITY group for airports missing from the dim") {
    val rows = d.citiesWithMostDelays.collect()
    assert(rows.exists(r => r.isNullAt(0))) // XXX airport → null CITY group
    // every total_delay = dep + arr totals
    rows.foreach { r =>
      assert(r.getLong(3) === r.getLong(1) + r.getLong(2))
    }
  }

  test("citiesWithMostDelaysLong unpivots to (CITY, Delay_Type, Total_Delay)") {
    val long = d.citiesWithMostDelaysLong(5)
    assert(long.columns.toSeq === Seq("CITY", "Delay_Type", "Total_Delay"))
    val types = long.select("Delay_Type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("Partenza", "Arrivo"))
    assert(long.count() === 10) // 5 cities × 2 measures
  }

  test("timeSlot bucket edges match the reference (hours 5/6/11/12/18/19/23/null)") {
    import spark.implicits._
    val got = Seq(0, 1, 5, 6, 11, 12, 18, 19, 23).toDF("h")
      .select(col("h"), d.timeSlot(col("h")).as("slot"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got(5) === "Notte (1 - 6)")
    assert(got(6) === "Mattina (6 - 12)")
    assert(got(11) === "Mattina (6 - 12)")
    assert(got(12) === "Pomeriggio (12 - 19)")
    assert(got(18) === "Pomeriggio (12 - 19)")
    assert(got(19) === "Sera (19 - 1)")
    assert(got(23) === "Sera (19 - 1)")
    assert(got(0) === "Notte (1 - 6)")
  }

  test("hourlyDelayStats: 2400-coded departure lands in the null-hour group") {
    val rows = d.hourlyDelayStats.collect()
    assert(rows.exists(_.isNullAt(0))) // flight 401's SCHEDULED_DEPARTURE is null
    // hour 6: flight 100 only → Total Delays 1, avg dep 12, avg arr 25
    val h6 = rows.find(r => !r.isNullAt(0) && r.getInt(0) == 6).get
    assert(h6.getLong(1) === 1L)
    assert(h6.getDouble(2) === 12.0 && h6.getDouble(3) === 25.0)
  }

  test("delaysPerTimeSlot: avg-of-HOURLY-means semantics + null hour lands in Notte") {
    val slots = d.delaysPerTimeSlot.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Sera = hours 19 (flight 300, dep 20), 20 (203, dep 10), 23 (301, dep 10):
    // one late flight each → Total Delays 3; slot mean = mean of hourly means
    // (pandas groupby of the hourly frame), NOT the row-level mean.
    assert(slots("Sera (19 - 1)")._1 === 3L)
    assert(math.abs(slots("Sera (19 - 1)")._2 - (20.0 + 10.0 + 10.0) / 3) < 1e-12)
    // flight 401's "2400" departure → null hour → pandas else-branch → Notte
    val night = d.hourlyDelayStats.withColumn("slot", d.timeSlot(col("Hour")))
      .filter(col("Hour").isNull).select("slot").first().getString(0)
    assert(night === "Notte (1 - 6)")
  }

  test("routeMostDelay and originAirportPct return plausible shapes") {
    assert(d.routeMostDelay.columns.contains("TOTAL_AVG_DELAY"))
    val pct = d.originAirportPct.agg(sum("PERCENTAGE")).first().getDouble(0)
    assert(pct > 99.0 && pct < 100.0001) // top-15 covers all 7 named airports here
  }
}
