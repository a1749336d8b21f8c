package graft.flights

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 8 delayed-flight analyses (/root/reference/src/delayed_flights.py) as
  * pure DataFrame programs — the engine returns the data behind each plot;
  * rendering is presentation, not capability. Result-shaping the reference
  * leaked into pandas (decode, rounding, melt, time-slot buckets, sort+head)
  * is pulled into Spark per SURVEY §2.10.
  *
  * Perf posture: airports (322 rows) and airlines (14) are broadcast; every
  * client-side `.head(n)` becomes `orderBy.limit(n)` (TakeOrderedAndProject);
  * the reference's twin aggregates are fused where results are identical.
  */
final class DelayedFlights(delayed: DataFrame, airports: DataFrame, airlines: DataFrame) {

  private def joinedWithAirports: DataFrame =
    delayed.join(broadcast(airports),
      delayed("ORIGIN_AIRPORT") === airports("IATA_CODE"), "inner")

  /** Pie data: % of flights per origin-airport name, top-15
    * (ref `origin_airport_pie` :125-171). */
  def originAirportPct: DataFrame = {
    val named = delayed.join(broadcast(airports),
        delayed("ORIGIN_AIRPORT") === airports("IATA_CODE"), "inner")
      .select(delayed.col("*") +: Seq(airports("AIRPORT").as("ORIGIN_AIRPORT_NAME")): _*)
    val counts = named.groupBy("ORIGIN_AIRPORT_NAME").agg(count(lit(1)).as("NUM_FLIGHTS"))
    val total = counts.agg(sum(col("NUM_FLIGHTS")).as("TOTAL_FLIGHTS"))
    counts.crossJoin(broadcast(total))
      .withColumn("PERCENTAGE", col("NUM_FLIGHTS") / col("TOTAL_FLIGHTS") * 100)
      .drop("TOTAL_FLIGHTS")
      .orderBy(col("PERCENTAGE").desc)
      .limit(15)
  }

  /** Cities above the mean flight count, mean dep/arr delay + combined avg
    * (ref `most_delay` :16-88; collect-scalar threshold with Python-round =
    * HALF_EVEN). */
  def mostDelay: DataFrame = {
    val joined = joinedWithAirports
    val counts = joined.groupBy("CITY").agg(count(lit(1)).as("NUM_FLIGHTS"))
    val avgFlights = Rounding.halfEven(
      counts.agg(avg(col("NUM_FLIGHTS"))).first().getDouble(0))
    val popular = counts.filter(col("NUM_FLIGHTS") > avgFlights)
    joined.join(popular, Seq("CITY"))
      .groupBy("CITY")
      .agg(avg("DEPARTURE_DELAY").as("Average Departure Delay"),
        avg("ARRIVAL_DELAY").as("Average Arrival Delay"))
      .withColumn("TOTAL_AVG_DELAY",
        (col("Average Departure Delay") + col("Average Arrival Delay")) / 2)
      .orderBy(col("TOTAL_AVG_DELAY").desc)
  }

  /** Mean departure delay per (city, airline) over the 10 busiest cities
    * (ref `graph_city_airline_delay` :90-123). */
  def cityAirlineDelay: DataFrame = {
    val air = broadcast(airlines.withColumnRenamed("AIRLINE", "AIRLINE_NAME"))
    val joined = delayed
      .join(broadcast(airports), delayed("ORIGIN_AIRPORT") === airports("IATA_CODE"), "inner")
      .join(air, delayed("AIRLINE") === air("IATA_CODE"), "inner")
    val top10 = joined.groupBy("CITY").agg(count(lit(1)).as("NUM_FLIGHTS"))
      .orderBy(col("NUM_FLIGHTS").desc).limit(10)
    joined.join(broadcast(top10), Seq("CITY"))
      .groupBy("CITY", "AIRLINE_NAME")
      .agg(avg("DEPARTURE_DELAY").as("Average Departure Delay"))
      .orderBy(col("Average Departure Delay").desc)
  }

  /** Per-airline delayed-flight counts and HALF_EVEN-rounded integer mean
    * delays, airline codes decoded with raw-code fallback (ref `avg_delay`
    * :362-441; the pandas `.round(0).astype(int)` + `map().fillna` pulled
    * into Spark as bround + map-literal decode). */
  def avgDelayPerAirline: DataFrame = {
    val late = delayed.filter(col("DEPARTURE_DELAY") > 0 || col("ARRIVAL_DELAY") > 0)
    val decode = typedLit(Decode.airlineNames)
    // fused: the reference runs two groupBys over the same filter; one pass
    // is result-identical and halves the shuffles.
    late.groupBy("AIRLINE")
      .agg(count(col("ARRIVAL_DELAY")).as("NUM_DELAYED_FLIGHTS"),
        avg("DEPARTURE_DELAY").as("AVG_DEPARTURE_DELAY"),
        avg("ARRIVAL_DELAY").as("AVG_ARRIVAL_DELAY"))
      .withColumn("AVG_TOTAL_DELAY",
        (col("AVG_DEPARTURE_DELAY") + col("AVG_ARRIVAL_DELAY")) / 2)
      .select(
        coalesce(try_element_at(decode, col("AIRLINE")), col("AIRLINE")).as("AIRLINE"),
        col("NUM_DELAYED_FLIGHTS"),
        bround(col("AVG_DEPARTURE_DELAY"), 0).cast("int").as("AVG_DEPARTURE_DELAY"),
        bround(col("AVG_ARRIVAL_DELAY"), 0).cast("int").as("AVG_ARRIVAL_DELAY"),
        bround(col("AVG_TOTAL_DELAY"), 0).cast("int").as("AVG_TOTAL_DELAY"))
      .orderBy(col("AVG_TOTAL_DELAY").desc)
  }

  /** Busiest-above-average routes with mean delays (ref `route_most_delay`
    * :173-213). */
  def routeMostDelay: DataFrame = {
    val routed = delayed.withColumn("ROUTE",
      concat_ws("-", col("ORIGIN_AIRPORT"), col("DESTINATION_AIRPORT")))
    val counts = routed.groupBy("ROUTE").count()
    val avgRoute = Rounding.halfEven(counts.agg(avg(col("count"))).first().getDouble(0))
    val popular = counts.filter(col("count") > avgRoute)
    routed.join(popular, Seq("ROUTE"))
      .groupBy("ROUTE")
      .agg(avg("DEPARTURE_DELAY").as("AVG_DEPARTURE_DELAY"),
        avg("ARRIVAL_DELAY").as("AVG_ARRIVAL_DELAY"))
      .withColumn("TOTAL_AVG_DELAY",
        (col("AVG_DEPARTURE_DELAY") + col("AVG_ARRIVAL_DELAY")) / 2)
      .orderBy(col("TOTAL_AVG_DELAY").desc)
      .limit(10)
  }

  /** Flights-vs-average-delay per origin airport (ref
    * `most_delay_airport_most_flight` :215-249). The reference computes two
    * aggregates and joins them (A11); fused into one — identical result. */
  def airportFlightsVsDelay: DataFrame =
    delayed.groupBy("ORIGIN_AIRPORT")
      .agg(count(lit(1)).as("NUM_FLIGHTS"),
        avg("DEPARTURE_DELAY").as("AVG_DEPARTURE_DELAY"))
      .orderBy(col("AVG_DEPARTURE_DELAY").desc)

  /** Total dep/arr delay minutes per city: full-outer airport merge with
    * coalesced key, zero-fill, left join to airports (null CITY kept as its
    * own group), city re-aggregation (ref `__cities_with_most_delays`
    * :251-321). */
  def citiesWithMostDelays: DataFrame = {
    val dep = delayed.groupBy("ORIGIN_AIRPORT")
      .agg(sum("DEPARTURE_DELAY").as("total_departure_delay")).as("dep")
    val arr = delayed.groupBy("DESTINATION_AIRPORT")
      .agg(sum("ARRIVAL_DELAY").as("total_arrival_delay")).as("arr")
    val air = airports.as("air")
    val merged = dep.join(arr,
        col("dep.ORIGIN_AIRPORT") === col("arr.DESTINATION_AIRPORT"), "outer")
      .select(
        coalesce(col("dep.ORIGIN_AIRPORT"), col("arr.DESTINATION_AIRPORT")).as("AIRPORT"),
        col("total_departure_delay"), col("total_arrival_delay"))
      .withColumn("total_delay",
        coalesce(col("total_departure_delay"), lit(0)) +
          coalesce(col("total_arrival_delay"), lit(0)))
      .na.fill(0)
    merged.join(broadcast(air), merged("AIRPORT") === col("air.IATA_CODE"), "left")
      .select(col("air.CITY").as("CITY"), col("total_departure_delay"),
        col("total_arrival_delay"), col("total_delay"))
      .groupBy("CITY")
      .agg(sum("total_departure_delay").as("total_departure_delay"),
        sum("total_arrival_delay").as("total_arrival_delay"),
        sum("total_delay").as("total_delay"))
      .orderBy(col("total_delay").desc)
  }

  /** Top-N cities melted wide→long for the stacked-bar plot (ref pandas
    * `melt` :325-340 → Dataset.unpivot). */
  def citiesWithMostDelaysLong(topN: Int = 10): DataFrame =
    citiesWithMostDelays.limit(topN)
      .unpivot(Array(col("CITY")),
        Array(col("total_departure_delay"), col("total_arrival_delay")),
        "Delay_Type", "Total_Delay")
      .withColumn("Delay_Type",
        when(col("Delay_Type") === "total_departure_delay", "Partenza").otherwise("Arrivo"))

  /** Hourly late-flight counts (null-skipping count(col)) ⟗ hourly mean
    * delays (ref `__time_slots` :343-360 + `__avg_calculation` :443-464 +
    * the join at :470-476). The reference's two mean-aggregates are fused. */
  def hourlyDelayStats: DataFrame = {
    val withHour = delayed.withColumn("HOUR_OF_DAY", hour(col("SCHEDULED_DEPARTURE")))
    val counts = withHour.filter(col("DEPARTURE_DELAY") > 0)
      .groupBy(col("HOUR_OF_DAY").as("HOUR"))
      .agg(count(col("DEPARTURE_DELAY")).as("Total Delays"))
    val avgs = withHour.groupBy("HOUR_OF_DAY")
      .agg(avg("DEPARTURE_DELAY").as("Average Departure Delay"),
        avg("ARRIVAL_DELAY").as("Average Arrival Delay"))
    counts.join(avgs, counts("HOUR") === avgs("HOUR_OF_DAY"), "outer")
      .select(col("HOUR").as("Hour"), col("Total Delays"),
        col("Average Departure Delay"), col("Average Arrival Delay"))
      .orderBy("Hour")
  }

  /** The reference's pandas hour→time-slot bucketing (labels and inclusive
    * edges verbatim from :500-511). */
  def timeSlot(hourCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hourCol.between(6, 11), "Mattina (6 - 12)")
      .when(hourCol.between(12, 18), "Pomeriggio (12 - 19)")
      .when(hourCol.between(19, 24), "Sera (19 - 1)")
      .otherwise("Notte (1 - 6)")

  /** Time-slot totals + mean-of-hourly-means (ref pandas groupby
    * :515,543-546 pulled into Spark — note the reference averages the HOURLY
    * means per slot, not the raw rows; reproduced exactly). */
  def delaysPerTimeSlot: DataFrame =
    hourlyDelayStats
      .withColumn("Time Slot", timeSlot(col("Hour")))
      .groupBy("Time Slot")
      .agg(sum("Total Delays").as("Total Delays"),
        avg("Average Departure Delay").as("Average Departure Delay"),
        avg("Average Arrival Delay").as("Average Arrival Delay"))
}
