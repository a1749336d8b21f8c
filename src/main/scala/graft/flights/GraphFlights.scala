package graft.flights

import graft.graph.GraphMetrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's GraphFrames analyses
  * (/root/reference/src/graphframes_flights.py:15-155) without GraphFrames:
  * airport and state connectivity graphs, inDegrees / static PageRank /
  * triangle count, each top-15 like the reference's `.orderBy.limit(15)`.
  *
  * Graph math is in [[graft.graph.GraphMetrics]] (pure-DataFrame, with
  * GraphX cross-check variants); here we only build the vertex/edge frames
  * exactly as the reference does.
  */
final class GraphFlights(delayed: DataFrame, airports: DataFrame) {

  /** Airport multigraph: one edge per delayed flight (ref :27-34). */
  def airportEdges: DataFrame =
    delayed.select(col("ORIGIN_AIRPORT").as("src"), col("DESTINATION_AIRPORT").as("dst"))

  private def airportVertices: DataFrame =
    airports.withColumnRenamed("IATA_CODE", "id").select("id")

  /** Top-15 airports by in-degree (parallel edges counted, ref :37-41). */
  def airportInDegrees: DataFrame =
    GraphMetrics.inDegrees(airportEdges)
      .orderBy(col("inDegree").desc, col("id")).limit(15)

  /** Top-15 airports by static PageRank (resetProb=0.15, maxIter=10 —
    * ref :44-46); isolated airports from the vertex table keep resetProb. */
  def airportPageRank: DataFrame =
    GraphMetrics.staticPageRank(airportEdges, 0.15, 10, Some(airportVertices))
      .withColumnRenamed("pr", "pagerank")
      .orderBy(col("pagerank").desc, col("id")).limit(15)

  /** Top-15 airports by triangle count (canonicalized edges, ref :48-49). */
  def airportTriangleCount: DataFrame =
    GraphMetrics.triangleCounts(airportEdges)
      .withColumnRenamed("triangles", "count")
      .orderBy(col("count").desc, col("id")).limit(15)

  /** State-pair frame via the reference's rename-order-sensitive double
    * airport join (ref :98-105): the first USING-join consumes STATE via an
    * immediate rename, the second join re-introduces STATE. */
  def flightsWithStates: DataFrame =
    delayed
      .join(broadcast(airports.withColumnRenamed("IATA_CODE", "ORIGIN_AIRPORT")), Seq("ORIGIN_AIRPORT"))
      .withColumnRenamed("STATE", "ORIGIN_STATE")
      .join(broadcast(airports.withColumnRenamed("IATA_CODE", "DESTINATION_AIRPORT")), Seq("DESTINATION_AIRPORT"))
      .withColumnRenamed("STATE", "DESTINATION_STATE")
      .select("ORIGIN_STATE", "DESTINATION_STATE")

  /** State vertex set: union + distinct of both endpoints (ref :108-109). */
  def stateVertices: DataFrame =
    flightsWithStates.select("ORIGIN_STATE")
      .union(flightsWithStates.select("DESTINATION_STATE"))
      .distinct().withColumnRenamed("ORIGIN_STATE", "id")

  def stateEdges: DataFrame =
    flightsWithStates
      .withColumnRenamed("ORIGIN_STATE", "src")
      .withColumnRenamed("DESTINATION_STATE", "dst")

  /** Top-15 states by in-degree (ref :119-123). */
  def stateInDegrees: DataFrame =
    GraphMetrics.inDegrees(stateEdges)
      .orderBy(col("inDegree").desc, col("id")).limit(15)

  /** Top-15 states by static PageRank (ref :131-133). */
  def statePageRank: DataFrame =
    GraphMetrics.staticPageRank(stateEdges, 0.15, 10, Some(stateVertices))
      .withColumnRenamed("pr", "pagerank")
      .orderBy(col("pagerank").desc, col("id")).limit(15)
}
