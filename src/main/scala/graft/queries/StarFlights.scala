package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end composites mirroring the reference's full analyses (not just
  * single operators), re-targeted onto the star schema — the §7.2 flagship
  * slice and friends.
  */
object StarFlights {

  /** The `most_delay` pipeline (ref: src/delayed_flights.py:16-88):
    * detail ⋈ dims → count per city → global mean (collect-scalar, banker's
    * rounding) → keep popular cities → re-join USING(city) → two means →
    * derived avg-of-avgs → ordered result. Used by SparkEntry.entry too. */
  def mostDelay(s: SparkSession, d: String): DataFrame = {
    val t = Tables(s, d)
    val detail = t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select("n_name", "l_quantity", "l_extendedprice")
    val counts = detail.groupBy("n_name").agg(count(lit(1)).as("num_rows"))
    val rawAvg = counts.agg(avg(col("num_rows"))).first().getDouble(0)
    val threshold = BigDecimal(rawAvg).setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val popular = counts.filter(col("num_rows") > lit(threshold))
    detail.join(broadcast(popular), Seq("n_name"))
      .groupBy("n_name")
      .agg(avg(col("l_quantity")).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"))
      .withColumn("total_avg", (col("avg_qty") + col("avg_price")) / 2)
      .orderBy(col("total_avg").desc, col("n_name"))
  }

  private[queries] val MostDelaySql =
    """WITH detail AS (
      |  SELECT n.n_name, l.l_quantity, l.l_extendedprice
      |  FROM lineitem l
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
      |counts AS (SELECT n_name, count(*) AS num_rows FROM detail GROUP BY n_name),
      |popular AS (SELECT n_name FROM counts
      |  WHERE num_rows > (SELECT round(avg(num_rows)) FROM counts))
      |SELECT d.n_name, avg(d.l_quantity) AS avg_qty,
      |  round(avg(d.l_extendedprice), 4) AS avg_price,
      |  (avg(d.l_quantity) + round(avg(d.l_extendedprice), 4)) / 2 AS total_avg
      |FROM detail d JOIN popular USING (n_name)
      |GROUP BY d.n_name
      |ORDER BY total_avg DESC, d.n_name""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q_most_delay", MostDelaySql)(mostDelay),

    // Cancellation-reason percentages (ref: src/cancelled_flights.py:64-82):
    // group-count + percentage-of-total via a broadcast 1-row cross join,
    // ordered desc — the pandas pct step pulled into Spark.
    QDef("q_reason_pct",
      """WITH c AS (SELECT o_orderpriority, count(*) AS cnt
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority),
        |t AS (SELECT sum(cnt) AS total FROM c)
        |SELECT o_orderpriority, cnt, cnt / total * 100 AS pct
        |FROM c, t ORDER BY cnt DESC, o_orderpriority""".stripMargin) { (s, d) =>
      val c = Tables(s, d).orders.filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      val tot = c.agg(sum(col("cnt")).as("total"))
      c.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("cnt"), (col("cnt") / col("total") * 100).as("pct"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
    },

    // The dep⟗arr totals merge (ref: delay_analysis src/delayed_flights.py:252-360):
    // two aggregates on different key families → full outer → coalesce key →
    // fill 0 → derived total → left join the dim → re-aggregate per dim group
    // (null group kept for unmatched keys).
    QDef("q_delay_totals",
      """WITH dep AS (SELECT l_suppkey AS k, CAST(sum(l_quantity) AS DOUBLE) AS dep_qty
        |  FROM lineitem GROUP BY 1),
        |arr AS (SELECT l_partkey % 150 AS k, CAST(sum(l_quantity) AS DOUBLE) AS arr_qty
        |  FROM lineitem GROUP BY 1),
        |merged AS (
        |  SELECT coalesce(dep.k, arr.k) AS k,
        |    coalesce(dep_qty, 0) AS dep_qty, coalesce(arr_qty, 0) AS arr_qty,
        |    coalesce(dep_qty, 0) + coalesce(arr_qty, 0) AS total_qty
        |  FROM dep FULL OUTER JOIN arr ON dep.k = arr.k)
        |SELECT s.s_name, CAST(sum(m.dep_qty) AS DOUBLE) AS dep_qty,
        |  CAST(sum(m.arr_qty) AS DOUBLE) AS arr_qty,
        |  CAST(sum(m.total_qty) AS DOUBLE) AS total_qty
        |FROM merged m LEFT JOIN supplier s ON m.k = s.s_suppkey
        |GROUP BY s.s_name""".stripMargin) { (s, d) =>
      val t = Tables(s, d)
      val dep = t.lineitem.groupBy(col("l_suppkey").as("k"))
        .agg(sum(col("l_quantity")).as("dep_qty"))
      val arr = t.lineitem.groupBy((col("l_partkey") % 150).as("k2"))
        .agg(sum(col("l_quantity")).as("arr_qty"))
      val merged = dep.join(arr, col("k") === col("k2"), "outer")
        .select(coalesce(col("k"), col("k2")).as("k"), col("dep_qty"), col("arr_qty"))
        .na.fill(0, Seq("dep_qty", "arr_qty"))
        .withColumn("total_qty", col("dep_qty") + col("arr_qty"))
      merged.join(broadcast(t.supplier), col("k") === col("s_suppkey"), "left")
        .groupBy("s_name")
        .agg(sum(col("dep_qty")).as("dep_qty"), sum(col("arr_qty")).as("arr_qty"),
          sum(col("total_qty")).as("total_qty"))
    }
  )
}
