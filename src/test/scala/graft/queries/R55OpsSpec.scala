package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-55 EWMA control chart —
  * brute-force recomputation of the finite-memory recursion and the
  * time-varying limits from the collected daily series. */
class R55OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_ewma_chart: summary matches a brute-force finite-memory " +
      "EWMA with Montgomery limits") {
    val row = SparkEntry.queries("x_ewma_chart")(spark, sf)
      .collect().head
    val ys = graft.Tables(spark, sf).orders
      .groupBy(org.apache.spark.sql.functions.col("o_orderdate")
        .cast("date").as("d"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("y"))
      .orderBy("d").collect().map(_.getLong(1).toDouble)
    val n = ys.length
    assert(row.getLong(0) == n.toLong)
    val mu = ys.sum / n
    val sd = math.sqrt(ys.map(y => (y - mu) * (y - mu)).sum / (n - 1))
    assert(math.abs(row.getDouble(1) - mu) < 1e-4, "center")
    val lam = 0.2; val k = 60
    val w = (0 until k).map(i => math.pow(1 - lam, i))
    var beyond = 0L
    var maxScore = 0.0
    for (t <- 0 until n) {
      val lags = (0 until math.min(k, t + 1))
      val z = lags.map(i => w(i) * ys(t - i)).sum /
        lags.map(w(_)).sum
      val tt = math.min(t + 1, k)
      val wsq = {
        val i = math.min(tt, k - 1)
        w(i) * w(i)
      }
      val hw = 3.0 * sd * math.sqrt(lam / (2 - lam) * (1 - wsq))
      if (z > mu + hw || z < mu - hw) beyond += 1
      maxScore = math.max(maxScore, math.abs(z - mu) / hw)
    }
    assert(row.getLong(2) == beyond, "n_beyond")
    assert(math.abs(row.getDouble(3) - maxScore) < 1e-3, "max_score")
  }
}
