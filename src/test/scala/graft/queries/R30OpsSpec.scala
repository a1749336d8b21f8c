package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-30 fits. */
class R30OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def snap(v: Double, dp: Int) =
    BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x_logistic_glm replays 3 Newton steps on the collected bin frame") {
    val bins = Tables(spark, sf).orders
      .select((col("o_totalprice") / lit(100000.0)).as("xs"),
        when(col("o_orderpriority") === "1-URGENT", 1.0).otherwise(0.0).as("y"))
      .groupBy(floor(col("xs") * 100).cast("bigint").as("b"))
      .agg(avg(col("xs")).as("x"), count(lit(1)).cast("double").as("n"),
        sum(col("y")).as("yb"))
      .collect().toSeq.map(r => (snap(r.getDouble(1), 6), r.getDouble(2), r.getDouble(3)))
    var (b0, b1) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      var (g0, g1, h00, h01, h11) = (0.0, 0.0, 0.0, 0.0, 0.0)
      for ((x, n, yb) <- bins) {
        val mu = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        g0 += n * (yb / n - mu); g1 += n * x * (yb / n - mu)
        h00 += n * mu * (1 - mu); h01 += n * x * mu * (1 - mu)
        h11 += n * x * x * mu * (1 - mu)
      }
      val det = h00 * h11 - h01 * h01
      val nb0 = snap(b0 + (h11 * g0 - h01 * g1) / det, 9)
      val nb1 = snap(b1 + (h00 * g1 - h01 * g0) / det, 9)
      b0 = nb0; b1 = nb1
    }
    val row = SparkEntry.queries("x_logistic_glm")(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - b0) < 1e-6)
    assert(math.abs(row.getDouble(1) - b1) < 1e-6)
    // slope should be negative-ish or at least finite; the released
    // deviance must be positive and finite
    assert(row.getDouble(4) > 0 && !row.getDouble(4).isNaN)
  }

  test("x_poisson_glm replays 3 Newton steps on the daily frame and " +
      "converges toward the observed mean structure") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().toSeq.map(r => (r.getDate(0).toLocalDate, r.getLong(1).toDouble))
      .sortBy(_._1.toEpochDay)
    val start = daily.map(_._1.toEpochDay).min
    val pts = daily.map { case (d, y) => ((d.toEpochDay - start).toDouble, y) }
    var (b0, b1) = (snap(math.log(pts.map(_._2).sum / pts.length), 9), 0.0)
    for (_ <- 1 to 3) {
      var (g0, g1, h00, h01, h11) = (0.0, 0.0, 0.0, 0.0, 0.0)
      for ((i, y) <- pts) {
        val mu = math.exp(b0 + b1 * i)
        g0 += y - mu; g1 += (y - mu) * i
        h00 += mu; h01 += mu * i; h11 += mu * i * i
      }
      val det = h00 * h11 - h01 * h01
      val nb0 = snap(b0 + (h11 * g0 - h01 * g1) / det, 9)
      val nb1 = snap(b1 + (h00 * g1 - h01 * g0) / det, 9)
      b0 = nb0; b1 = nb1
    }
    val row = SparkEntry.queries("x_poisson_glm")(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - b0) < 1e-6)
    assert(math.abs(row.getDouble(1) - b1) < 1e-6)
    assert(math.abs(row.getDouble(2) - snap(math.exp(b0 + b1 * 30), 4)) < 1e-3)
  }

  test("x_markov_stationary sums to ~1 and is near a fixed point of P") {
    val rows = SparkEntry.queries("x_markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows.values.sum - 1.0) < 1e-3)
    // fixed point: pi P ~= pi after the iteration budget
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime, r.getLong(3)))
    val byUser = ev.groupBy(_._1).values
    val trans = byUser.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq
    val counts = trans.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val outs = trans.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val states = rows.keySet
    val applied = states.map { j =>
      j -> states.toSeq.map { i =>
        rows(i) * counts.getOrElse((i, j), 0.0) / outs(i)
      }.sum
    }.toMap
    states.foreach { st =>
      assert(math.abs(applied(st) - rows(st)) < 5e-3, s"state $st not stationary")
    }
  }

  test("x_pca3_closed eigenvalues annihilate the characteristic polynomial") {
    val c = Tables(spark, sf).lineitem.agg(
      corr(col("l_quantity"), col("l_discount")).as("a12"),
      corr(col("l_quantity"), col("l_tax")).as("a13"),
      corr(col("l_discount"), col("l_tax")).as("a23")).collect().head
    val (a12, a13, a23) =
      (snap(c.getDouble(0), 6), snap(c.getDouble(1), 6), snap(c.getDouble(2), 6))
    def det(l: Double): Double = {
      val d = 1 - l
      d * (d * d - a23 * a23) - a12 * (a12 * d - a23 * a13) +
        a13 * (a12 * a23 - d * a13)
    }
    val row = SparkEntry.queries("x_pca3_closed")(spark, sf).collect().head
    val eigs = Seq(row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(math.abs(eigs.sum - 3.0) < 1e-4) // trace
    eigs.foreach(l => assert(math.abs(det(l)) < 1e-6, s"det at $l"))
    assert(eigs(0) >= eigs(1) - 1e-9 && eigs(1) >= eigs(2) - 1e-9)
  }

  test("x_ridge satisfies the regularized normal equations") {
    val m = Tables(spark, sf).lineitem.agg(
      avg(col("l_quantity")), avg(col("l_discount")),
      avg(col("l_extendedprice")),
      var_samp(col("l_quantity")), var_samp(col("l_discount")),
      covar_samp(col("l_quantity"), col("l_discount")),
      covar_samp(col("l_quantity"), col("l_extendedprice")),
      covar_samp(col("l_discount"), col("l_extendedprice"))).collect().head
    val Seq(m1, m2, my, s11, s22, s12, s1y, s2y) =
      (0 to 7).map(i => snap(m.getDouble(i), 6))
    val row = SparkEntry.queries("x_ridge")(spark, sf).collect().head
    val (b0, b1, b2) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // (S + lambda I) b = s_y
    assert(math.abs((s11 + 0.01) * b1 + s12 * b2 - s1y) < 1e-2)
    assert(math.abs(s12 * b1 + (s22 + 0.01) * b2 - s2y) < 1e-2)
    assert(math.abs(my - b1 * m1 - b2 * m2 - b0) < 1e-3)
  }
}
