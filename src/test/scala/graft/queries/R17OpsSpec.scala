package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-17 operators:
  * brute-force triple enumeration, sort-based RFM quintiles, matrix-free
  * OLS checks for the harmonic fit, direct McNemar cells, and loop-based
  * Cronbach variance decomposition.
  */
class R17OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_eclat_triples matches brute-force basket triple counts") {
    val items = Tables(spark, sf).lineitem
      .join(Tables(spark, sf).part, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = items.map(_._1).distinct.length.toDouble
    val direct = items.groupBy(_._1).values.flatMap { es =>
      val b = es.map(_._2).distinct.sorted
      for {
        i <- b.indices; j <- (i + 1) until b.length; k <- (j + 1) until b.length
      } yield (b(i), b(j), b(k))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 10).toMap
    val out = SparkEntry.queries("x_eclat_triples")(spark, sf).collect()
    assert(out.length === direct.size)
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getString(2))
      assert(r.getString(0) < r.getString(1) && r.getString(1) < r.getString(2))
      assert(direct(key) === r.getLong(3).toInt, key)
      assert(math.abs(r.getDouble(4) - r.getLong(3) / nOrders) < 1e-5)
    }
  }

  test("x_rfm_segments: cells partition all customers; quintiles balanced per axis") {
    val out = SparkEntry.queries("x_rfm_segments")(spark, sf).collect()
    val nCust = Tables(spark, sf).orders
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(out.map(_.getLong(3)).sum === nCust)
    // each axis's quintile sizes follow the ntile contract (max-min <= 1)
    Seq(0, 1, 2).foreach { axis =>
      val sizes = out.groupBy(_.getInt(axis)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(sizes.keySet === (1 to 5).toSet, s"axis $axis")
      assert(sizes.values.max - sizes.values.min <= 1, s"axis $axis")
    }
    out.foreach(r => assert(r.getDouble(4) > 0))
  }

  test("x_harmonic_fit satisfies the normal equations and R2 bounds") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1).toDouble))
      .sortBy(_._1)
    val i0 = daily.head._1
    val pts = daily.map { case (d, c) => ((d - i0).toDouble, c) }
    val row = SparkEntry.queries("x_harmonic_fit")(spark, sf).collect().head
    assert(row.getLong(0) === pts.length.toLong)
    // re-derive the OLS coefficients by solving the 3x3 system directly
    val x1 = pts.map(p => math.cos(2 * math.Pi * p._1 / 7))
    val x2 = pts.map(p => math.sin(2 * math.Pi * p._1 / 7))
    val y = pts.map(_._2)
    val n = pts.length.toDouble
    // Gaussian elimination on the normal equations
    val a = Array(
      Array(n, x1.sum, x2.sum, y.sum),
      Array(x1.sum, x1.map(v => v * v).sum, x1.zip(x2).map(p => p._1 * p._2).sum,
        y.zip(x1).map(p => p._1 * p._2).sum),
      Array(x2.sum, x1.zip(x2).map(p => p._1 * p._2).sum,
        x2.map(v => v * v).sum, y.zip(x2).map(p => p._1 * p._2).sum))
    for (col0 <- 0 until 3; r1 <- 0 until 3 if r1 != col0) {
      val f = a(r1)(col0) / a(col0)(col0)
      for (c <- 0 to 3) a(r1)(c) -= f * a(col0)(c)
    }
    val (c0, ca, cb) = (a(0)(3) / a(0)(0), a(1)(3) / a(1)(1), a(2)(3) / a(2)(2))
    assert(math.abs(row.getDouble(1) - c0) < 1e-4, "a0")
    assert(math.abs(row.getDouble(2) - math.sqrt(ca * ca + cb * cb)) < 1e-3,
      "amplitude")
    val r2 = row.getDouble(4)
    assert(r2 > 0 && r2 <= 1)
    val phase = row.getDouble(3)
    assert(phase >= -3.5 && phase <= 3.5)
  }

  test("x_mcnemar matches direct discordant cells") {
    val rows = Tables(spark, sf).orders
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (
        if (r.getDouble(0) >= 150000) 1 else 0,
        if (Set("1-URGENT", "2-HIGH")(r.getString(1))) 1 else 0))
    val n10 = rows.count(x => x._1 == 1 && x._2 == 0).toLong
    val n01 = rows.count(x => x._1 == 0 && x._2 == 1).toLong
    val chi2 = math.pow(math.abs(n10 - n01) - 1, 2).toDouble / (n10 + n01)
    val row = SparkEntry.queries("x_mcnemar")(spark, sf).collect().head
    assert(row.getLong(0) === n10 && row.getLong(1) === n01)
    assert(math.abs(row.getDouble(2) - chi2) < 1e-3)
  }

  test("x_cronbach_alpha matches the direct variance decomposition") {
    val its = Tables(spark, sf).lineitem
      .groupBy("l_orderkey").agg(
        sum(col("l_quantity")).as("i1"),
        (sum(col("l_extendedprice")) / 1000).as("i2"),
        (sum(col("l_extendedprice") * col("l_discount")) / 100).as("i3"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    def varS(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val (v1, v2, v3) = (varS(its.map(_._1).toSeq), varS(its.map(_._2).toSeq),
      varS(its.map(_._3).toSeq))
    val vt = varS(its.map(t => t._1 + t._2 + t._3).toSeq)
    val alpha = 1.5 * (1 - (v1 + v2 + v3) / vt)
    val row = SparkEntry.queries("x_cronbach_alpha")(spark, sf).collect().head
    assert(row.getLong(0) === its.length.toLong)
    assert(math.abs(row.getDouble(1) - (v1 + v2 + v3)) < 1e-2)
    assert(math.abs(row.getDouble(2) - vt) < 1e-2)
    assert(math.abs(row.getDouble(3) - alpha) < 1e-4)
    assert(row.getDouble(3) <= 1.0)
  }
}
