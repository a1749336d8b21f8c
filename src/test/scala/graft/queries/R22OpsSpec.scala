package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-22 operators:
  * Gaussian-elimination OLS for the Granger F, direct Cochran cells,
  * matrix-identity partial correlation, direct odds-ratio algebra, and
  * a loop-built CCF.
  */
class R22OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def daily(t: String): Map[Long, Double] =
    Tables(spark, sf).events.filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1).toDouble)
      .toMap

  test("x_granger_lag1 matches the direct restricted-vs-full OLS F") {
    val x = daily("view"); val y = daily("purchase")
    val rows = y.keys.toSeq.sorted.flatMap { d =>
      for (yl <- y.get(d - 1); xl <- x.get(d - 1); yv <- y.get(d))
        yield (yv, yl, xl)
    }
    val n = rows.length
    // restricted: y ~ yl
    val myl = rows.map(_._2).sum / n; val my = rows.map(_._1).sum / n
    val rbRaw = rows.map(r => (r._2 - myl) * (r._1 - my)).sum /
      rows.map(r => (r._2 - myl) * (r._2 - myl)).sum
    def snap(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rb = snap(rbRaw); val ra = snap(my - rbRaw * myl)
    val sseR = rows.map(r => math.pow(r._1 - (ra + rb * r._2), 2)).sum
    // full: y ~ yl + xl via Gaussian elimination on normal equations
    val s1 = rows.map(_._2).sum; val s2 = rows.map(_._3).sum
    val s11 = rows.map(r => r._2 * r._2).sum
    val s22 = rows.map(r => r._3 * r._3).sum
    val s12 = rows.map(r => r._2 * r._3).sum
    val sy = rows.map(_._1).sum
    val sy1 = rows.map(r => r._1 * r._2).sum
    val sy2 = rows.map(r => r._1 * r._3).sum
    val a = Array(
      Array(n.toDouble, s1, s2, sy),
      Array(s1, s11, s12, sy1),
      Array(s2, s12, s22, sy2))
    for (c0 <- 0 until 3; r1 <- 0 until 3 if r1 != c0) {
      val f = a(r1)(c0) / a(c0)(c0)
      for (cc <- 0 to 3) a(r1)(cc) -= f * a(c0)(cc)
    }
    val (fa, fb, fc) = (snap(a(0)(3) / a(0)(0)), snap(a(1)(3) / a(1)(1)),
      snap(a(2)(3) / a(2)(2)))
    val sseF = rows.map(r =>
      math.pow(r._1 - (fa + fb * r._2 + fc * r._3), 2)).sum
    val fStat = (sseR - sseF) / (sseF / (n - 3))
    val row = SparkEntry.queries("x_granger_lag1")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - fb) < 1e-5)
    assert(math.abs(row.getDouble(2) - fc) < 1e-5)
    assert(math.abs(row.getDouble(3) - fStat) < 1e-2)
  }

  test("x_cochran_q matches the direct closed form") {
    val rows = Tables(spark, sf).orders
      .select(col("o_totalprice"), col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (
        if (r.getDouble(0) >= 150000) 1 else 0,
        if (Set("1-URGENT", "2-HIGH")(r.getString(1))) 1 else 0,
        if (r.getString(2) == "F") 1 else 0))
    val (ca, cb, cc) = (rows.map(_._1).sum.toDouble,
      rows.map(_._2).sum.toDouble, rows.map(_._3).sum.toDouble)
    val t = ca + cb + cc
    val r2 = rows.map(r => math.pow(r._1 + r._2 + r._3, 2)).sum
    val q = 6 * (math.pow(ca - t / 3, 2) + math.pow(cb - t / 3, 2)
      + math.pow(cc - t / 3, 2)) / (3 * t - r2)
    val row = SparkEntry.queries("x_cochran_q")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(row.getLong(1) === ca.toLong && row.getLong(2) === cb.toLong
      && row.getLong(3) === cc.toLong)
    assert(math.abs(row.getDouble(4) - q) < 1e-3)
  }

  test("x_partial_corr matches the first-order identity on direct correlations") {
    val rows = Tables(spark, sf).lineitem
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def corr2(xs: Array[Double], ys: Array[Double]): Double = {
      val mx = xs.sum / xs.length; val my = ys.sum / ys.length
      val num = xs.zip(ys).map(p => (p._1 - mx) * (p._2 - my)).sum
      num / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    }
    val rqp = corr2(rows.map(_._1), rows.map(_._2))
    val rqd = corr2(rows.map(_._1), rows.map(_._3))
    val rpd = corr2(rows.map(_._2), rows.map(_._3))
    val part = (rqp - rqd * rpd) /
      math.sqrt((1 - rqd * rqd) * (1 - rpd * rpd))
    val row = SparkEntry.queries("x_partial_corr")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(math.abs(row.getDouble(1) - rqp) < 1e-4)
    assert(math.abs(row.getDouble(4) - part) < 1e-3)
  }

  test("x_odds_ratio matches the direct 2x2 algebra; CI brackets the point") {
    val rows = Tables(spark, sf).orders
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect().map(r => (
        if (Set("1-URGENT", "2-HIGH")(r.getString(0))) 1 else 0,
        if (r.getString(1) == "F") 1 else 0))
    val n11 = rows.count(x => x._1 == 1 && x._2 == 1).toDouble
    val n10 = rows.count(x => x._1 == 1 && x._2 == 0).toDouble
    val n01 = rows.count(x => x._1 == 0 && x._2 == 1).toDouble
    val n00 = rows.count(x => x._1 == 0 && x._2 == 0).toDouble
    val orr = n11 * n00 / (n10 * n01)
    val se = math.sqrt(1 / n11 + 1 / n10 + 1 / n01 + 1 / n00)
    val row = SparkEntry.queries("x_odds_ratio")(spark, sf).collect().head
    assert(row.getLong(0) === n11.toLong && row.getLong(3) === n00.toLong)
    assert(math.abs(row.getDouble(4) - orr) < 1e-3)
    assert(math.abs(row.getDouble(5) - math.log(orr)) < 1e-3)
    assert(row.getDouble(6) < row.getDouble(4) && row.getDouble(4) < row.getDouble(7))
    assert(math.abs(row.getDouble(6) - math.exp(math.log(orr) - 1.96 * se)) < 1e-2)
  }

  test("x_ccf matches the loop-built cross-correlation; |ccf| <= 1") {
    val x = daily("view"); val y = daily("purchase")
    def snap(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mx = snap(x.values.sum / x.size)
    val my = snap(y.values.sum / y.size)
    val sxx = snap(x.values.map(v => (v - mx) * (v - mx)).sum)
    val syy = snap(y.values.map(v => (v - my) * (v - my)).sum)
    val out = SparkEntry.queries("x_ccf")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.keySet === (-7 to 7).toSet)
    (-7 to 7).foreach { k =>
      val nk = x.collect { case (d, xv) if y.contains(d + k) =>
        (xv - mx) * (y(d + k) - my)
      }.sum
      val want = nk / math.sqrt(sxx * syy)
      assert(math.abs(out(k) - want) < 1e-5, s"lag $k")
      assert(math.abs(out(k)) <= 1.0 + 1e-9)
    }
  }
}
