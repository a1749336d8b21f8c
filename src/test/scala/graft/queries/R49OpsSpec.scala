package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-49 batch (ARCH LM, von Neumann,
  * Buishand, exhaustive breakpoint, I-MR chart, p-chart, ICC, KZ
  * filter) — each checked against an independent brute-force
  * recomputation from the collected daily series. */
class R49OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (day, count, revenue) daily series, date-sorted. */
  private def dailySeries(): Array[(java.sql.Date, Long, Double)] =
    graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("c"), sum("o_totalprice").as("r"))
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1.getTime)

  private def erfc(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
  }

  test("x_arch_lm: matches a brute-force auxiliary OLS on squared " +
      "innovations") {
    val r = run("x_arch_lm").collect().head
    val (np, r2, lm, p) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val y = dailySeries().map(_._2.toDouble)
    val my = rnd(y.sum / y.length, 6)
    val e2 = y.map(v => (v - my) * (v - my))
    val pairs = e2.zip(e2.tail) // (e2l, e2)
    assert(pairs.length == np)
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxx = pairs.map(q => q._1 * q._1).sum
    val syy = pairs.map(q => q._2 * q._2).sum
    val sxy = pairs.map(q => q._1 * q._2).sum
    val rr2 = math.pow(m * sxy - sx * sy, 2) /
      ((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(math.abs(r2 - rr2) < 1e-5)
    assert(math.abs(lm - m * rr2) < 1e-3)
    assert(math.abs(p - erfc(math.sqrt(m * rr2 / 2))) < 1e-5)
  }

  test("x_von_neumann: matches the brute-force successive-difference " +
      "ratio") {
    val r = run("x_von_neumann").collect().head
    val (n, eta, z) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val y = dailySeries().map(t => rnd(t._3 / 1e6, 6))
    assert(y.length == n)
    val my = rnd(y.sum / y.length, 6)
    val sd2 = y.zip(y.tail).map { case (a, b) => (b - a) * (b - a) }.sum
    val ss = y.map(v => (v - my) * (v - my)).sum
    assert(math.abs(eta - sd2 / ss) < 1e-5)
    val nD = n.toDouble
    assert(math.abs(z - (sd2 / ss - 2) /
      math.sqrt(4 * (nD - 2) / (nD * nD - 1))) < 1e-3)
  }

  test("x_buishand: matches brute-force partial-sum range and peak day") {
    val r = run("x_buishand").collect().head
    val (n, rs, rsc, peak) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDate(3))
    val s = dailySeries()
    val y = s.map(_._2.toDouble)
    assert(y.length == n)
    val my = rnd(y.sum / y.length, 6)
    val sk = y.scanLeft(0.0)((acc, v) => acc + (v - my)).tail
    val sy = math.sqrt(y.map(v => (v - my) * (v - my)).sum / y.length)
    assert(math.abs(rs - (sk.max - sk.min) / sy) < 1e-3)
    assert(math.abs(rsc - rs / math.sqrt(y.length.toDouble)) < 1e-3)
    val pi = sk.zipWithIndex.maxBy(t => (math.abs(t._1), -t._2))._2
    assert(peak.toString == s(pi)._1.toString)
  }

  test("x_break_sse: matches the brute-force exhaustive split scan") {
    val r = run("x_break_sse").collect().head
    val (bd, bi, n, sseF, sseS, f) = (r.getDate(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val s = dailySeries()
    // replicate the engine's exact-cents → HALF_UP-dollars quantization
    val y = s.map { t =>
      val yc = math.round(t._3 * 100.0)
      ((yc + 50 - (yc + 50) % 100) / 100).toDouble / 1e6
    }
    assert(y.length == n)
    def sse(a: Array[Double]) = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum
    }
    val full = sse(y)
    val cands = (5 to y.length - 5).map { t =>
      (rnd(sse(y.take(t)) + sse(y.drop(t)), 6), t)
    }
    val (bestSse, bestT) = cands.minBy(identity)
    assert(bi == bestT && bd.toString == s(bestT - 1)._1.toString)
    assert(math.abs(sseS - bestSse) < 2e-3)
    assert(math.abs(sseF - full) < 2e-3)
    val fB = (full - bestSse) / (bestSse / (n - 2))
    assert(math.abs(f - fB) < 0.05)
  }

  test("x_imr_chart: limits, beyond-limit count and long-run count " +
      "match brute force") {
    val r = run("x_imr_chart").collect().head
    val (n, center, lcl, ucl, beyond, longRuns) = (r.getLong(0),
      r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
      r.getLong(5))
    val rows = graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(round(avg("o_totalprice"), 6).as("y"))
      .collect().map(x => (x.getDate(0), x.getDouble(1)))
      .sortBy(_._1.getTime)
    val y = rows.map(_._2)
    assert(y.length == n)
    val c = rnd(y.sum / y.length, 6)
    assert(center == rnd(c, 4))
    val mrbar = rnd(y.zip(y.tail)
      .map { case (a, b) => math.abs(b - a) }.sum / (y.length - 1), 6)
    assert(ucl == rnd(c + 2.66 * mrbar, 4))
    assert(lcl == rnd(c - 2.66 * mrbar, 4))
    assert(beyond ==
      y.count(v => v > c + 2.66 * mrbar || v < c - 2.66 * mrbar))
    // maximal one-side runs of length >= 9
    val sides = y.map(v => if (v > c) 1 else if (v < c) -1 else 0)
    var runs = 0L
    var cur = 0
    var len = 0
    (sides :+ 0).foreach { sd =>
      if (sd == cur) len += 1
      else {
        if (cur != 0 && len >= 9) runs += 1
        cur = sd; len = 1
      }
    }
    assert(longRuns == runs)
  }

  test("x_p_chart: p-bar and out-of-control count match brute force") {
    val r = run("x_p_chart").collect().head
    val (n, pbar, ooc) = (r.getLong(0), r.getDouble(1), r.getLong(2))
    val rows = graft.Tables(spark, sf).orders
      .select(col("o_orderdate").cast("date").as("d"),
        (substring(col("o_orderpriority"), 1, 1).cast("int") <= 2)
          .as("hit"))
      .collect().map(x => (x.getDate(0).toString, x.getBoolean(1)))
    // NB .values first — mapping the grouped Map to (n, hits) pairs
    // would dedup days with identical counts
    val byDay = rows.groupBy(_._1).values.toArray.map(a =>
      (a.length.toLong, a.count(_._2).toLong))
    assert(byDay.length == n)
    val pb = byDay.map(_._2).sum.toDouble / byDay.map(_._1).sum
    assert(pbar == rnd(pb, 6))
    val cnt = byDay.count { case (nd, x) =>
      val lim = 3 * math.sqrt(pb * (1 - pb) / nd)
      val p = x.toDouble / nd
      p > pb + lim || p < pb - lim
    }
    assert(ooc == cnt)
  }

  test("x_icc: matches brute-force unbalanced one-way ANOVA") {
    val r = run("x_icc").collect().head
    val (n, k, msb, msw, n0, icc) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val t = graft.Tables(spark, sf)
    val rows = t.orders
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), (col("o_totalprice") / 1e3).as("v"))
      .collect()
      .map(x => (x.getAs[Number](0).longValue, x.getDouble(1)))
    assert(rows.length == n)
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toArray
    assert(groups.length == k)
    val nn = n.toDouble
    val kD = k.toDouble
    val st = rows.map(_._2).sum
    val sb = groups.map(g => math.pow(g.sum, 2) / g.length).sum
    val qt = rows.map(x => x._2 * x._2).sum
    val msbB = (sb - st * st / nn) / (kD - 1)
    val mswB = (qt - sb) / (nn - kD)
    val n0B = (nn - groups.map(g =>
      g.length.toDouble * g.length).sum / nn) / (kD - 1)
    assert(math.abs(msb - msbB) < 1e-3)
    assert(math.abs(msw - mswB) < 1e-3)
    assert(math.abs(n0 - n0B) < 1e-3)
    assert(math.abs(icc - (msbB - mswB) / (msbB + (n0B - 1) * mswB))
      < 1e-5)
    assert(icc > -1 && icc < 1)
  }

  test("x_kz_filter: matches a brute-force three-pass snapped moving " +
      "average") {
    val r = run("x_kz_filter").collect().head
    val (n, vr, lastF) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val y0 = dailySeries().map(_._2.toDouble)
    assert(y0.length == n)
    def pass(a: Array[Double]) = a.indices.map { i =>
      val lo = math.max(0, i - 7)
      val hi = math.min(a.length - 1, i + 7)
      rnd(a.slice(lo, hi + 1).sum / (hi - lo + 1), 6)
    }.toArray
    val y3 = pass(pass(pass(y0)))
    val m = rnd(y0.sum / y0.length, 6)
    val raw = y0.map(v => (v - m) * (v - m)).sum
    val fss = y3.map(v => (v - m) * (v - m)).sum
    assert(math.abs(vr - fss / raw) < 1e-5)
    assert(lastF == rnd(y3.last, 6))
    assert(vr < 1.0, "smoothing must reduce variance")
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_arch_lm" -> "x_sql_arch",
      "x_von_neumann" -> "x_sql_vn",
      "x_buishand" -> "x_sql_buishand",
      "x_break_sse" -> "x_sql_break",
      "x_p_chart" -> "x_sql_pchart",
      "x_icc" -> "x_sql_icc",
      "x_kz_filter" -> "x_sql_kz")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
