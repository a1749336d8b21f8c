package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-14 statistics:
  * sort-based Kruskal-Wallis ranks, O(n²)-pair Kendall tau-b on a
  * sampled subset, a direct at-risk-table log-rank, naive-loop
  * Ljung-Box, and direct central-moment Jarque-Bera — all against the
  * distributed binned/contingency forms.
  */
class R14OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def segPrices: Array[(String, Double)] =
    Tables(spark, sf).orders
      .join(Tables(spark, sf).customer,
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))

  test("x_kruskal_wallis matches the direct sort-based H statistic") {
    val rows = segPrices
    val sorted = rows.map(_._2).sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.length }
    val byG = rows.groupBy(_._1)
    val n = rows.length.toDouble
    val rankSums = byG.map { case (g, vs) =>
      g -> vs.map(x => avgRank(x._2)).sum
    }
    val hRaw = 12.0 / (n * (n + 1)) * byG.map { case (g, vs) =>
      val r = rankSums(g); r * r / vs.length
    }.sum - 3 * (n + 1)
    val ties = sorted.groupBy(identity).values
      .map(t => t.length.toDouble * t.length * t.length - t.length).sum
    val h = hRaw / (1 - ties / (n * n * n - n))
    val out = SparkEntry.queries("x_kruskal_wallis")(spark, sf).collect()
    assert(out.length === byG.size)
    out.foreach { r =>
      val g = r.getString(0)
      assert(r.getLong(1) === byG(g).length.toLong)
      assert(math.abs(r.getDouble(2) - rankSums(g)) < 0.6, g)
      assert(math.abs(r.getDouble(3) - h) < 1e-3)
    }
  }

  test("x_kendall_tau matches the direct O(n^2) pair count") {
    val rows = Tables(spark, sf).lineitem
      .select(col("l_quantity"), col("l_discount"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    var conc = 0L; var disc = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val dq = java.lang.Double.compare(rows(i)._1, rows(j)._1)
        val dd = java.lang.Double.compare(rows(i)._2, rows(j)._2)
        if (dq != 0 && dd != 0) { if (dq == dd) conc += 1 else disc += 1 }
        j += 1
      }
      i += 1
    }
    val n = rows.length.toDouble
    val n0 = n * (n - 1) / 2
    def tiePairs(key: ((Double, Double)) => Double): Double =
      rows.groupBy(key).values.map(g => g.length * (g.length - 1) / 2.0).sum
    val tau = (conc - disc) /
      math.sqrt((n0 - tiePairs(_._1)) * (n0 - tiePairs(_._2)))
    val row = SparkEntry.queries("x_kendall_tau")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(row.getDouble(1) === conc.toDouble)
    assert(row.getDouble(2) === disc.toDouble)
    assert(math.abs(row.getDouble(3) - tau) < 1e-5)
  }

  test("x_logrank matches a direct at-risk-table computation") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"),
        graft.functions.TimeCols.eventMicros(date_trunc("hour", col("ts")))
          .as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tmax = ev.map(_._3).max / 3600000000L
    val signups = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3 / 3600000000L).min }
    val purchases = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3 / 3600000000L).min }
    val su = signups.toSeq.map { case (u, t0) =>
      purchases.get(u).filter(_ >= t0) match {
        case Some(t1) => (u % 2, t1 - t0, 1)
        case None     => (u % 2, tmax - t0, 0)
      }
    }
    val times = su.filter(_._3 == 1).map(_._2).distinct.sorted
    var oa = 0.0; var ea = 0.0; var va = 0.0
    times.foreach { t =>
      val atRisk = su.filter(_._2 >= t)
      val n = atRisk.length.toDouble
      val n0 = atRisk.count(_._1 == 0).toDouble
      val d = su.count(x => x._2 == t && x._3 == 1).toDouble
      val d0 = su.count(x => x._2 == t && x._3 == 1 && x._1 == 0).toDouble
      oa += d0; ea += n0 * d / n
      if (n > 1) va += d * (n0 / n) * (1 - n0 / n) * (n - d) / (n - 1)
    }
    val chi2 = (oa - ea) * (oa - ea) / va
    val row = SparkEntry.queries("x_logrank")(spark, sf).collect().head
    assert(row.getLong(0) === su.count(_._1 == 0).toLong)
    assert(row.getLong(1) === su.count(_._1 == 1).toLong)
    assert(row.getLong(2) === oa.toLong)
    assert(math.abs(row.getDouble(3) - ea) < 1e-3)
    assert(math.abs(row.getDouble(4) - chi2) < 1e-3)
  }

  test("x_ljung_box matches the direct portmanteau loop") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1).toDouble))
      .sortBy(_._1)
    val n = daily.length
    val mc = BigDecimal(daily.map(_._2).sum / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = daily.map { case (d, c) => (d, c - mc) }.toMap
    val s0 = z.values.map(x => x * x).sum
    val rho = (1 to 10).map { k =>
      k -> z.collect { case (d, za) if z.contains(d + k) => za * z(d + k) }.sum / s0
    }.toMap
    val out = SparkEntry.queries("x_ljung_box")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.keySet === (1 to 10).toSet)
    (1 to 10).foreach { k =>
      val q = n * (n + 2.0) * (1 to k).map(j => rho(j) * rho(j) / (n - j)).sum
      assert(math.abs(out(k)._1 - rho(k)) < 1e-5, s"rho k=$k")
      assert(math.abs(out(k)._2 - q) < 1e-3, s"Q k=$k")
    }
  }

  test("x_jarque_bera matches direct central moments per segment") {
    val rows = segPrices
    val out = SparkEntry.queries("x_jarque_bera")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val g = r.getString(0)
      val vs = rows.filter(_._1 == g).map(_._2)
      val mu = BigDecimal(vs.sum / vs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val z = vs.map(_ - mu)
      val m2 = z.map(x => x * x).sum / z.length
      val m3 = z.map(x => x * x * x).sum / z.length
      val m4 = z.map(x => x * x * x * x).sum / z.length
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2) - 3
      val jb = vs.length / 6.0 * (skew * skew + kurt * kurt / 4)
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - skew) < 1e-3, g)
      assert(math.abs(r.getDouble(3) - kurt) < 1e-3, g)
      assert(math.abs(r.getDouble(4) - jb) < 0.5, g)
    }
  }
}
