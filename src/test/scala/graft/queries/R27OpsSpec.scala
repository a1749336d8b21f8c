package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-27 operators. */
class R27OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_power_analysis matches the closed form on direct arm rates") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val s0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val p1 = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val arms = s0.toSeq.map { case (u, t0) =>
      (u % 2, if (p1.get(u).exists(_ >= t0)) 1 else 0)
    }
    def rate(a: Long) = {
      val xs = arms.filter(_._1 == a); xs.map(_._2).sum.toDouble / xs.length
    }
    val (pa, pb) = (rate(0), rate(1))
    val pbar = (pa + pb) / 2; val delta = math.abs(pa - pb)
    val n = math.ceil(math.pow(1.959964 * math.sqrt(2 * pbar * (1 - pbar))
      + 0.8416212 * math.sqrt(pa * (1 - pa) + pb * (1 - pb)), 2)
      / (delta * delta)).toLong
    val row = SparkEntry.queries("x_power_analysis")(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - pa) < 1e-5)
    assert(math.abs(row.getDouble(1) - pb) < 1e-5)
    assert(row.getLong(3) === n)
    assert(row.getLong(3) > 0)
  }

  test("x_seasonality_strength matches the direct dow-mean removal") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1).toDouble))
    val epoch0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    def snap(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDow = daily.groupBy(d => ((d._1.toEpochDay - epoch0) % 7).toInt)
      .view.mapValues(xs => snap(xs.map(_._2).sum / xs.length)).toMap
    val resid = daily.map { case (d, c) =>
      c - byDow(((d.toEpochDay - epoch0) % 7).toInt)
    }
    def varS(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val vt = snap(varS(daily.map(_._2).toSeq))
    val vr = snap(varS(resid.toSeq))
    val row = SparkEntry.queries("x_seasonality_strength")(spark, sf)
      .collect().head
    assert(row.getLong(0) === daily.length.toLong)
    assert(math.abs(row.getDouble(1) - vt) < 1e-4)
    assert(math.abs(row.getDouble(2) - vr) < 1e-4)
    assert(math.abs(row.getDouble(3) - math.max(0, 1 - vr / vt)) < 1e-3)
    assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
  }

  test("x_kl_lang_drift matches the direct KL; all non-negative") {
    val rows = Tables(spark, sf).documents
      .select(col("source"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val langP = rows.groupBy(_._2).view.mapValues(_.size / n).toMap
    val out = SparkEntry.queries("x_kl_lang_drift")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val xs = rows.filter(_._1 == r.getString(0))
      val kl = xs.groupBy(_._2).values.map { g =>
        val p = g.size.toDouble / xs.length
        p * math.log(p / langP(g.head._2))
      }.sum
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(2) - kl) < 1e-5, r.getString(0))
      assert(r.getDouble(2) >= -1e-9)
    }
  }

  test("x_simpson_check matches direct pooled and per-stratum signs") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (Set("1-URGENT", "2-HIGH")(r.getString(2))) 1 else 0))
    def diff(xs: Seq[(String, Double, Int)]) = {
      val t = xs.filter(_._3 == 1).map(_._2)
      val c = xs.filter(_._3 == 0).map(_._2)
      t.sum / t.length - c.sum / c.length
    }
    val pooled = diff(rows.toSeq)
    val strata = rows.groupBy(_._1).values.map(xs => diff(xs.toSeq))
    val row = SparkEntry.queries("x_simpson_check")(spark, sf).collect().head
    assert(math.abs(row.getDouble(0) - pooled) < 1e-3)
    assert(row.getLong(1) === strata.count(_ * pooled > 0).toLong)
    assert(row.getLong(2) === strata.count(_ * pooled < 0).toLong)
    assert(row.getBoolean(3) === strata.exists(_ * pooled < 0))
  }

  test("x_hac_se matches the direct Bartlett-weighted variance") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(avg(col("value")), 6).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1)
    val n = daily.length
    def snap(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val my = snap(daily.map(_._2).sum / n)
    val z = daily.map { case (d, v) => (d, v - my) }.toMap
    val g0 = z.values.map(x => x * x).sum / n
    val gs = (1 to 5).map { k =>
      k -> z.collect { case (d, za) if z.contains(d + k) => za * z(d + k) }.sum / n
    }
    val wsum = gs.map { case (k, g) => (1 - k / 6.0) * g }.sum
    val seIid = math.sqrt(g0 / n)
    val seHac = math.sqrt((g0 + 2 * wsum) / n)
    val row = SparkEntry.queries("x_hac_se")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - seIid) < 1e-5)
    assert(math.abs(row.getDouble(2) - seHac) < 1e-5)
    assert(math.abs(row.getDouble(3) - seHac / seIid) < 1e-3)
  }
}
