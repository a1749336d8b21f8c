package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Round-20 checks: SQL twins must return bit-identical frames to their
  * Dataset siblings; the chi-square, dispersion, and Durbin-Watson
  * statistics re-derive directly.
  */
class R20OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("x_sql_woe is row-identical to x_woe_iv") {
    assert(sortedRows("x_sql_woe") === sortedRows("x_woe_iv"))
  }

  test("x_sql_kappa is row-identical to x_cohens_kappa") {
    assert(sortedRows("x_sql_kappa") === sortedRows("x_cohens_kappa"))
  }

  test("x_chi2_dow matches direct weekday counts from epoch arithmetic") {
    val days = Tables(spark, sf).events
      .select(to_date(col("ts")).as("d")).collect()
      .map(_.getDate(0).toLocalDate)
    val epoch0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val counts = days.groupBy(d => ((d.toEpochDay - epoch0) % 7).toInt)
      .view.mapValues(_.size.toLong).toMap
    val total = days.length.toDouble
    val out = SparkEntry.queries("x_chi2_dow")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet === counts.keySet)
    out.foreach { r =>
      val obs = counts(r.getInt(0))
      assert(r.getLong(1) === obs)
      assert(math.abs(r.getDouble(2) - total / 7) < 1e-3)
      val chi = math.pow(obs - total / 7, 2) / (total / 7)
      assert(math.abs(r.getDouble(3) - chi) < 1e-4)
    }
  }

  test("x_cv_profile matches direct moments and tail shares") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val out = SparkEntry.queries("x_cv_profile")(spark, sf).collect()
    out.foreach { r =>
      val g = r.getString(0)
      val vs = rows.filter(_._1 == g).map(_._2)
      val mean = vs.sum / vs.length
      val mu = BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sd = BigDecimal(math.sqrt(
          vs.map(x => (x - mean) * (x - mean)).sum / (vs.length - 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val gt2 = vs.count(v => math.abs(v - mu) > 2 * sd)
      val gt3 = vs.count(v => math.abs(v - mu) > 3 * sd)
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - sd / mu) < 1e-5, g)
      assert(math.abs(r.getDouble(3) - gt2.toDouble / vs.length) < 1e-6, g)
      assert(math.abs(r.getDouble(4) - gt3.toDouble / vs.length) < 1e-6, g)
    }
  }

  test("x_durbin_watson matches the direct residual scan; DW in (0, 4)") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(avg(col("value")), 6).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1)
    val i0 = daily.head._1
    val pts = daily.map { case (d, v) => ((d - i0).toDouble, v) }
    val n = pts.length
    val mx = pts.map(_._1).sum / n
    val my = pts.map(_._2).sum / n
    val b1r = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val b1 = BigDecimal(b1r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val b0 = BigDecimal(my - b1r * mx)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = pts.map { case (i, v) => v - (b0 + b1 * i) }
    val dw = e.zip(e.tail).map { case (p, c) => (c - p) * (c - p) }.sum /
      e.map(x => x * x).sum
    val row = SparkEntry.queries("x_durbin_watson")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - dw) < 1e-3)
    assert(row.getDouble(1) > 0 && row.getDouble(1) < 4)
  }
}
