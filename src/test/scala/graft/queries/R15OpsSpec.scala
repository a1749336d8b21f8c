package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-15 statistics:
  * sorted-merge Wasserstein, direct binned JS divergence, loop-based
  * R/S Hurst, brute-force Theil-Sen, and a sequential Page-Hinkley
  * scan — against the distributed binned/self-join forms.
  */
class R15OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def twoSeg: (Array[Double], Array[Double]) = {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    (rows.filter(_._1 == "BUILDING").map(_._2),
      rows.filter(_._1 == "MACHINERY").map(_._2))
  }

  test("x_wasserstein equals the direct CDF-integral over sorted support") {
    val (a, b) = twoSeg
    val support = (a ++ b).distinct.sorted
    val na = a.length.toDouble; val nb = b.length.toDouble
    var w1 = 0.0
    support.zip(support.tail).foreach { case (v, vn) =>
      val fa = a.count(_ <= v) / na
      val fb = b.count(_ <= v) / nb
      w1 += math.abs(fa - fb) * (vn - v)
    }
    val row = SparkEntry.queries("x_wasserstein")(spark, sf).collect().head
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(math.abs(row.getDouble(2) - w1) < 1e-3)
  }

  test("x_js_divergence matches the direct binned KL average; bounded by ln 2") {
    val (a, b) = twoSeg
    val bin = (v: Double) => math.floor(v / 1000).toLong
    val keys = (a.map(bin) ++ b.map(bin)).distinct
    val na = a.length.toDouble; val nb = b.length.toDouble
    val jsd = keys.map { k =>
      val p = a.count(bin(_) == k) / na
      val q = b.count(bin(_) == k) / nb
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) else 0.0) / 2 +
        (if (q > 0) q * math.log(q / m) else 0.0) / 2
    }.sum
    val row = SparkEntry.queries("x_js_divergence")(spark, sf).collect().head
    assert(row.getLong(0) === keys.length.toLong)
    assert(math.abs(row.getDouble(1) - jsd) < 1e-5)
    assert(row.getDouble(1) >= 0 && row.getDouble(1) <= math.log(2) + 1e-9)
    assert(math.abs(row.getDouble(2) - math.sqrt(jsd)) < 1e-5)
  }

  private def dailySeries(agg: String): Array[(Long, Double)] = {
    val c = if (agg == "count") count(lit(1)).cast("double")
      else round(avg(col("value")), 6)
    Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).agg(c.as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1)
  }

  test("x_hurst matches the direct R/S loop and sits in (0, 1.5)") {
    val daily = dailySeries("count")
    val i0 = daily.head._1
    val series = daily.map { case (d, v) => ((d - i0).toInt, v) }.toMap
    val nDays = daily.length
    val ms = Seq(4, 6, 8, 10, 15)
    val expect = ms.flatMap { m =>
      val rss = (0 until nDays / m).flatMap { blk =>
        val vs = (blk * m until (blk + 1) * m).flatMap(series.get)
        if (vs.length != m) None
        else {
          val mu = BigDecimal(vs.sum / m)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val z = vs.map(_ - mu)
          val y = z.scanLeft(0.0)(_ + _).tail
          val r = y.max - y.min
          val s1 = math.sqrt(BigDecimal(z.map(x => x * x).sum / m)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          if (s1 > 0) Some(r / s1) else None
        }
      }
      if (rss.isEmpty) None
      else Some(m -> (rss.size, rss.sum / rss.size))
    }.toMap
    val out = SparkEntry.queries("x_hurst")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet === expect.keySet)
    out.foreach { r =>
      val (nb, avgRs) = expect(r.getInt(0))
      assert(r.getLong(1) === nb.toLong)
      assert(math.abs(r.getDouble(2) - avgRs) < 1e-4, s"m=${r.getInt(0)}")
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 1.5)
    }
    // the log-log fit: recompute slope from the released snapped points
    val pts = out.map(r => (math.log(r.getInt(0).toDouble), math.log(r.getDouble(2))))
    val mx = pts.map(_._1).sum / pts.length
    val my = pts.map(_._2).sum / pts.length
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    assert(math.abs(out.head.getDouble(3) - slope) < 1e-3)
  }

  test("x_theilsen_trend matches the brute-force pairwise-slope median") {
    val daily = dailySeries("mean")
    val i0 = daily.head._1
    val pts = daily.map { case (d, v) => ((d - i0).toDouble, v) }
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
    def med(xs: Seq[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2
    }
    val slope = med(slopes)
    val icept = med(pts.map { case (i, v) => v - slope * i }.sorted.toSeq)
    val row = SparkEntry.queries("x_theilsen_trend")(spark, sf).collect().head
    assert(row.getLong(0) === pts.length.toLong)
    assert(math.abs(row.getDouble(1) - slope) < 1e-5)
    assert(math.abs(row.getDouble(2) - icept) < 1e-3)
  }

  test("x_page_hinkley matches the sequential scan") {
    val daily = dailySeries("mean")
    val xs = daily.map(_._2)
    val n = xs.length
    val mean = xs.sum / n
    val sd = BigDecimal(math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var sx = 0.0; var mt = 0.0; var minMt = 0.0; var maxPh = 0.0
    var alarms = 0L; var firstAlarm: Option[Long] = None
    xs.zipWithIndex.foreach { case (x, i) =>
      sx += x
      mt += x - sx / (i + 1) - 0.1
      minMt = math.min(minMt, mt)
      val ph = mt - minMt
      maxPh = math.max(maxPh, ph)
      if (ph > 10 * sd) {
        alarms += 1
        if (firstAlarm.isEmpty) firstAlarm = Some(daily(i)._1)
      }
    }
    val row = SparkEntry.queries("x_page_hinkley")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - maxPh) < 1e-3)
    assert(row.getLong(2) === alarms)
    val got = Option(row.getDate(3)).map(_.toLocalDate.toEpochDay)
    assert(got === firstAlarm)
  }
}
