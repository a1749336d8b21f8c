package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-23 operators:
  * direct matched-basket indices, loop-built Cook's distance, VIF from
  * an inverted correlation matrix, and direct keyness/burstiness counts.
  */
class R23OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_price_index matches the direct matched-basket computation") {
    val rows = Tables(spark, sf).lineitem
      .join(Tables(spark, sf).part, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), year(col("l_shipdate")),
        col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    def snap(v: Double, n: Int) = BigDecimal(v)
      .setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = rows.groupBy(r => (r._1, r._2)).map { case ((b, y), xs) =>
      (b, y) -> (snap(xs.map(_._3).sum / xs.map(_._4).sum, 6),
        snap(xs.map(_._4).sum, 2))
    }
    val base = cells.collect { case ((b, 1995), pq) => b -> pq }.toMap
    val out = SparkEntry.queries("x_price_index")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val yr = r.getInt(0)
      val matched = cells.collect {
        case ((b, `yr`), (pt, qt)) if base.contains(b) =>
          (pt, qt, base(b)._1, base(b)._2)
      }.toSeq
      val lasp = matched.map(m => m._1 * m._4).sum /
        matched.map(m => m._3 * m._4).sum
      val paas = matched.map(m => m._1 * m._2).sum /
        matched.map(m => m._3 * m._2).sum
      assert(r.getLong(1) === matched.length.toLong, s"yr $yr")
      assert(math.abs(r.getDouble(2) - lasp) < 1e-3, s"yr $yr laspeyres")
      assert(math.abs(r.getDouble(3) - paas) < 1e-3, s"yr $yr paasche")
      assert(math.abs(r.getDouble(4) - math.sqrt(lasp * paas)) < 1e-3)
    }
  }

  test("x_cooks_distance matches the direct influence scan; top-5 sorted") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(round(avg(col("value")), 6).as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
      .sortBy(_._1.toEpochDay)
    val i0 = daily.head._1.toEpochDay
    val pts = daily.map { case (d, v) => ((d.toEpochDay - i0).toDouble, d, v) }
    val n = pts.length
    def snap(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mxr = pts.map(_._1).sum / n
    val my = pts.map(_._3).sum / n
    val b1r = pts.map(p => (p._1 - mxr) * (p._3 - my)).sum /
      pts.map(p => (p._1 - mxr) * (p._1 - mxr)).sum
    val b1 = snap(b1r); val b0 = snap(my - b1r * mxr); val xbar = snap(mxr)
    val sxx = snap(pts.map(p => (p._1 - xbar) * (p._1 - xbar)).sum)
    val es = pts.map { case (i, d, v) =>
      (d, v - (b0 + b1 * i), 1.0 / n + (i - xbar) * (i - xbar) / sxx)
    }
    val sse = snap(es.map(e => e._2 * e._2).sum)
    val cd = es.map { case (d, e, h) =>
      d -> e * e * h / (2 * (sse / (n - 2)) * (1 - h) * (1 - h))
    }.sortBy { case (d, v) => (-v, d.toEpochDay) }.take(5)
    val out = SparkEntry.queries("x_cooks_distance")(spark, sf).collect()
    assert(out.length === 5)
    out.zip(cd).foreach { case (r, (d, v)) =>
      assert(r.getDate(0).toLocalDate === d)
      assert(math.abs(r.getDouble(1) - v) < 1e-4)
    }
    out.sliding(2).foreach { case Array(p, q) =>
      assert(p.getDouble(1) >= q.getDouble(1))
    }
  }

  test("x_vif matches the closed-form R2 identities; VIF >= 1") {
    val rows = Tables(spark, sf).lineitem
      .select(col("l_quantity"), col("l_discount"), col("l_tax"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def corr2(xs: Array[Double], ys: Array[Double]): Double = {
      val mx = xs.sum / xs.length; val my = ys.sum / ys.length
      xs.zip(ys).map(p => (p._1 - mx) * (p._2 - my)).sum /
        math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
          ys.map(y => (y - my) * (y - my)).sum)
    }
    val rqd = corr2(rows.map(_._1), rows.map(_._2))
    val rqt = corr2(rows.map(_._1), rows.map(_._3))
    val rdt = corr2(rows.map(_._2), rows.map(_._3))
    def vif(a: Double, b: Double, ab: Double) =
      1 / (1 - (a * a + b * b - 2 * a * b * ab) / (1 - ab * ab))
    val row = SparkEntry.queries("x_vif")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(math.abs(row.getDouble(1) - vif(rqd, rqt, rdt)) < 1e-3)
    assert(math.abs(row.getDouble(2) - vif(rqd, rdt, rqt)) < 1e-3)
    assert(math.abs(row.getDouble(3) - vif(rqt, rdt, rqd)) < 1e-3)
    Seq(1, 2, 3).foreach(i => assert(row.getDouble(i) >= 1.0 - 1e-9))
  }

  private def words: Array[(Long, String, String)] =
    Tables(spark, sf).documents
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("x_keyness matches the direct G2 on a spot-checked word; ordered desc") {
    val ws = words
    val c1 = ws.count(_._2 == "src0").toDouble
    val c2 = ws.length - c1
    val out = SparkEntry.queries("x_keyness")(spark, sf).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val w = r.getString(0)
      val a = ws.count(x => x._2 == "src0" && x._3 == w).toDouble
      val b = ws.count(x => x._2 != "src0" && x._3 == w).toDouble
      assert(r.getLong(1) === a.toLong && r.getLong(2) === b.toLong)
      val e1 = c1 * (a + b) / (c1 + c2); val e2 = c2 * (a + b) / (c1 + c2)
      val g2 = 2 * ((if (a > 0) a * math.log(a / e1) else 0.0)
        + (if (b > 0) b * math.log(b / e2) else 0.0))
      assert(math.abs(r.getDouble(3) - g2) < 1e-3, w)
    }
    out.sliding(2).foreach { case Array(p, q) =>
      assert(p.getDouble(3) >= q.getDouble(3))
    }
  }

  test("x_burstiness matches the direct VMR with zero cells") {
    val ws = words
    val nDocs = Tables(spark, sf).documents.count().toDouble
    val out = SparkEntry.queries("x_burstiness")(spark, sf).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val w = r.getString(0)
      val perDoc = ws.filter(_._3 == w).groupBy(_._1).view
        .mapValues(_.size.toDouble).toMap
      val df = perDoc.size; val s1 = perDoc.values.sum
      val mean = s1 / nDocs
      val varr = (perDoc.values.map(c => c * c).sum - nDocs * mean * mean) /
        (nDocs - 1)
      assert(r.getLong(1) === df.toLong, w)
      assert(r.getLong(2) === s1.toLong, w)
      assert(math.abs(r.getDouble(3) - varr / mean) < 1e-3, w)
      assert(df >= 100)
    }
  }
}
