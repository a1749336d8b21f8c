package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-46 batch — each operator checked
  * against an independent driver-side recomputation or a conservation
  * identity, not just shape. */
class R46OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def daily(): Array[(java.sql.Date, Long, Double)] =
    graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("x"), round(sum(col("o_totalprice")), 2).as("r"))
      .orderBy("d").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2)))

  test("x_drawdown: matches a sequential driver-side equity sweep") {
    val row = run("x_drawdown").collect().head
    val (n, maxdd) = (row.getLong(0), row.getDouble(1))
    val cal = daily()
    assert(cal.length == n)
    val mu = BigDecimal(cal.map(_._3).sum / cal.length).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    var eq = 0.0
    var peak = Double.MinValue
    var dd = 0.0
    cal.foreach { case (_, _, r) =>
      eq += r - mu
      peak = math.max(peak, eq)
      dd = math.max(dd, peak - eq)
    }
    assert(math.abs(dd - maxdd) < 0.05, s"brute $dd vs released $maxdd")
    assert(maxdd >= 0)
  }

  test("x_capability: exact oos count and Cp ordering Cpk <= Cp") {
    val r = run("x_capability").collect().head
    val (n, cp, cpk, cpm, ppm) = (r.getLong(0), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
    val oos = graft.Tables(spark, sf).lineitem
      .filter(col("l_quantity") < 5 || col("l_quantity") > 45).count()
    assert(math.abs(ppm - oos.toDouble * 1e6 / n) < 0.01)
    assert(cpk <= cp + 1e-9, "Cpk can never exceed Cp")
    assert(cpm <= cp + 1e-9, "Cpm <= Cp whenever mu != target")
    assert(cp > 0 && cpk > 0 && cpm > 0)
  }

  test("x_chatterjee: matches a brute-force xi on the daily frame " +
      "(date tie-break)") {
    val xi = run("x_chatterjee").collect().head.getDouble(1)
    val cal = daily().map { case (d, x, _) => (d, x) }
    val ys = graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(round(avg(col("o_totalprice")), 6).as("y"))
      .collect().map(r => (r.getDate(0), r.getDouble(1))).toMap
    val n = cal.length
    val seq = cal.map { case (d, x) => (x, d, ys(d)) }
      .sortBy { case (x, d, _) => (x, d.toString) }
    val yArr = seq.map(_._3)
    val r = yArr.map(yi => yArr.count(_ <= yi).toLong)
    val l = yArr.map(yi => yArr.count(_ >= yi).toLong)
    val num = r.zip(r.tail).map { case (a, b) => math.abs(b - a) }.sum
    val den = l.map(li => li.toDouble * (n - li)).sum
    val brute = 1.0 - n * num.toDouble / (2.0 * den)
    assert(math.abs(brute - xi) < 1e-5, s"brute $brute vs released $xi")
    assert(xi > -1 && xi <= 1)
  }

  test("x_dcor: matches a brute-force double-centered recomputation") {
    val row = run("x_dcor").collect().head
    val (n, dcor) = (row.getLong(0), row.getDouble(1))
    val cal = daily()
    assert(cal.length == n)
    val xs = cal.map(_._2.toDouble)
    val ys = cal.map(_._3)
    def centered(v: Array[Double]): Array[Array[Double]] = {
      val m = v.length
      val d = Array.tabulate(m, m)((i, j) => math.abs(v(i) - v(j)))
      val rm = d.map(row => BigDecimal(row.sum / m).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      val gm = BigDecimal(rm.sum / m).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      Array.tabulate(m, m)((i, j) => d(i)(j) - rm(i) - rm(j) + gm)
    }
    val (ca, cb) = (centered(xs), centered(ys))
    var vxy = 0.0; var vxx = 0.0; var vyy = 0.0
    for (i <- xs.indices; j <- xs.indices) {
      vxy += ca(i)(j) * cb(i)(j)
      vxx += ca(i)(j) * ca(i)(j)
      vyy += cb(i)(j) * cb(i)(j)
    }
    val brute = math.sqrt(math.abs(vxy)) / math.sqrt(math.sqrt(vxx * vyy))
    assert(math.abs(brute - dcor) < 1e-4, s"brute $brute vs $dcor")
    assert(dcor >= 0 && dcor <= 1 + 1e-9)
  }

  test("x_ipf_raking: margins converge toward uniform and weights " +
      "conserve the total") {
    val rows = run("x_ipf_raking").collect()
    assert(rows.length == 25)
    val total = rows.map(_.getLong(2)).sum.toDouble
    val wsum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wsum - total) / total < 0.01,
      s"IPF conserves mass: $wsum vs $total")
    // after the final row scaling, row margins are exactly uniform
    val rowMargins = rows.groupBy(_.getString(0))
      .values.map(_.map(_.getDouble(3)).sum)
    rowMargins.foreach(m =>
      assert(math.abs(m - total / 5) / (total / 5) < 1e-3,
        s"row margin $m vs ${total / 5}"))
    // column margins within a few percent after 1.5 IPF cycles
    val colMargins = rows.groupBy(_.getString(1))
      .values.map(_.map(_.getDouble(3)).sum)
    colMargins.foreach(m =>
      assert(math.abs(m - total / 5) / (total / 5) < 0.2))
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("x_hoeffding_d: matches a brute-force cell recomputation and " +
      "sits in [-0.5, 1]") {
    val row = run("x_hoeffding_d").collect().head
    val (n, dRel) = (row.getLong(0), row.getDouble(1))
    val cells = graft.Tables(spark, sf).orders
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("int").as("gx"),
        when(col("o_totalprice") < 50000, 0)
          .when(col("o_totalprice") < 100000, 1)
          .when(col("o_totalprice") < 150000, 2)
          .when(col("o_totalprice") < 200000, 3).otherwise(4).as("gy"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val nn = cells.values.sum.toDouble
    assert(nn.toLong == n)
    val rowCnt = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colCnt = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def below(m: Map[Int, Long], k: Int) =
      m.filter(_._1 < k).values.sum.toDouble
    var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
    cells.foreach { case ((gx, gy), c) =>
      val q = 1.0 +
        cells.filter { case ((bx, by), _) => bx < gx && by < gy }
          .values.sum +
        0.5 * cells.filter { case ((bx, by), _) => bx == gx && by < gy }
          .values.sum +
        0.5 * cells.filter { case ((bx, by), _) => bx < gx && by == gy }
          .values.sum +
        0.25 * (c - 1)
      val rv = below(rowCnt, gx) + (rowCnt(gx) + 1.0) / 2
      val sv = below(colCnt, gy) + (colCnt(gy) + 1.0) / 2
      d1 += c * (q - 1) * (q - 2)
      d2 += c * (rv - 1) * (rv - 2) * (sv - 1) * (sv - 2)
      d3 += c * (rv - 2) * (sv - 2) * (q - 1)
    }
    val brute = 30.0 * ((nn - 2) * (nn - 3) * d1 + d2 -
      2 * (nn - 2) * d3) /
      (nn * (nn - 1) * (nn - 2) * (nn - 3) * (nn - 4))
    assert(math.abs(brute - dRel) < 1e-8, s"brute $brute vs $dRel")
    assert(dRel >= -0.5 - 1e-9 && dRel <= 1 + 1e-9)
  }

  test("x_confusion_stats: count identities and metric consistency") {
    val r = run("x_confusion_stats").collect().head
    val (n, tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(tp + fp + fn + tn == n)
    val (acc, prec, rec, f1, mcc) = (r.getDouble(5), r.getDouble(6),
      r.getDouble(7), r.getDouble(9), r.getDouble(10))
    assert(math.abs(acc - (tp + tn).toDouble / n) < 1e-6)
    val f1b = 2 * prec * rec / (prec + rec)
    assert(math.abs(f1 - f1b) < 1e-4, s"F1 $f1 vs harmonic $f1b")
    assert(mcc >= -1 && mcc <= 1)
  }

  test("x_haar_energy: the transform conserves energy (details + final " +
      "approximation = raw series energy)") {
    val rows = run("x_haar_energy").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(2)).toSeq == Seq(128L, 64L, 32L, 16L, 8L, 8L))
    val total = rows.map(_.getDouble(1)).sum
    val raw = daily().take(256).map { case (_, _, r) =>
      BigDecimal(r / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(raw.length == 256)
    val rawEnergy = raw.map(v => v * v).sum
    assert(math.abs(total - rawEnergy) / rawEnergy < 1e-6,
      s"Haar energy $total vs raw $rawEnergy")
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_drawdown" -> "x_sql_drawdown",
      "x_capability" -> "x_sql_capability",
      "x_chatterjee" -> "x_sql_chatterjee",
      "x_dcor" -> "x_sql_dcor",
      "x_ipf_raking" -> "x_sql_ipf",
      "x_hoeffding_d" -> "x_sql_hoeffd",
      "x_confusion_stats" -> "x_sql_confusion",
      "x_haar_energy" -> "x_sql_haar")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
