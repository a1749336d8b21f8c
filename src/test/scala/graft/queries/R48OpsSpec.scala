package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-48 batch (Hodges-Lehmann, exact
  * trimmed/winsorized means, Lepage, D'Agostino K², Quade, PPCC,
  * Stuart-Maxwell, Cucconi) — each checked against an independent
  * brute-force recomputation from collected raw values or a known
  * mathematical identity, not just shape. */
class R48OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def quantities(): Array[Long] =
    graft.Tables(spark, sf).lineitem
      .select(col("l_quantity").cast("bigint")).collect()
      .map(_.getLong(0)).sorted

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x_hodges_lehmann: matches the brute-force Walsh-average median " +
      "over the collected sample") {
    val r = run("x_hodges_lehmann").collect().head
    val (n, med, hl) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val v = quantities()
    assert(v.length == n)
    // brute-force over the ≤50-value histogram (the raw sample would be
    // O(n²)); weights replayed in sorted Walsh-sum order
    val hist = v.groupBy(identity).map { case (k, a) => (k, a.length.toLong) }
      .toArray.sortBy(_._1)
    val walsh = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    for (i <- hist.indices; j <- i until hist.length) {
      val m = if (i == j) hist(i)._2.toDouble * (hist(i)._2 + 1) / 2
      else hist(i)._2.toDouble * hist(j)._2
      walsh += ((hist(i)._1 + hist(j)._1, m))
    }
    val ws = walsh.groupBy(_._1).map { case (s, a) => (s, a.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val t = ws.map(_._2).sum
    var cm = 0.0
    var sLo = -1L
    var sHi = -1L
    ws.foreach { case (s, m) =>
      cm += m
      if (sLo < 0 && 2 * cm >= t) sLo = s
      if (sHi < 0 && cm >= math.floor(t / 2.0) + 1) sHi = s
    }
    assert(hl == rnd((sLo + sHi) / 4.0, 2))
    // plain median, lower/upper convention
    val nL = v.length
    val mLo = v((nL + 1) / 2 - 1)
    val mHi = v(nL / 2)
    assert(med == rnd((mLo + mHi) / 2.0, 1))
  }

  test("x_winsor_trim: matches brute-force sort-trim-average") {
    val r = run("x_winsor_trim").collect().head
    val (n, k, mean, tm, wm) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val v = quantities()
    assert(v.length == n && k == n / 10)
    val ki = k.toInt
    val inner = v.slice(ki, v.length - ki)
    assert(mean == rnd(v.sum.toDouble / n, 6))
    assert(tm == rnd(inner.sum.toDouble / inner.length, 6))
    val wins = v.take(ki).map(_ => inner.head) ++ inner ++
      v.takeRight(ki).map(_ => inner.last)
    assert(wm == rnd(wins.sum.toDouble / n, 6))
  }

  test("x_lepage: Wilcoxon z matches a brute-force midrank computation; " +
      "Ansari z matches x_ansari_bradley; L and p are coherent") {
    val r = run("x_lepage").collect().head
    val (nn, na, zw, zab, l, p) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // brute Wilcoxon with midranks + tie-corrected variance
    val rows = graft.Tables(spark, sf).lineitem
      .select(col("l_linestatus"), col("l_quantity").cast("bigint"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(rows.length == nn && rows.count(_._1 == "F") == na)
    val pooled = rows.map(_._2).sorted
    val mid = pooled.zipWithIndex.groupBy(_._1)
      .map { case (v, a) => (v, a.map(_._2 + 1).sum.toDouble / a.length) }
    val w = rows.filter(_._1 == "F").map(x => mid(x._2)).sum
    val tie = pooled.groupBy(identity).values
      .map(g => g.length.toDouble * (g.length.toDouble * g.length - 1)).sum
    val nD = nn.toDouble
    val naD = na.toDouble
    val ew = naD * (nD + 1) / 2
    val vw = naD * (nD - naD) / 12.0 * ((nD + 1) - tie / (nD * (nD - 1)))
    assert(zw == rnd((w - ew) / math.sqrt(vw), 4))
    val abz = run("x_ansari_bradley").collect().head.getDouble(4)
    assert(zab == abz, "Lepage AB half must equal x_ansari_bradley's z")
    assert(math.abs(l - rnd(zw * zw + zab * zab, 4)) <= 2e-4)
    assert(math.abs(p - math.exp(-l / 2)) < 1e-4)
  }

  test("x_dagostino_k2: moments match brute force; K2 and p coherent") {
    val r = run("x_dagostino_k2").collect().head
    val (n, g1, b2, z1, z2, k2, p) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))
    val v = quantities().map(_.toDouble)
    assert(v.length == n)
    val m1 = v.sum / n
    def cm(k: Int) = v.map(x => math.pow(x - m1, k)).sum / n
    assert(math.abs(g1 - cm(3) / math.pow(cm(2), 1.5)) < 1e-4)
    assert(math.abs(b2 - cm(4) / (cm(2) * cm(2))) < 1e-4)
    // k2 is rounded from UNROUNDED z's; recomputing from the released
    // 4 dp z's carries error up to ~2·|z|·5e-5 per component
    assert(math.abs(k2 - (z1 * z1 + z2 * z2)) <=
      1e-4 * (1 + 2 * (math.abs(z1) + math.abs(z2))))
    assert(math.abs(p - math.exp(-k2 / 2)) < 1e-4)
    // quantity is near-uniform: platykurtic (b2 well below 3), so the
    // omnibus must reject hard
    assert(b2 < 2.5 && p < 0.01)
  }

  test("x_quade: matches a brute-force recomputation on the collected " +
      "60-cell frame") {
    val r = run("x_quade").collect().head
    val (n, k, f, df1, df2) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getLong(4))
    assert(df1 == k - 1 && df2 == (n - 1) * (k - 1))
    val cells = graft.Tables(spark, sf).orders
      .select(month(col("o_orderdate")).cast("int").as("b"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("j"),
        col("o_totalprice").as("v"))
      .groupBy("b", "j").agg(round(avg("v"), 6).as("m"))
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getDouble(2)))
    val blocks = cells.map(_._1).distinct.sorted
    val treats = cells.map(_._2).distinct.sorted
    assert(blocks.length == n && treats.length == k)
    def midrank(xs: Seq[Double], x: Double) =
      xs.count(_ < x) + (xs.count(_ == x) + 1) / 2.0
    val rk = cells.map { case (b, j, m) =>
      ((b, j), midrank(cells.filter(_._1 == b).map(_._3).toSeq, m))
    }.toMap
    val rg = blocks.map { b =>
      val ms = cells.filter(_._1 == b).map(_._3)
      (b, rnd(ms.max - ms.min, 6))
    }.toMap
    val qb = blocks.map(b =>
      (b, midrank(blocks.map(rg).toSeq, rg(b)))).toMap
    val s = cells.map { case (b, j, _) =>
      ((b, j), qb(b) * (rk((b, j)) - (k + 1) / 2.0))
    }
    val a2 = s.map(x => x._2 * x._2).sum
    val bsum = treats.map(j =>
      math.pow(s.filter(_._1._2 == j).map(_._2).sum, 2)).sum / n
    assert(math.abs(f - (n - 1) * bsum / (a2 - bsum)) < 1e-3)
  }

  /** Acklam Φ⁻¹ — independent reimplementation for the PPCC check. */
  private def normInv(p: Double): Double = {
    val a = Seq(-3.969683028665376e1, 2.209460984245205e2,
      -2.759285104469687e2, 1.38357751867269e2, -3.066479806614716e1,
      2.506628277459239e0)
    val b = Seq(-5.447609879822406e1, 1.615858368580409e2,
      -1.556989798598866e2, 6.680131188771972e1, -1.328068155288572e1)
    val c = Seq(-7.784894002430293e-3, -3.223964580411365e-1,
      -2.400758277161838e0, -2.549732539343734e0, 4.374664141464968e0,
      2.938163982698783e0)
    val d = Seq(7.784695709041462e-3, 3.224671290700398e-1,
      2.445134137142996e0, 3.754408661907416e0)
    def horner(cs: Seq[Double], x: Double) =
      cs.tail.foldLeft(cs.head)((acc, k) => acc * x + k)
    if (p < 0.02425) {
      val q = math.sqrt(-2 * math.log(p))
      horner(c, q) / (horner(d, q) * q + 1)
    } else if (p <= 0.97575) {
      val q = p - 0.5
      val r = q * q
      horner(a, r) * q / (horner(b, r) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(horner(c, q) / (horner(d, q) * q + 1))
    }
  }

  test("x_ppcc: matches a brute-force weighted correlation with an " +
      "independent Acklam inverse CDF") {
    val r = run("x_ppcc").collect().head
    val (n, pr, pr2) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(math.abs(pr2 - pr * pr) < 2e-6)
    val v = quantities()
    assert(v.length == n)
    val hist = v.groupBy(identity).map { case (k, a) => (k, a.length.toLong) }
      .toArray.sortBy(_._1)
    var below = 0L
    val rows = hist.map { case (vv, c) =>
      val p = (below + (c + 1) / 2.0 - 0.375) / (n + 0.25)
      below += c
      (vv.toDouble, c.toDouble, normInv(p))
    }
    val sw = rows.map(_._2).sum
    val sx = rows.map(x => x._2 * x._1).sum
    val sy = rows.map(x => x._2 * x._3).sum
    val sxx = rows.map(x => x._2 * x._1 * x._1).sum
    val syy = rows.map(x => x._2 * x._3 * x._3).sum
    val sxy = rows.map(x => x._2 * x._1 * x._3).sum
    val rr = (sw * sxy - sx * sy) /
      math.sqrt((sw * sxx - sx * sx) * (sw * syy - sy * sy))
    assert(math.abs(pr - rr) < 1e-5)
    // near-uniform data: clearly correlated with normal scores but not
    // normal — r strictly inside (0.9, 1)
    assert(pr > 0.9 && pr < 1.0)
  }

  test("x_stuart_maxwell: margins reconcile with a direct contingency " +
      "rebuild and the closed 2x2 solve reproduces chi2") {
    val r = run("x_stuart_maxwell").collect().head
    val (r1, r2, c1, c2, chi2, p) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
    val t = graft.Tables(spark, sf)
    val ln = t.lineitem.groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("nl"))
    val pcls = substring(col("o_orderpriority"), 1, 1).cast("int")
    val cells = t.orders.join(ln, col("o_orderkey") === col("k"))
      .select(
        when(pcls <= 2, 1).when(pcls === 3, 2).otherwise(3).as("x"),
        when(col("nl") <= 2, 1).when(col("nl") <= 4, 2).otherwise(3)
          .as("y"))
      .groupBy("x", "y").count().collect()
      .map(x => ((x.getInt(0), x.getInt(1)), x.getLong(2))).toMap
      .withDefaultValue(0L)
    def rowm(i: Int) = (1 to 3).map(j => cells((i, j))).sum
    def colm(j: Int) = (1 to 3).map(i => cells((i, j))).sum
    assert((rowm(1), rowm(2), colm(1), colm(2)) == ((r1, r2, c1, c2)))
    val d1 = (r1 - c1).toDouble
    val d2 = (r2 - c2).toDouble
    val s11 = (r1 + c1 - 2 * cells((1, 1))).toDouble
    val s22 = (r2 + c2 - 2 * cells((2, 2))).toDouble
    val s12 = -(cells((1, 2)) + cells((2, 1))).toDouble
    val x2 = (s22 * d1 * d1 - 2 * s12 * d1 * d2 + s11 * d2 * d2) /
      (s11 * s22 - s12 * s12)
    assert(chi2 == rnd(x2, 4))
    assert(math.abs(p - math.exp(-x2 / 2)) < 1e-4)
  }

  test("x_cucconi: U matches a brute-force squared-midrank sum; C and " +
      "p coherent; rho strictly in (-1, 0)") {
    val r = run("x_cucconi").collect().head
    val (nn, nb, u, vStat, c, p) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val rows = graft.Tables(spark, sf).lineitem
      .select(col("l_linestatus"), col("l_quantity").cast("bigint"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(rows.length == nn && rows.count(_._1 == "O") == nb)
    val pooled = rows.map(_._2).sorted
    val mid = pooled.zipWithIndex.groupBy(_._1)
      .map { case (v, a) => (v, a.map(_._2 + 1).sum.toDouble / a.length) }
    val nD = nn.toDouble
    val nbD = nb.toDouble
    val sr2 = rows.filter(_._1 == "O").map(x => math.pow(mid(x._2), 2)).sum
    val sc2 = rows.filter(_._1 == "O")
      .map(x => math.pow(nD + 1 - mid(x._2), 2)).sum
    val den = math.sqrt(nbD * (nD - nbD) * (nD + 1) * (2 * nD + 1)
      * (8 * nD + 11) / 5.0)
    assert(u == rnd((6 * sr2 - nbD * (nD + 1) * (2 * nD + 1)) / den, 4))
    assert(vStat ==
      rnd((6 * sc2 - nbD * (nD + 1) * (2 * nD + 1)) / den, 4))
    val rho = 2 * (nD * nD - 4) / ((2 * nD + 1) * (8 * nD + 11)) - 1
    assert(rho > -1 && rho < 0)
    val cB = (u * u + vStat * vStat - 2 * rho * u * vStat) /
      (2 * (1 - rho * rho))
    assert(math.abs(c - cB) < 2e-3)
    assert(math.abs(p - math.exp(-c)) < 1e-4)
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_hodges_lehmann" -> "x_sql_hl",
      "x_winsor_trim" -> "x_sql_trimmed",
      "x_dagostino_k2" -> "x_sql_k2",
      "x_quade" -> "x_sql_quade",
      "x_ppcc" -> "x_sql_ppcc",
      "x_stuart_maxwell" -> "x_sql_sm",
      "x_cucconi" -> "x_sql_cucconi")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
