package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-52 batch (matrix profile, STL
  * strength, power analysis, Holm, k-fold CV) — brute-force
  * recomputations from collected series/rows plus cross-operator
  * coherence (Holm ⊆ BH). */
class R52OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dailyRevenue(): Array[(String, Double)] =
    graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(round(sum("o_totalprice") / 1.0e6, 6).as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getDouble(1)))
      .sortBy(_._1)

  test("x_matrix_profile: discords and motif match an O(n^2 m) brute " +
      "force") {
    val rows = run("x_matrix_profile").collect()
    assert(rows.length == 3)
    val s = dailyRevenue()
    val y = s.map(_._2)
    val m = 7
    val nw = y.length - m + 1
    val mu = Array.tabulate(nw)(i =>
      rnd(y.slice(i, i + m).sum / m, 9))
    val sd = Array.tabulate(nw)(i =>
      math.sqrt(y.slice(i, i + m).map(v => v * v).sum / m
        - mu(i) * mu(i)))
    def dist(i: Int, j: Int): Double = {
      val dot = (0 until m).map(k => y(i + k) * y(j + k)).sum
      math.sqrt(math.max(0.0,
        2.0 * m * (1 - (dot / m - mu(i) * mu(j)) / (sd(i) * sd(j)))))
    }
    val prof = Array.tabulate(nw) { i =>
      rnd((0 until nw).filter(j => math.abs(j - i) >= m)
        .map(j => dist(i, j)).min, 6)
    }
    val discB = prof.zipWithIndex
      .sortBy { case (p, i) => (-p, s(i)._1) }.take(3)
    rows.zip(discB).foreach { case (r, (p, i)) =>
      assert(r.getDate(1).toString == s(i)._1 &&
        r.getDouble(2) == p,
        s"discord rank ${r.getLong(0)} mismatch")
    }
    // motif: minimum pair distance
    val pairs = for (i <- 0 until nw; j <- i + m until nw)
      yield (rnd(dist(i, j), 6), s(i)._1, s(j)._1)
    val best = pairs.minBy(identity)
    val r0 = rows.head
    assert(r0.getDate(3).toString == best._2 &&
      r0.getDate(4).toString == best._3 &&
      r0.getDouble(5) == best._1)
  }

  test("x_stl_strength: matches a brute-force decomposition") {
    val r = run("x_stl_strength").collect().head
    val (n, ft, fs, vr) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val rows = graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect().map(x => (x.getDate(0), x.getDouble(1)))
      .sortBy(_._1.getTime)
    val y = rows.map(_._2)
    assert(y.length == n)
    val mn = rows.map(_._1.toLocalDate.getMonthValue)
    val t = y.indices.map { i =>
      val lo = math.max(0, i - 7)
      val hi = math.min(y.length - 1, i + 7)
      rnd(y.slice(lo, hi + 1).sum / (hi - lo + 1), 6)
    }
    val det = y.indices.map(i => y(i) - t(i))
    val sMap = (1 to 12).map { q =>
      val v = y.indices.filter(mn(_) == q).map(det)
      (q, rnd(v.sum / v.length, 6))
    }.toMap
    val rem = y.indices.map(i => det(i) - sMap(mn(i)))
    def popVar(a: Seq[Double]) = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum / a.length
    }
    val vrB = popVar(rem)
    val vds = popVar(y.indices.map(i => y(i) - sMap(mn(i))))
    val vdt = popVar(det)
    assert(math.abs(vr - vrB) < 1e-4)
    assert(math.abs(ft - math.max(0, 1 - vrB / vds)) < 1e-5)
    assert(math.abs(fs - math.max(0, 1 - vrB / vdt)) < 1e-5)
    assert(ft >= 0 && ft <= 1 && fs >= 0 && fs <= 1)
  }

  test("x_power_ttest: matches brute force; power coherent with " +
      "required n") {
    val r = run("x_power_ttest").collect().head
    val (na, nb, diff, sd, nReq, pw) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))
    val rows = graft.Tables(spark, sf).lineitem
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect().map(x => (x.getString(0), x.getDouble(1)))
    val a = rows.filter(_._1 == "R").map(_._2)
    val b = rows.filter(_._1 == "N").map(_._2)
    assert(a.length == na && b.length == nb)
    val dB = math.abs(a.sum / a.length - b.sum / b.length)
    def css(v: Array[Double]) = {
      val m = v.sum / v.length
      v.map(x => (x - m) * (x - m)).sum
    }
    val sdB = math.sqrt((css(a) + css(b)) / (a.length + b.length - 2))
    assert(math.abs(diff - dB) < 1e-5)
    assert(math.abs(sd - sdB) < 1e-5)
    val za = 1.959963984540054
    val zb = 0.8416212335729143
    assert(nReq == math.ceil(2 * sdB * sdB * math.pow(za + zb, 2)
      / (dB * dB)).toLong)
    assert(pw >= 0 && pw <= 1)
    // if the current arms are larger than required, power >= 80%
    if (math.min(na, nb) >= nReq) assert(pw >= 0.79)
  }

  test("x_holm: rejections are a prefix, each clears its threshold, " +
      "and Holm implies BH (more conservative)") {
    val rows = run("x_holm").collect()
    assert(rows.length == 25)
    val byRank = rows.sortBy(_.getLong(2))
    val rej = byRank.map(_.getInt(4))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b },
      "Holm rejections must be a prefix of the p-ranking")
    byRank.filter(_.getInt(4) == 1).foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(3) + 1e-6,
        s"rejected rank ${r.getLong(2)} above its Holm threshold")
    }
    // thresholds increase with rank: alpha/(m-k+1)
    val th = byRank.map(_.getDouble(3))
    assert(th.zip(th.tail).forall { case (a, b) => a <= b + 1e-12 })
    // every Holm rejection is a BH rejection
    val bh = run("x_fdr_bh").collect()
      .map(r => (r.getString(0), r.getInt(5))).toMap
    rows.filter(_.getInt(4) == 1).foreach { r =>
      assert(bh(r.getString(0)) == 1,
        s"Holm rejected ${r.getString(0)} but BH did not")
    }
  }

  test("x_kfold_cv: per-fold coefficients and test MSE match a " +
      "brute-force train/test split") {
    val rows = run("x_kfold_cv").collect()
    assert(rows.length == 5)
    val data = graft.Tables(spark, sf).lineitem
      .select((col("l_orderkey") % 5).cast("int").as("f"),
        (col("l_extendedprice") / 1.0e3).as("x"),
        col("l_quantity").cast("double").as("y"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val (fold, nT, b0, b1, mse) = (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val test = data.filter(_._1 == fold)
      val train = data.filter(_._1 != fold)
      assert(test.length == nT)
      val n = train.length.toDouble
      val sx = train.map(_._2).sum
      val sy = train.map(_._3).sum
      val sxx = train.map(t => t._2 * t._2).sum
      val sxy = train.map(t => t._2 * t._3).sum
      val b1B = rnd((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
      val b0B = rnd(sy / n - b1B * sx / n, 9)
      assert(math.abs(b1 - b1B) < 1e-8, s"fold $fold slope")
      assert(math.abs(b0 - b0B) < 1e-5, s"fold $fold intercept")
      val mseB = test.map { case (_, x, y) =>
        math.pow(y - b0B - b1B * x, 2) }.sum / test.length
      assert(math.abs(mse - mseB) < 1e-3, s"fold $fold mse")
    }
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_matrix_profile" -> "x_sql_mp",
      "x_kfold_cv" -> "x_sql_kfold")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
