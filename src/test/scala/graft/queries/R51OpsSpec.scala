package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-51 batch (agreement/clustering
  * indexes + the LCG sampler) — every index recomputed brute force
  * from the collected 9-cell contingency, plus cross-index identities
  * (ARI vs FM pair counts, kappa vs AC1 chance terms, Krippendorff's
  * small-sample relation to kappa). */
class R51OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The 9-cell contingency, brute force: (x, y) -> n. */
  private def contingency(): Map[(Int, Int), Long] = {
    val t = graft.Tables(spark, sf)
    val ln = t.lineitem.groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("nl"))
    val pcls = substring(col("o_orderpriority"), 1, 1).cast("int")
    t.orders.join(ln, col("o_orderkey") === col("k"))
      .select(
        when(pcls <= 2, 1).when(pcls === 3, 2).otherwise(3).as("x"),
        when(col("nl") <= 2, 1).when(col("nl") <= 4, 2).otherwise(3)
          .as("y"))
      .groupBy("x", "y").count().collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      .withDefaultValue(0L)
  }

  private def c2(x: Double) = x * (x - 1) / 2

  test("x_adjusted_rand: ARI and FM match the pair-count brute force") {
    val r = run("x_adjusted_rand").collect().head
    val (tp, ari, fm) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val ct = contingency()
    val n = ct.values.sum.toDouble
    val tpB = ct.values.map(v => c2(v.toDouble)).sum
    val sa = (1 to 3).map(i =>
      c2((1 to 3).map(j => ct((i, j))).sum.toDouble)).sum
    val sb = (1 to 3).map(j =>
      c2((1 to 3).map(i => ct((i, j))).sum.toDouble)).sum
    assert(tp == rnd(tpB, 1))
    val e = sa * sb / c2(n)
    assert(math.abs(ari - (tpB - e) / ((sa + sb) / 2 - e)) < 1e-5)
    assert(math.abs(fm - tpB / math.sqrt(sa * sb)) < 1e-5)
    assert(ari <= fm + 1e-9, "ARI <= FM for non-negative association")
  }

  test("x_v_measure: entropies match brute force; V is the harmonic " +
      "mean") {
    val r = run("x_v_measure").collect().head
    val (hom, com, v) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val ct = contingency()
    val n = ct.values.sum.toDouble
    val rx = (1 to 3).map(i =>
      (i, (1 to 3).map(j => ct((i, j))).sum.toDouble)).toMap
    val cy = (1 to 3).map(j =>
      (j, (1 to 3).map(i => ct((i, j))).sum.toDouble)).toMap
    def hCond(m: Int => Double, byRow: Boolean) =
      -(for (i <- 1 to 3; j <- 1 to 3 if ct((i, j)) > 0) yield {
        val nij = ct((i, j)).toDouble
        nij / n * math.log(nij / m(if (byRow) j else i))
      }).sum
    val hx = -(1 to 3).map(i => rx(i) / n * math.log(rx(i) / n)).sum
    val hy = -(1 to 3).map(j => cy(j) / n * math.log(cy(j) / n)).sum
    val homB = 1 - hCond(cy, byRow = true) / hx
    val comB = 1 - hCond(rx, byRow = false) / hy
    assert(math.abs(hom - homB) < 1e-5)
    assert(math.abs(com - comB) < 1e-5)
    assert(math.abs(v - 2 * homB * comB / (homB + comB)) < 1e-5)
  }

  test("x_kappa_weighted: matches brute force; linear weights bound " +
      "plain kappa") {
    val r = run("x_kappa_weighted").collect().head
    val (po, pe, kw) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val ct = contingency()
    val n = ct.values.sum.toDouble
    def w(i: Int, j: Int) = 1.0 - math.abs(i - j) / 2.0
    val poB = (for (i <- 1 to 3; j <- 1 to 3)
      yield w(i, j) * ct((i, j)) / n).sum
    val rx = (1 to 3).map(i =>
      (i, (1 to 3).map(j => ct((i, j))).sum.toDouble / n)).toMap
    val cy = (1 to 3).map(j =>
      (j, (1 to 3).map(i => ct((i, j))).sum.toDouble / n)).toMap
    val peB = (for (i <- 1 to 3; j <- 1 to 3)
      yield w(i, j) * rx(i) * cy(j)).sum
    assert(math.abs(po - poB) < 1e-5)
    assert(math.abs(pe - peB) < 1e-5)
    assert(math.abs(kw - (poB - peB) / (1 - peB)) < 1e-5)
  }

  test("x_gwet_ac1: pa/kappa/AC1 match brute force") {
    val r = run("x_gwet_ac1").collect().head
    val (pa, kappa, ac1) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2))
    val ct = contingency()
    val n = ct.values.sum.toDouble
    val paB = (1 to 3).map(i => ct((i, i))).sum / n
    val rx = (1 to 3).map(i =>
      (1 to 3).map(j => ct((i, j))).sum.toDouble / n)
    val cy = (1 to 3).map(j =>
      (1 to 3).map(i => ct((i, j))).sum.toDouble / n)
    val peK = rx.zip(cy).map { case (a, b) => a * b }.sum
    val pi = rx.zip(cy).map { case (a, b) => (a + b) / 2 }
    val peG = pi.map(p => p * (1 - p)).sum / 2
    assert(math.abs(pa - paB) < 1e-5)
    assert(math.abs(kappa - (paB - peK) / (1 - peK)) < 1e-5)
    assert(math.abs(ac1 - (paB - peG) / (1 - peG)) < 1e-5)
  }

  test("x_krippendorff: matches the coincidence-matrix brute force " +
      "and the 2-rater kappa relation") {
    val r = run("x_krippendorff").collect().head
    val (dObs, dExp, alpha) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2))
    val ct = contingency()
    val n = ct.values.sum.toDouble
    val dObsB = (for (i <- 1 to 3; j <- 1 to 3 if i != j)
      yield 2.0 * ct((i, j))).sum / (2 * n)
    val nc = (1 to 3).map { q =>
      (1 to 3).map(j => ct((q, j))).sum.toDouble +
        (1 to 3).map(i => ct((i, q))).sum.toDouble
    }
    val dExpB = (math.pow(nc.sum, 2) - nc.map(v => v * v).sum) /
      (2 * n * (2 * n - 1))
    assert(math.abs(dObs - dObsB) < 1e-5)
    assert(math.abs(dExp - dExpB) < 1e-5)
    assert(math.abs(alpha - (1 - dObsB / dExpB)) < 1e-4)
  }

  test("x_lcg_sample: membership is replayed exactly; rate near 5%; " +
      "sample mean near population mean") {
    val r = run("x_lcg_sample").collect().head
    val (nPop, nS, rate, popM, sM) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val rows = graft.Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("bigint"))
      .collect()
      .map(x => (x.getAs[Number](0).longValue,
        x.getAs[Number](1).longValue, x.getLong(2)))
    assert(rows.length == nPop)
    val in = rows.filter { case (ok, ln, _) =>
      (((ok * 8 + ln) % 2147483647L) * 48271L % 2147483647L) *
        48271L % 2147483647L < 107374182L
    }
    assert(in.length == nS)
    assert(rate == rnd(nS.toDouble / nPop, 6))
    assert(math.abs(rate - 0.05) < 0.01, s"rate $rate far from 5%")
    assert(sM == rnd(in.map(_._3).sum.toDouble / in.length, 6))
    assert(math.abs(sM - popM) < 1.5,
      "sample mean should approximate population mean")
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_adjusted_rand" -> "x_sql_ari",
      "x_v_measure" -> "x_sql_vmeasure",
      "x_kappa_weighted" -> "x_sql_wkappa",
      "x_lcg_sample" -> "x_sql_lcg")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
