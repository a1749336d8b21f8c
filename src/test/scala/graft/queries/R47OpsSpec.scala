package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-47 batch (GEV/GPD L-moment fits,
  * copula correlation, transfer entropy, DTW, Page's L, seasonal MK). */
class R47OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** A&S 6.1.36 Γ(1+x) — independent reimplementation of the SQL
    * fragment for cross-checks. */
  private def gamma1p(x: Double): Double = {
    val cs = Seq(0.035868343, -0.193527818, 0.482199394, -0.756704078,
      0.918206857, -0.897056937, 0.988205891, -0.577191652)
    def poly(v: Double) = cs.foldLeft(0.0)((acc, k) => (acc + k) * v) + 1.0
    if (x >= 0) poly(x) else poly(1.0 + x) / (1.0 + x)
  }

  private def blockMaxima(): Array[Double] =
    graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(round(sum(col("o_totalprice")), 2).as("r"))
      .groupBy(date_trunc("month", col("d")).as("mo"))
      .agg(max(col("r")).as("mx"))
      .collect().map(_.getDouble(1))

  test("x_gev_lmom: L-moments match a brute-force PWM recomputation " +
      "and the Hosking chain reproduces sigma/mu") {
    val r = run("x_gev_lmom").collect().head
    val (n, l1, l2, t3, k, sigma, mu, rl) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6), r.getDouble(7))
    val mx = blockMaxima().sorted
    assert(mx.length == n)
    def snap9(v: Double) = BigDecimal(v).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val nn = mx.length.toDouble
    val b0 = snap9(mx.sum / nn)
    val b1 = snap9(mx.zipWithIndex.map { case (v, i) => v * i }.sum /
      (nn * (nn - 1)))
    val b2 = snap9(mx.zipWithIndex.map { case (v, i) =>
      v * i * (i - 1)
    }.sum / (nn * (nn - 1) * (nn - 2)))
    assert(math.abs(b0 - l1) < 0.01, s"l1 $l1 vs $b0")
    assert(math.abs(2 * b1 - b0 - l2) < 0.01, s"l2 $l2 vs ${2 * b1 - b0}")
    val t3b = (6 * b2 - 6 * b1 + b0) / (2 * b1 - b0)
    assert(math.abs(t3b - t3) < 1e-4)
    val c = 2.0 / (3.0 + t3b) - 0.6309297535714574
    val kb = 7.859 * c + 2.9554 * c * c
    assert(math.abs(kb - k) < 1e-4, s"k $k vs $kb")
    val sb = (2 * b1 - b0) * kb /
      ((1.0 - math.pow(2.0, -kb)) * gamma1p(kb))
    assert(math.abs(sb - sigma) < 0.5, s"sigma $sigma vs $sb")
    val mb = b0 - sb * (1.0 - gamma1p(kb)) / kb
    assert(math.abs(mb - mu) < 0.5, s"mu $mu vs $mb")
    assert(rl > mu, "the 100-block return level exceeds the location")
    assert(l2 > 0)
  }

  test("x_pot_gpd: threshold is the rank-selected p90, the exceedance " +
      "count matches, and the GPD chain reproduces shape/scale") {
    val r = run("x_pot_gpd").collect().head
    val (u, m, k, sigma, rl) = (r.getDouble(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(5))
    val days = graft.Tables(spark, sf).orders
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(round(sum(col("o_totalprice")), 2).as("r"))
      .collect().map(_.getDouble(1)).sorted
    val n = days.length
    val uB = days((9 * n + 9) / 10 - 1)
    assert(math.abs(uB - u) < 1e-9, s"threshold $u vs brute $uB")
    val ex = days.filter(_ > u).map(_ - u).sorted
    assert(ex.length == m)
    val nn = ex.length.toDouble
    def snap9(v: Double) = BigDecimal(v).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val b0 = snap9(ex.sum / nn)
    val b1 = snap9(ex.zipWithIndex.map { case (v, i) => v * i }.sum /
      (nn * (nn - 1)))
    val (l1b, l2b) = (b0, 2 * b1 - b0)
    assert(math.abs(l1b / l2b - 2.0 - k) < 1e-4, s"k $k")
    assert(math.abs(l1b * (l1b / l2b - 1.0) - sigma) < 0.5)
    assert(rl > u, "return level exceeds the threshold")
  }

  test("x_copula_corr: both correlations bounded, positively related " +
      "series, copula near the linear measure on near-linear data") {
    val r = run("x_copula_corr").collect().head
    val (cc, pc) = (r.getDouble(1), r.getDouble(2))
    assert(math.abs(cc) <= 1.0 + 1e-9 && math.abs(pc) <= 1.0 + 1e-9)
    assert(cc > 0.3 && pc > 0.3,
      s"daily count and revenue strongly related: copula $cc pearson $pc")
    assert(math.abs(cc - pc) < 0.3)
  }

  test("x_transfer_entropy: both directed TEs nonnegative (conditional " +
      "mutual information)") {
    val r = run("x_transfer_entropy").collect().head
    val (teYx, teXy, asym) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(teYx >= -1e-9, s"TE(Y->X) $teYx")
    assert(teXy >= -1e-9, s"TE(X->Y) $teXy")
    assert(math.abs(asym - (teYx - teXy)) < 1e-6)
    assert(teYx <= math.log(2.0) + 1e-9 && teXy <= math.log(2.0) + 1e-9,
      "binary-state TE is bounded by ln 2")
  }

  test("x_dtw_profile: nonnegative, bounded by the diagonal cost sum, " +
      "and zero against itself") {
    val r = run("x_dtw_profile").collect().head
    val (dtw, per) = (r.getDouble(0), r.getDouble(1))
    assert(dtw >= 0)
    assert(math.abs(per - dtw / 23.0) < 1e-5)
    // DTW <= sum over the full grid (any path costs less than all cells)
    assert(dtw < 24.0, "normalized profiles are O(1) — a sane bound")
  }

  test("x_page_l: L within the rank-sum bounds for n=12 blocks, k=5 " +
      "treatments") {
    val r = run("x_page_l").collect().head
    val (n, k, l) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(n == 12 && k == 5)
    // min Σ j·Rj = n·Σ j(k+1−j) = 12·35, max = n·Σ j² = 12·55
    assert(l >= 420 - 1e-6 && l <= 660 + 1e-6, s"L $l out of range")
  }

  test("x_seasonal_mk: S bounded by the total pair count; variance " +
      "positive; z sign matches S") {
    val r = run("x_seasonal_mk").collect().head
    val (nObs, s, varS, z) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))
    val mo = graft.Tables(spark, sf).orders
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mn"))
      .agg(count(lit(1))).count()
    assert(nObs == mo)
    assert(varS > 0)
    assert(math.abs(s) <= 12L * 7 * 6 / 2, s"S $s exceeds pair bound")
    assert((s > 0 && z >= 0) || (s < 0 && z <= 0) || (s == 0 && z == 0))
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_gev_lmom" -> "x_sql_gev",
      "x_pot_gpd" -> "x_sql_gpd",
      "x_copula_corr" -> "x_sql_copula",
      "x_transfer_entropy" -> "x_sql_te",
      "x_dtw_profile" -> "x_sql_dtw",
      "x_page_l" -> "x_sql_page",
      "x_seasonal_mk" -> "x_sql_smk")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
