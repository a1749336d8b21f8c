package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Analytic invariants for the round-35 batch (errors-in-variables,
  * outlier scoring, concentration/concordance). */
class R35OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_deming: the Deming slope satisfies its defining quadratic " +
      "sxy·b² + (sxx − syy)·b − sxy = 0 and lies beyond OLS " +
      "(attenuation correction)") {
    val row = run("x_deming").collect().head
    val (bd, bOls) = (row.getDouble(1), row.getDouble(3))
    val m = Tables(spark, sf).lineitem.agg(
      round(var_samp(col("l_quantity")), 6),
      round(var_samp(col("l_extendedprice") / 1000.0), 6),
      round(covar_samp(col("l_quantity"),
        col("l_extendedprice") / 1000.0), 6)).head()
    val (sxx, syy, sxy) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    val resid = sxy * bd * bd + (sxx - syy) * bd - sxy
    assert(math.abs(resid) < math.max(1e-3, math.abs(sxy * bd) * 1e-3),
      s"quadratic residual $resid at b=$bd")
    // |b_deming| >= |b_ols| always (OLS attenuates toward zero)
    assert(math.abs(bd) >= math.abs(bOls) - 1e-9)
  }

  test("x_hbos: scores are the sum of three -ln frequencies, so the " +
      "top outlier's score is bounded by 3·ln(N), and scores descend") {
    val rows = run("x_hbos").collect()
    assert(rows.length === 10)
    val n = Tables(spark, sf).orders.count()
    val scores = rows.map(_.getDouble(1))
    assert(scores.head <= 3 * math.log(n.toDouble) + 1e-6)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.forall(_ > 0))
  }

  test("x_mahalanobis: d² nonnegative and descending; the released " +
      "top-10 dominates a random row's distance") {
    val rows = run("x_mahalanobis").collect()
    assert(rows.length === 10)
    val d2s = rows.map(_.getDouble(2))
    assert(d2s.forall(_ >= 0))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b })
    // with 3 dimensions, mean d² ~ 3; the top outlier must exceed it
    assert(d2s.head > 3.0)
  }

  test("x_dirichlet_mom: mean shares sum to 1 and alphas are positive " +
      "with alpha_k proportional to the mean share") {
    val rows = run("x_dirichlet_mom").collect()
    assert(rows.length > 1)
    val sumM = rows.map(_.getDouble(1)).sum
    assert(math.abs(sumM - 1.0) < 1e-3, s"shares sum to $sumM")
    val ratios = rows.filter(_.getDouble(1) > 0)
      .map(r => r.getDouble(3) / r.getDouble(1))
    // alpha_k / m_k = alpha0 for every k
    assert(ratios.max - ratios.min < math.abs(ratios.head) * 1e-2 + 0.02)
  }

  test("x_ppr: mass concentrates at the seed, all scores nonnegative, " +
      "and total mass is <= 1 (teleport-lossy on dangling-free graphs " +
      "it approaches 1)") {
    val rows = run("x_ppr").collect()
    val byNation = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byNation.values.forall(_ >= 0))
    // the seed's teleport term alone guarantees >= 0.15 (a hub can
    // legitimately out-rank a low-degree seed, so max is NOT asserted)
    val seed = byNation.keys.min
    assert(byNation(seed) >= 0.15 - 1e-6,
      s"seed rank ${byNation(seed)} below its own teleport mass")
    val total = byNation.values.sum
    assert(total > 0.5 && total < 1.01, s"mass $total")
  }

  test("x_kendall_w: W in [0, 1] and consistent with its chi2 " +
      "approximation chi2 = m(n-1)W") {
    val row = run("x_kendall_w").collect().head
    val (n, m, w, chi2) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(w >= 0 && w <= 1)
    assert(math.abs(chi2 - m * (n - 1) * w) < 0.01 * math.max(chi2, 1))
  }
}
