package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-36 batch (survival extensions,
  * IPW, CLV). The seven x_sql_* twins in this batch share oracle texts
  * with already-spec'd operators and are covered by the Verify gate. */
class R36OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_nelson_aalen: cumulative hazard is nondecreasing, survival " +
      "nonincreasing, and exp(-H) dominates the KM product everywhere") {
    val na = run("x_nelson_aalen").collect().sortBy(_.getLong(0))
    assert(na.nonEmpty)
    val hs = na.map(_.getDouble(3))
    assert(hs.zip(hs.tail).forall { case (a, b) => b >= a - 1e-9 })
    val km = run("x_survival_km").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    na.foreach { r =>
      val t = r.getLong(0)
      km.get(t).foreach { s =>
        // Fleming-Harrington >= Kaplan-Meier (1-x <= e^-x termwise)
        assert(r.getDouble(4) >= s - 1e-6,
          s"FH ${r.getDouble(4)} < KM $s at t=$t")
      }
    }
  }

  test("x_weibull_plot: shape positive, scale positive, fit quality " +
      "reported as a proper R²") {
    val row = run("x_weibull_plot").collect().head
    val (n, k, lambda, r2) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(n > 2)
    assert(k > 0 && lambda > 0)
    assert(r2 >= 0 && r2 <= 1)
  }

  test("x_life_table: q_x are probabilities, survival is nonincreasing " +
      "and matches the cumulative product of (1 - q_x)") {
    val rows = run("x_life_table").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    var prod = 1.0
    rows.foreach { r =>
      val (qx, surv) = (r.getDouble(4), r.getDouble(5))
      assert(qx >= 0 && qx < 1)
      prod *= (1 - qx)
      assert(math.abs(surv - prod) < 5e-5, s"survival $surv vs $prod")
    }
  }

  test("x_ate_ipw: IPW means are proper fractions and the ATE is their " +
      "difference; with a near-constant propensity IPW ~ naive") {
    val row = run("x_ate_ipw").collect().head
    val (mu1, mu0, ate, naive) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4))
    assert(mu1 >= 0 && mu1 <= 1 && mu0 >= 0 && mu0 <= 1)
    assert(math.abs(ate - (mu1 - mu0)) < 2e-6)
    // the fixture's treatment is ~independent of month, so weighting
    // barely moves the estimate
    assert(math.abs(ate - naive) < 0.05)
  }

  test("x_clv: retention is a proper fraction and CLV reproduces the " +
      "geometric formula from the released columns") {
    val row = run("x_clv").collect().head
    val (ret, rev, clv) =
      (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    assert(ret > 0 && ret < 1)
    assert(rev > 0)
    assert(math.abs(clv - rev * ret / (1.01 - ret))
      < math.max(0.01, clv * 1e-3))
  }
}
