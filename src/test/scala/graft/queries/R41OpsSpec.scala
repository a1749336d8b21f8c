package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-41 batch (IV/Wald, regression
  * discontinuity, panel fixed effects, permutation inference,
  * mediation). The x_sql_* twins share oracle texts and are covered by
  * the Verify gate. */
class R41OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_iv_wald: both slopes finite, F nonnegative") {
    val row = run("x_iv_wald").collect().head
    val (n, bOls, bIv, f) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(n > 100)
    assert(!bOls.isNaN && !bOls.isInfinite)
    assert(!bIv.isNaN && !bIv.isInfinite)
    assert(f >= 0)
  }

  test("x_reg_disc: both sides populated inside the bandwidth, jump " +
      "bounded by the outcome range, z consistent with the jump sign") {
    val row = run("x_reg_disc").collect().head
    val (nl, nr, jump, z) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(nl > 10 && nr > 10)
    assert(math.abs(jump) <= 1.0 + 1e-9) // share outcome in [0,1]
    assert(math.signum(z) == math.signum(jump) || jump == 0.0)
  }

  test("x_panel_fe: 25 entities, r2_within in [0,1], within slope " +
      "finite") {
    val row = run("x_panel_fe").collect().head
    val (k, n, bp, bw, r2) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(k > 1 && k <= 25)
    assert(n > k)
    assert(!bp.isNaN && !bw.isNaN)
    assert(r2 >= 0 && r2 <= 1 + 1e-9)
  }

  test("x_permutation_ate: p in {0.05,...,1.0} on the 20-way " +
      "randomization grid and consistent with the exceedance rule") {
    val row = run("x_permutation_ate").collect().head
    val (n, obs, nullMax, p) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(n > 100)
    assert(!obs.isNaN && nullMax >= 0)
    assert(p >= 0.05 - 1e-9 && p <= 1.0 + 1e-9)
    // p is (1 + count)/20 — a multiple of 0.05
    assert(math.abs(p * 20 - math.round(p * 20)) < 1e-6)
    // if the largest null diff is below |obs|, no permutation exceeds
    if (nullMax < math.abs(obs) - 1e-6) assert(math.abs(p - 0.05) < 1e-9)
  }

  test("x_mediation: OLS identity c = ab + c' holds on the released " +
      "rounded paths, sobel finite") {
    val row = run("x_mediation").collect().head
    val (a, b, cp, ind, sobel, prop) = (row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getDouble(6))
    assert(math.abs(ind - a * b) < 1e-4)
    assert(!sobel.isNaN && !sobel.isInfinite)
    // prop_mediated = ab / (ab + c') within rounding of the identity
    val c = ind + cp
    if (math.abs(c) > 1e-6)
      assert(math.abs(prop - ind / c) < 1e-2)
  }
}
