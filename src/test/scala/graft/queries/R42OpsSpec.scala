package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-42 batch (normal-scores tests via
  * the portable Acklam Φ⁻¹). The x_sql_* twins share oracle texts and
  * are covered by the Verify gate. */
class R42OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("normInvSql: the portable fragment reproduces known normal " +
      "quantiles to ~1e-8") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val probs = Seq(0.001, 0.01, 0.02425, 0.025, 0.5, 0.84134474,
      0.975, 0.97575, 0.99, 0.999)
    val expect = Map(0.001 -> -3.090232306, 0.01 -> -2.326347874,
      0.025 -> -1.959963985, 0.5 -> 0.0, 0.84134474 -> 0.99999998,
      0.975 -> 1.959963985, 0.99 -> 2.326347874, 0.999 -> 3.090232306)
    val got = probs.toDF("p")
      .withColumn("x", expr(R42Ops.normInvSql("p")))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    expect.foreach { case (p, z) =>
      assert(math.abs(got(p) - z) < 1e-6, s"phi-inv($p): ${got(p)} vs $z")
    }
    // branch continuity at the 0.02425 / 0.97575 seams
    assert(math.abs(got(0.02425) - (-1.97222)) < 1e-3)
    assert(math.abs(got(0.97575) - 1.97222) < 1e-3)
  }

  test("x_vdw_test: scores sum to ~0 across segments (weighted), " +
      "t_stat nonnegative and shared by all rows") {
    val rows = run("x_vdw_test").collect()
    assert(rows.length == 5)
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val n = rows.map(_.getLong(1)).sum
    assert(math.abs(weighted / n) < 0.01, s"mean score $weighted / $n")
    val ts = rows.map(_.getDouble(3)).distinct
    assert(ts.length == 1 && ts.head >= 0)
  }

  test("x_fligner_killeen: chi2 nonnegative and shared, per-segment " +
      "mean scores positive (scores are upper-half quantiles)") {
    val rows = run("x_fligner_killeen").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDouble(2) > 0))
    val chi = rows.map(_.getDouble(3)).distinct
    assert(chi.length == 1 && chi.head >= 0)
  }

  test("x_shapiro_francia: W' in (0,1], and well below 1 for the " +
      "fixture's non-normal uniform-ish quantity") {
    val row = run("x_shapiro_francia").collect().head
    val (n, w) = (row.getLong(0), row.getDouble(1))
    assert(n > 100)
    assert(w > 0 && w <= 1 + 1e-9)
    assert(w < 0.995, s"uniform-ish data should not look normal: $w")
  }
}
