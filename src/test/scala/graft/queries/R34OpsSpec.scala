package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Analytic invariants and independent re-derivations for the round-34
  * batch (embedding-geometry + time-series diagnostics). */
class R34OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_intrinsic_dim: the estimate is positive and at most the " +
      "ambient dimension's ballpark; probes with zero-distance clones " +
      "still yield a finite value") {
    val row = run("x_intrinsic_dim").collect().head
    val (n, id) = (row.getLong(0), row.getDouble(1))
    assert(n > 0)
    assert(id > 0 && id < 200, s"implausible intrinsic dim $id")
  }

  test("x_rich_club: phi in [0, 1], monotone club sizes, and the " +
      "edge counts are consistent with the club sizes") {
    val rows = run("x_rich_club").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nK, edges, phi) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(phi >= 0 && phi <= 1 + 1e-9)
      assert(edges <= nK * (nK - 1) / 2)
    }
    // larger k => smaller (or equal) club
    val byK = rows.map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    byK.zip(byK.tail).foreach { case ((_, n1), (_, n2)) =>
      assert(n2 <= n1)
    }
  }

  test("x_holt_forecast: level/trend algebra is self-consistent " +
      "(forecast = level + 7*trend) and level tracks the series scale") {
    val row = run("x_holt_forecast").collect().head
    val (level, trend, fc, lastY) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(math.abs(fc - (level + 7 * trend)) < 1e-4)
    assert(level > 0 && level < lastY * 10 + 100)
  }

  test("x_sprt: decision agrees with the boundary the trajectory hit " +
      "and the final llr is finite") {
    val row = run("x_sprt").collect().head
    val decision = row.getString(2)
    assert(Set("accept_h1", "accept_h0", "continue")(decision))
    if (decision == "continue") assert(row.isNullAt(1))
    else assert(!row.isNullAt(1))
    assert(!row.getDouble(3).isNaN)
  }

  test("x_ndcg: per-probe ndcg in [0, 1], dcg <= idcg, one row per probe") {
    val rows = run("x_ndcg").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-9) // dcg <= idcg
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1 + 1e-9)
    }
  }

  test("x_ar2_yw: the Yule-Walker solution reproduces r1 through the " +
      "implied ACF identity r1 = phi1 / (1 - phi2)") {
    val row = run("x_ar2_yw").collect().head
    val (r1, phi1, phi2) =
      (row.getDouble(1), row.getDouble(3), row.getDouble(4))
    assert(math.abs(phi1 / (1 - phi2) - r1) < 1e-4)
    assert(math.abs(phi2) < 1, "stationarity")
  }

  test("x_cochrane_orcutt: |rho| < 1 and the corrected slope stays in " +
      "the OLS slope's ballpark on this mildly-autocorrelated series") {
    val row = run("x_cochrane_orcutt").collect().head
    val (rho, bOls, bCo) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(math.abs(rho) < 1)
    assert(math.abs(bCo - bOls) < math.max(1.0, math.abs(bOls) * 3 + 1))
  }
}
