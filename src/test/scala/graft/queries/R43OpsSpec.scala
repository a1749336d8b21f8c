package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-43 batch (Croston, price
  * elasticity, Bass diffusion, newsvendor). The x_sql_* twins share
  * oracle texts and are covered by the Verify gate. */
class R43OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_croston: SES levels positive, interval >= 1 (gaps are whole " +
      "observed days), SBA = 0.95 * Croston") {
    val row = run("x_croston").collect().head
    val (n, sz, sx, cf, sba) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(n > 1)
    assert(sz > 0)
    assert(sx >= 1.0 - 1e-9)
    assert(math.abs(sba - 0.95 * cf) < 1e-4)
    assert(cf <= sz + 1e-9) // rate <= size since interval >= 1
  }

  test("x_price_elasticity: 10 brands, r2 in [0,1], ordered by " +
      "|elasticity| descending") {
    val rows = run("x_price_elasticity").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) > 1) // months per brand
      val r2 = r.getDouble(3)
      assert(r2 >= 0 && r2 <= 1 + 1e-9)
    }
    val es = rows.map(r => math.abs(r.getDouble(2)))
    assert(es.zip(es.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("x_bass: OLS plane fits the adoption curve; when the root " +
      "exists the p/q/m identities hold on released values") {
    val row = run("x_bass").collect().head
    val n = row.getLong(0)
    assert(n >= 3) // sf0.001's event window has ~5 adoption days
    val a = row.getDouble(1)
    assert(a > 0) // first-day adopters force a positive intercept path
    if (!row.isNullAt(4)) {
      val (c, m, p, q) = (row.getDouble(3), row.getDouble(4),
        row.getDouble(5), row.getDouble(6))
      assert(m > 0)
      assert(math.abs(p - a / m) < 1e-3)
      assert(math.abs(q - (-c * m)) < 1e-3)
      assert(p > 0 && q > -1)
    }
  }

  test("x_newsvendor: service level >= 90% by construction and within " +
      "one histogram step; expectations consistent with the mean " +
      "identity E[D] = q* - E[leftover] + E[short]") {
    val row = run("x_newsvendor").collect().head
    val (n, q, sl, lo, sh) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(n > 0)
    assert(q >= 1 && q <= 50)
    assert(sl >= 0.9 - 1e-9)
    assert(lo >= 0 && sh >= 0)
    // E[min identity]: E[D] = Q - E[(Q-D)+] + E[(D-Q)+]
    val spark2 = spark
    import spark2.implicits._
    val meanD = graft.Tables(spark, sf).lineitem
      .agg(org.apache.spark.sql.functions.avg("l_quantity"))
      .as[Double].head()
    assert(math.abs((q - lo + sh) - meanD) < 1e-2,
      s"mean identity: ${q - lo + sh} vs $meanD")
  }
}
