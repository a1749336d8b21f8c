package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-25
  * experimentation operators.
  */
class R25OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_ate_strat matches the direct stratified effect") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (Set("1-URGENT", "2-HIGH")(r.getString(2))) 1 else 0))
    val byG = rows.groupBy(_._1)
    val ate = byG.values.map { xs =>
      val mt = xs.filter(_._3 == 1).map(_._2)
      val mc = xs.filter(_._3 == 0).map(_._2)
      xs.length * (mt.sum / mt.length - mc.sum / mc.length)
    }.sum / rows.length
    val out = SparkEntry.queries("x_ate_strat")(spark, sf).collect()
    assert(out.length === byG.size)
    out.foreach { r =>
      val xs = byG(r.getString(0))
      val mt = xs.filter(_._3 == 1).map(_._2)
      val mc = xs.filter(_._3 == 0).map(_._2)
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(2) - mt.sum / mt.length) < 1e-3)
      assert(math.abs(r.getDouble(3) - mc.sum / mc.length) < 1e-3)
      assert(math.abs(r.getDouble(5) - ate) < 1e-3)
    }
  }

  private def purchases: Array[(Long, Long, Double)] =
    Tables(spark, sf).events.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2)))

  private val cutoff = java.time.LocalDate.parse("2024-01-16").toEpochDay

  test("x_diff_in_diff matches the direct 4-cell computation") {
    val p = purchases
    def cell(arm: Long, post: Boolean): Double = {
      val xs = p.filter(x => x._1 % 2 == arm && (x._2 >= cutoff) == post)
      xs.map(_._3).sum / xs.length
    }
    val did = (cell(0, true) - cell(0, false)) -
      (cell(1, true) - cell(1, false))
    val row = SparkEntry.queries("x_diff_in_diff")(spark, sf).collect().head
    assert(row.getLong(0) === p.length.toLong)
    assert(math.abs(row.getDouble(1) - cell(0, false)) < 1e-3)
    assert(math.abs(row.getDouble(2) - cell(0, true)) < 1e-3)
    assert(math.abs(row.getDouble(5) - did) < 1e-3)
  }

  test("x_cuped matches the direct theta adjustment; variance shrinks") {
    val p = purchases
    val users = p.groupBy(_._1).map { case (u, xs) =>
      (u, xs.filter(_._2 < cutoff).map(_._3).sum,
        xs.filter(_._2 >= cutoff).map(_._3).sum)
    }.toSeq
    val n = users.length
    val mpreR = users.map(_._2).sum / n
    val mpost = users.map(_._3).sum / n
    val cov = users.map(u => (u._2 - mpreR) * (u._3 - mpost)).sum / (n - 1)
    val varPre = users.map(u => (u._2 - mpreR) * (u._2 - mpreR)).sum / (n - 1)
    def snap(v: Double, k: Int) = BigDecimal(v)
      .setScale(k, BigDecimal.RoundingMode.HALF_UP).toDouble
    val theta = snap(cov / varPre, 6)
    val mpre = snap(mpreR, 6)
    val adj = users.map(u => (u._1, u._3 - theta * (u._2 - mpre), u._3))
    def armMean(xs: Seq[(Long, Double, Double)], a: Long, f: ((Long, Double, Double)) => Double) = {
      val ys = xs.filter(_._1 % 2 == a); ys.map(f).sum / ys.length
    }
    val rawDiff = armMean(adj, 0, _._3) - armMean(adj, 1, _._3)
    val adjDiff = armMean(adj, 0, _._2) - armMean(adj, 1, _._2)
    val madj = adj.map(_._2).sum / n
    val varAdj = snap(adj.map(x => (x._2 - madj) * (x._2 - madj)).sum / (n - 1), 4)
    val varPost = snap(users.map(u => (u._3 - mpost) * (u._3 - mpost)).sum / (n - 1), 4)
    val row = SparkEntry.queries("x_cuped")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - theta) < 1e-5)
    assert(math.abs(row.getDouble(2) - rawDiff) < 1e-3)
    assert(math.abs(row.getDouble(3) - adjDiff) < 1e-3)
    assert(math.abs(row.getDouble(4) - (1 - varAdj / varPost)) < 1e-3)
    assert(row.getDouble(4) > 0) // pre-period covariate must help
  }

  test("x_srm_check matches the direct 1-df chi-square") {
    val users = Tables(spark, sf).events
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().collect().map(_.getLong(0))
    val n = users.length.toDouble
    val na = users.count(_ % 2 == 0).toDouble
    val chi2 = math.pow(na - n / 2, 2) / (n / 2) +
      math.pow((n - na) - n / 2, 2) / (n / 2)
    val row = SparkEntry.queries("x_srm_check")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong && row.getLong(1) === na.toLong)
    assert(row.getLong(2) === (n - na).toLong)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-3)
  }

  test("x_forecast_backtest matches the direct seasonal-naive errors") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    val dmax = daily.keys.max
    val test = daily.filter(_._1 > dmax - 10)
    val out = SparkEntry.queries("x_forecast_backtest")(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(1, 7))
    Seq(1, 7).foreach { k =>
      val pairs = test.toSeq.flatMap { case (d, a) =>
        daily.get(d - k).map(f => (a, f))
      }
      val mae = pairs.map(p => math.abs(p._1 - p._2).toDouble).sum / pairs.length
      val rmse = math.sqrt(pairs.map(p =>
        math.pow((p._1 - p._2).toDouble, 2)).sum / pairs.length)
      val mape = pairs.map(p =>
        math.abs(p._1 - p._2).toDouble / p._1).sum / pairs.length
      val r = out(k)
      assert(r.getLong(1) === pairs.length.toLong)
      assert(math.abs(r.getDouble(2) - mae) < 1e-3, s"lag $k mae")
      assert(math.abs(r.getDouble(3) - rmse) < 1e-3, s"lag $k rmse")
      assert(math.abs(r.getDouble(4) - mape) < 1e-5, s"lag $k mape")
    }
  }
}
