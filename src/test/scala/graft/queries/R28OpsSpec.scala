package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-28 operators
  * (effect sizes, post-hoc tests, rolling robust diagnostics). */
class R28OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def snap(v: Double, dp: Int = 6) =
    BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def segPrices: Map[String, Seq[Double]] = {
    val t = Tables(spark, sf)
    t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  private def varS(xs: Seq[Double]): Double = {
    val m = xs.sum / xs.length
    xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
  }

  test("x_cliffs_delta equals the brute-force pairwise comparison") {
    val sp = segPrices
    val (a, b) = (sp("BUILDING"), sp("MACHINERY"))
    var gt = 0L; var lt = 0L
    for (x <- a; y <- b) { if (x > y) gt += 1 else if (x < y) lt += 1 }
    val delta = (gt - lt).toDouble / (a.length.toLong * b.length)
    val row = SparkEntry.queries("x_cliffs_delta")(spark, sf).collect().head
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(math.abs(row.getDouble(4) - delta) < 1e-6)
  }

  test("x_welch_anova matches the direct Welch F from snapped moments") {
    val sp = segPrices
    val st = sp.toSeq.map { case (_, xs) =>
      (xs.length.toLong, snap(xs.sum / xs.length), snap(varS(xs)))
    }
    val k = st.length
    val wts = st.map { case (n, m, s2) => (n, m, n / s2) }
    val sw = wts.map(_._3).sum
    val mbar = wts.map(w => w._3 * w._2).sum / sw
    val aa = wts.map(w => w._3 * (w._2 - mbar) * (w._2 - mbar)).sum
    val bb = st.zip(wts).map { case ((n, _, _), (_, _, wt)) =>
      (1 - wt / sw) * (1 - wt / sw) / (n - 1)
    }.sum
    val f = (aa / (k - 1)) / (1 + 2.0 * (k - 2) * bb / (k.toLong * k - 1))
    val row = SparkEntry.queries("x_welch_anova")(spark, sf).collect().head
    assert(row.getLong(0) === (k - 1).toLong)
    assert(math.abs(row.getDouble(2) - f) < 1e-3)
  }

  test("x_cohens_d matches a direct each-vs-rest effect size") {
    val sp = segPrices
    val all = sp.values.flatten.toSeq
    val rows = SparkEntry.queries("x_cohens_d")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((g, xs) <- sp) {
      val rest = all.diff(xs)
      // direct (unsnapped) pooled-SD d; the engine snaps moments at 6dp
      // so agreement is to ~1e-3
      val sp2 = ((xs.length - 1) * varS(xs) + (rest.length - 1) * varS(rest)) /
        (all.length - 2)
      val d = (xs.sum / xs.length - rest.sum / rest.length) / math.sqrt(sp2)
      assert(math.abs(rows(g) - d) < 1e-3, s"segment $g")
    }
  }

  test("x_tukey_hsd q-statistics match the direct Tukey-Kramer form") {
    val sp = segPrices
    val st = sp.view.mapValues(xs =>
      (xs.length.toLong, snap(xs.sum / xs.length), snap(varS(xs)))).toMap
    val nn = st.values.map(_._1).sum
    val msw = st.values.map { case (n, _, s2) => (n - 1) * s2 }.sum /
      (nn - st.size)
    val rows = SparkEntry.queries("x_tukey_hsd")(spark, sf).collect()
    assert(rows.length === st.size * (st.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (st(r.getString(0)), st(r.getString(1)))
      val q = math.abs(a._2 - b._2) /
        math.sqrt(msw / 2 * (1.0 / a._1 + 1.0 / b._1))
      assert(math.abs(r.getDouble(3) - q) < 1e-3)
    }
  }

  test("x_friedman matches direct blocked average ranks") {
    val t = Tables(spark, sf)
    val cells = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(month(col("o_orderdate")).as("b"),
        col("c_mktsegment").as("g"))
      .agg(avg(col("o_totalprice")).as("m"))
      .collect().toSeq.map(r => (r.getInt(0), r.getString(1), snap(r.getDouble(2))))
    val byBlock = cells.groupBy(_._1)
    val ranks = cells.map { case (b, g, m) =>
      val peers = byBlock(b)
      val less = peers.count(_._3 < m)
      val eq = peers.count(_._3 == m)
      (g, less + (eq + 1) / 2.0)
    }
    val rj = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = byBlock.size
    val k = cells.map(_._2).distinct.size
    val chi2 = 12.0 / (n.toLong * k * (k + 1)) *
      rj.values.map(r => r * r).sum - 3.0 * n * (k + 1)
    val rows = SparkEntry.queries("x_friedman")(spark, sf).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - rj(r.getString(0))) < 1e-9)
      assert(r.getLong(2) === n.toLong)
      assert(math.abs(r.getDouble(4) - chi2) < 1e-3)
    }
  }

  test("x_mood_median: lower median cut and integer contingency") {
    val sp = segPrices
    val all = sp.values.flatten.toSeq.sorted
    val med = all((all.length + 1) / 2 - 1) // lower median, 1-based (n+1)/2
    val rows = SparkEntry.queries("x_mood_median")(spark, sf).collect()
    var a = 0L; var nn = 0L
    rows.foreach { r =>
      val xs = sp(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === xs.count(_ > med).toLong)
      a += r.getLong(2); nn += r.getLong(1)
    }
    // chi2 re-derived from the engine's own counts
    val chi2 = rows.map { r =>
      val (ng, ab) = (r.getLong(1), r.getLong(2))
      val e1 = ng * a / nn.toDouble; val e0 = ng * (nn - a) / nn.toDouble
      (ab - e1) * (ab - e1) / e1 +
        ((ng - ab) - e0) * ((ng - ab) - e0) / e0
    }.sum
    assert(math.abs(rows.head.getDouble(4) - chi2) < 1e-3)
  }

  test("x_hampel: rolling median/MAD window picks and the outlier rule") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(avg(col("value")).as("x"))
      .collect().toSeq.map(r => (r.getDate(0).toLocalDate, snap(r.getDouble(1))))
      .sortBy(_._1.toEpochDay)
    def lowerMed(xs: Seq[Double]) = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val rows = SparkEntry.queries("x_hampel")(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate,
        (r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap
    daily.zipWithIndex.foreach { case ((d, x), i) =>
      val win = daily.slice(math.max(0, i - 3), math.min(daily.length, i + 4))
        .map(_._2)
      val med = lowerMed(win)
      val mad = lowerMed(win.map(v => math.abs(v - med)))
      val (rm, rmad, flag) = rows(d)
      assert(math.abs(rm - snap(med)) < 1e-9)
      assert(math.abs(rmad - snap(mad)) < 1e-9)
      assert(flag === (if (math.abs(x - med) > 3 * 1.4826 * mad) 1 else 0))
    }
  }

  test("x_rolling_quantile: trailing p90 is the ceil(0.9n) order statistic") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(avg(col("value")).as("x"))
      .collect().toSeq.map(r => (r.getDate(0).toLocalDate, snap(r.getDouble(1))))
      .sortBy(_._1.toEpochDay)
    val rows = SparkEntry.queries("x_rolling_quantile")(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDouble(2)).toMap
    daily.zipWithIndex.foreach { case ((d, _), i) =>
      val win = daily.slice(math.max(0, i - 13), i + 1).map(_._2).sorted
      val p90 = win(math.ceil(0.9 * win.length).toInt - 1)
      assert(math.abs(rows(d) - p90) < 1e-9, s"day $d")
    }
  }

  test("x_poisson_dispersion equals the direct daily-count moments") {
    val dc = Tables(spark, sf).events
      .groupBy(col("event_type"), to_date(col("ts")).as("d")).count()
      .collect().toSeq.map(r => (r.getString(0), r.getLong(2).toDouble))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = SparkEntry.queries("x_poisson_dispersion")(spark, sf).collect()
    rows.foreach { r =>
      val xs = dc(r.getString(0))
      val m = snap(xs.sum / xs.length); val s2 = snap(varS(xs))
      assert(r.getLong(1) === xs.length.toLong)
      assert(math.abs(r.getDouble(4) - s2 / m) < 1e-3)
      assert(math.abs(r.getDouble(5) - (xs.length - 1) * s2 / m) < 1e-3)
    }
  }
}
