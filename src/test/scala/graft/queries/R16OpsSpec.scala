package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-16 operators:
  * sort-based interpolated quartiles + fence counts, direct 2×2 kappa,
  * loop-built transition entropy, Gumbel moments on sequential block
  * maxima, and a sort-based decile lift table.
  */
class R16OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_tukey_fences matches sort-based quantile_cont quartiles and outlier counts") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val out = SparkEntry.queries("x_tukey_fences")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val g = r.getString(0)
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      def q(p: Double): Double = {
        val h = (vs.length - 1) * p
        val lo = math.floor(h).toInt
        vs(lo) + (h - lo) * (vs(math.ceil(h).toInt) - vs(lo))
      }
      val (q1, q3) = (q(0.25), q(0.75))
      val iqr = q3 - q1
      val outliers =
        vs.count(v => v < q1 - 1.5 * iqr || v > q3 + 1.5 * iqr)
      assert(r.getLong(1) === vs.length.toLong)
      assert(math.abs(r.getDouble(2) - q1) < 1e-3, s"$g q1")
      assert(math.abs(r.getDouble(3) - q3) < 1e-3, s"$g q3")
      assert(r.getLong(5) === outliers.toLong, s"$g outliers")
    }
  }

  test("x_cohens_kappa matches the direct 2x2 computation") {
    val rows = Tables(spark, sf).orders
      .select(col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (
        if (r.getDouble(0) >= 150000) 1 else 0,
        if (Set("1-URGENT", "2-HIGH")(r.getString(1))) 1 else 0))
    val n = rows.length.toDouble
    val po = rows.count(x => x._1 == x._2) / n
    val pa1 = rows.count(_._1 == 1) / n
    val pb1 = rows.count(_._2 == 1) / n
    val pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    val kappa = (po - pe) / (1 - pe)
    val row = SparkEntry.queries("x_cohens_kappa")(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(math.abs(row.getDouble(1) - po) < 1e-5)
    assert(math.abs(row.getDouble(2) - pe) < 1e-5)
    assert(math.abs(row.getDouble(3) - kappa) < 1e-5)
    assert(row.getDouble(3) > -1 && row.getDouble(3) < 1)
  }

  test("x_entropy_rate matches the loop-built conditional entropy") {
    val ev = Tables(spark, sf).events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
        r.getLong(3)))
    val transitions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._4)).map(_._2)
      sorted.zip(sorted.tail)
    }.toSeq
    val bySrc = transitions.groupBy(_._1)
    val nTot = transitions.length.toDouble
    val hs = bySrc.map { case (src, ts) =>
      val ns = ts.length.toDouble
      src -> (ns, -ts.groupBy(_._2).values
        .map(g => g.length / ns * math.log(g.length / ns)).sum)
    }
    val rate = hs.values.map { case (ns, h) => ns / nTot * h }.sum
    val out = SparkEntry.queries("x_entropy_rate")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet === bySrc.keySet)
    out.foreach { r =>
      val (ns, h) = hs(r.getString(0))
      assert(r.getLong(1) === ns.toLong)
      assert(math.abs(r.getDouble(2) - h) < 1e-5, r.getString(0))
      assert(math.abs(r.getDouble(3) - rate) < 1e-5)
    }
  }

  test("x_gumbel_extremes matches direct moments; return levels ordered") {
    val hourly = Tables(spark, sf).events
      .groupBy(date_trunc("hour", col("ts")).as("h")).count()
      .collect().map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getLong(1).toDouble))
    val maxima = hourly.groupBy(_._1).values.map(_.map(_._2).max).toSeq
    val n = maxima.length
    val m = BigDecimal(maxima.sum / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = BigDecimal(math.sqrt(
        maxima.map(x => (x - maxima.sum / n) * (x - maxima.sum / n)).sum / (n - 1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val beta = s * math.sqrt(6) / math.Pi
    val mu = m - 0.5772156649015329 * beta
    val row = SparkEntry.queries("x_gumbel_extremes")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - mu) < 1e-3)
    assert(math.abs(row.getDouble(2) - beta) < 1e-3)
    val r10 = mu - beta * math.log(-math.log(1 - 0.1))
    val r100 = mu - beta * math.log(-math.log(1 - 0.01))
    assert(math.abs(row.getDouble(3) - r10) < 1e-3)
    assert(math.abs(row.getDouble(4) - r100) < 1e-3)
    assert(row.getDouble(4) > row.getDouble(3))
  }

  test("x_lift_gain matches a sort-based decile table; gain monotone to 1") {
    val rows = Tables(spark, sf).orders
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_orderstatus") === "F").cast("int"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .sortBy(x => (-x._2, x._1))
    val n = rows.length
    val sizes = {
      val base = n / 10; val rem = n % 10
      (1 to 10).map(i => if (i <= rem) base + 1 else base)
    }
    val cuts = sizes.scanLeft(0)(_ + _)
    val tiles = (1 to 10).map(i => rows.slice(cuts(i - 1), cuts(i)))
    val totPos = rows.map(_._3).sum.toDouble
    val out = SparkEntry.queries("x_lift_gain")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 10)
    var cumN = 0L; var cumPos = 0L
    out.zip(tiles).zipWithIndex.foreach { case ((r, tile), i) =>
      cumN += tile.length; cumPos += tile.map(_._3).sum
      assert(r.getInt(0) === i + 1)
      assert(r.getLong(1) === tile.length.toLong)
      assert(r.getLong(2) === tile.map(_._3).sum.toLong)
      assert(math.abs(r.getDouble(3) - cumPos / totPos) < 1e-5)
      assert(math.abs(r.getDouble(4) -
        (cumPos.toDouble / cumN) / (totPos / n)) < 1e-5)
    }
    assert(math.abs(out.last.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(out.last.getDouble(4) - 1.0) < 1e-9)
  }
}
