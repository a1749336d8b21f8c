package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-13 statistics
  * (sort-based AUC, direct WoE, median-by-sorting Brown-Forsythe, direct
  * DFT) against the distributed binned/heap forms, plus the KMV sketch's
  * small-group fallback and error-bound contracts.
  */
class R13OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_auc_rank equals the direct rank-based AUC") {
    val rows = Tables(spark, sf).orders
      .select(col("o_totalprice"), (col("o_orderstatus") === "F").cast("int"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val sorted = rows.map(_._1).sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.length) }
    val pos = rows.filter(_._2 == 1)
    val nPos = pos.length.toDouble
    val nNeg = rows.length - nPos
    val rPos = pos.map(p => avgRank(p._1)).sum
    val auc = (rPos - nPos * (nPos + 1) / 2.0) / (nPos * nNeg)
    val row = SparkEntry.queries("x_auc_rank")(spark, sf).collect().head
    assert(row.getLong(0) === nPos.toLong && row.getLong(1) === nNeg.toLong)
    assert(math.abs(row.getDouble(2) - auc) < 1e-5)
    assert(math.abs(row.getDouble(3) - (2 * auc - 1)) < 1e-5)
  }

  test("x_woe_iv matches direct per-category WoE; IV terms are finite") {
    val rows = Tables(spark, sf).orders
      .select(col("o_orderpriority"), (col("o_orderstatus") === "F").cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val posT = rows.count(_._2 == 1).toDouble
    val negT = rows.length - posT
    val out = SparkEntry.queries("x_woe_iv")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val cat = r.getString(0)
      val p = rows.count(x => x._1 == cat && x._2 == 1).toDouble
      val n = rows.count(x => x._1 == cat && x._2 == 0).toDouble
      val woe = math.log((p / posT) / (n / negT))
      assert(r.getLong(1) === p.toLong && r.getLong(2) === n.toLong)
      assert(math.abs(r.getDouble(3) - woe) < 1e-3, cat)
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
    }
  }

  test("x_levene_bf matches the direct median-centered ANOVA") {
    val t = Tables(spark, sf)
    val rows = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def median(vs: Array[Double]): Double = {
      val s = vs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val zG = groups.map { case (g, vs) =>
      val m = median(vs); g -> vs.map(v => math.abs(v - m))
    }
    val k = zG.size
    val nn = zG.values.map(_.length).sum
    val gm = zG.values.flatten.sum / nn
    val ssb = zG.values.map { zs =>
      val m = zs.sum / zs.length; zs.length * (m - gm) * (m - gm)
    }.sum
    val ssw = zG.values.map { zs =>
      val m = zs.sum / zs.length; zs.map(z => (z - m) * (z - m)).sum
    }.sum
    val w = (ssb / (k - 1)) / (ssw / (nn - k))
    val row = SparkEntry.queries("x_levene_bf")(spark, sf).collect().head
    assert(row.getLong(0) === (k - 1).toLong)
    assert(row.getLong(1) === (nn - k).toLong)
    assert(math.abs(row.getDouble(2) - w) < 1e-3)
  }

  test("x_periodogram matches a direct DFT at every period") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1).toDouble))
      .sortBy(_._1.toEpochDay)
    val d0 = daily.head._1.toEpochDay
    val mc = BigDecimal(daily.map(_._2).sum / daily.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = SparkEntry.queries("x_periodogram")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.keySet === (2 to 14).toSet)
    (2 to 14).foreach { t =>
      val (ct, st) = daily.foldLeft((0.0, 0.0)) { case ((a, b), (day, c)) =>
        val ang = 2 * math.Pi * (day.toEpochDay - d0) / t
        (a + (c - mc) * math.cos(ang), b + (c - mc) * math.sin(ang))
      }
      val want = ct * ct + st * st
      assert(math.abs(out(t) - want) <= 0.01 + math.abs(want) * 1e-9, s"T=$t")
    }
  }

  test("x_sketch_kmv: exact counts line up; small groups fall back; big groups bound error") {
    val t = Tables(spark, sf)
    val exact = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("x_sketch_kmv")(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)))
      if (r.getLong(1) < 64) // sub-k group: the sketch IS the exact count
        assert(r.getDouble(2) === r.getLong(1).toDouble, r.getString(0))
    }
    // at sf0.01 every segment exceeds k=64 → real estimates, bounded error
    val big = SparkEntry.queries("x_sketch_kmv")(spark, "/root/testdata/sf0.01")
      .collect()
    big.foreach { r =>
      assert(r.getLong(1) > 64, r.getString(0))
      assert(r.getDouble(2) != r.getLong(1).toDouble || r.getDouble(3) == 0.0)
      assert(r.getDouble(3) < 0.5, s"${r.getString(0)}: ${r.getDouble(3)}")
    }
  }
}
