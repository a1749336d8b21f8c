package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-19 operators:
  * textbook Brandes betweenness via BFS accumulation, loop-based
  * Mann-Kendall and Pettitt statistics, direct mode/geometric/harmonic
  * means, and a sort-based Lorenz table.
  */
class R19OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x_graph_betweenness matches textbook Brandes on the derived graph") {
    val t = Tables(spark, sf)
    val edges = t.lineitem.filter(col("l_extendedprice") > 104500)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("c_nationkey"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
      .filter(p => p._1 != p._2).distinct
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    val btw = scala.collection.mutable.Map(nodes.map(_ -> 0.0): _*)
    nodes.foreach { src =>
      // Brandes single-source: BFS orders, path counts, dependency pass
      val dist = scala.collection.mutable.Map(src -> 0)
      val sigma = scala.collection.mutable.Map(src -> 1.0)
      val preds = scala.collection.mutable.Map.empty[Int, List[Int]]
      val order = scala.collection.mutable.ArrayBuffer.empty[Int]
      val queue = scala.collection.mutable.Queue(src)
      while (queue.nonEmpty) {
        val u = queue.dequeue(); order += u
        adj.getOrElse(u, Nil).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dist(u) + 1; queue += w }
          if (dist(w) == dist(u) + 1) {
            sigma(w) = sigma.getOrElse(w, 0.0) + sigma(u)
            preds(w) = u :: preds.getOrElse(w, Nil)
          }
        }
      }
      val delta = scala.collection.mutable.Map(order.toSeq.map(_ -> 0.0): _*)
      order.reverse.foreach { w =>
        preds.getOrElse(w, Nil).foreach { u =>
          delta(u) += sigma(u) / sigma(w) * (1 + delta(w))
        }
        if (w != src) btw(w) += delta(w)
      }
    }
    val out = SparkEntry.queries("x_graph_betweenness")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.keySet === nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(out(v) - btw(v)) < 1e-3, s"node $v")
    }
  }

  private def dailySeries(agg: String): Array[(Long, Double)] = {
    val c = if (agg == "count") count(lit(1)).cast("double")
      else round(avg(col("value")), 6)
    Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("d")).agg(c.as("v"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getDouble(1)))
      .sortBy(_._1)
  }

  test("x_mann_kendall matches the direct pairwise S and tie-corrected z") {
    val xs = dailySeries("mean").map(_._2)
    val n = xs.length
    var s0 = 0L
    for (i <- xs.indices; j <- (i + 1) until n)
      s0 += java.lang.Double.compare(xs(j), xs(i)).sign
    val tt = xs.groupBy(identity).values.filter(_.length > 1)
      .map(g => g.length.toDouble * (g.length - 1) * (2 * g.length + 5)).sum
    val v = (n.toDouble * (n - 1) * (2 * n + 5) - tt) / 18
    val z = if (s0 > 0) (s0 - 1) / math.sqrt(v)
      else if (s0 < 0) (s0 + 1) / math.sqrt(v) else 0.0
    val row = SparkEntry.queries("x_mann_kendall")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === s0)
    assert(math.abs(row.getDouble(2) - z) < 1e-3)
  }

  test("x_pettitt matches the direct rank-based U scan") {
    val daily = dailySeries("count")
    val xs = daily.map(_._2)
    val n = xs.length
    val sorted = xs.sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.length }
    var cum2 = 0L
    var best = 0L; var bestDay = Long.MaxValue
    daily.zipWithIndex.foreach { case ((d, x), i) =>
      cum2 += math.round(2 * avgRank(x))
      val ut = cum2 - (i + 1).toLong * (n + 1)
      if (math.abs(ut) > best) { best = math.abs(ut); bestDay = d }
    }
    val p = 2 * math.exp(-6.0 * best * best / (n.toDouble * n * n + n.toDouble * n))
    val row = SparkEntry.queries("x_pettitt")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === best)
    assert(row.getDate(2).toLocalDate.toEpochDay === bestDay)
    assert(math.abs(row.getDouble(3) - p) < 1e-5)
  }

  test("x_mode_stats matches direct mode / geometric / harmonic means") {
    val rows = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val out = SparkEntry.queries("x_mode_stats")(spark, sf).collect()
    assert(out.length === rows.map(_._1).distinct.length)
    out.foreach { r =>
      val g = r.getString(0)
      val vs = rows.filter(_._1 == g).map(_._2)
      val freq = vs.groupBy(identity).view.mapValues(_.size).toMap
      val maxF = freq.values.max
      val mode = freq.filter(_._2 == maxF).keys.min
      val geo = math.exp(vs.map(math.log).sum / vs.length)
      val harm = vs.length / vs.map(1.0 / _).sum
      assert(r.getLong(1) === vs.length.toLong)
      assert(r.getDouble(2) === mode, s"$g mode")
      assert(math.abs(r.getDouble(3) - geo) < 1e-3, s"$g geo")
      assert(math.abs(r.getDouble(4) - harm) < 1e-3, s"$g harm")
      assert(r.getDouble(5) === (vs.min + vs.max) / 2, s"$g midrange")
    }
  }

  test("x_lorenz_deciles: shares sum to 1, cum monotone, below diagonal") {
    val out = SparkEntry.queries("x_lorenz_deciles")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 10)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-6)
    assert(math.abs(out.last.getDouble(3) - 1.0) < 1e-9)
    out.sliding(2).foreach { case Array(p, q) =>
      assert(q.getDouble(3) > p.getDouble(3))
      // ascending-spend deciles: shares increase with decile
      assert(q.getDouble(2) >= p.getDouble(2) - 1e-9)
    }
    // Lorenz curve sits on/below the equality diagonal
    out.foreach { r =>
      assert(r.getDouble(3) <= r.getInt(0) / 10.0 + 1e-9)
    }
    // spot-check decile 1 share against a direct sort
    val spends = Tables(spark, sf).orders.groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice")), 2).as("s"))
      .collect().map(r => r.getDouble(1)).sorted
    val n = spends.length
    val d1size = out.head.getLong(1).toInt
    assert(math.abs(d1size - (n / 10 + (if (n % 10 >= 1) 1 else 0))) <= 0)
    val cents = spends.map(s => math.round(s * 100))
    val d1 = cents.take(d1size).sum.toDouble / cents.sum
    assert(math.abs(out.head.getDouble(2) - d1) < 1e-6)
  }
}
