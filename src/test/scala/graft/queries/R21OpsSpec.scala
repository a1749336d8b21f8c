package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations of the round-21 operators:
  * direct modularity/reciprocity/eccentricity on the collected graph,
  * a sort-based ABC classification, and sort-based QQ deciles.
  */
class R21OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def graph: (Array[(Int, Int)], Map[Int, Int]) = {
    val t = Tables(spark, sf)
    val edges = t.lineitem.filter(col("l_extendedprice") > 104500)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("c_nationkey"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
      .filter(p => p._1 != p._2).distinct
    val regions = t.nation.select(col("n_nationkey"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    (edges, regions)
  }

  test("x_graph_modularity matches the direct directed-modularity sum") {
    val (edges, reg) = graph
    val m = edges.length.toDouble
    val regs = reg.values.toSeq.distinct
    val expect = regs.map { c =>
      val internal = edges.count(e => reg(e._1) == c && reg(e._2) == c)
      val outDeg = edges.count(e => reg(e._1) == c)
      val inDeg = edges.count(e => reg(e._2) == c)
      c -> (internal, outDeg, inDeg,
        internal / m - (outDeg / m) * (inDeg / m))
    }.toMap
    val q = expect.values.map(_._4).sum
    val out = SparkEntry.queries("x_graph_modularity")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet === expect.keySet)
    out.foreach { r =>
      val (i, o, in, contrib) = expect(r.getInt(0))
      assert(r.getLong(1) === i.toLong && r.getLong(2) === o.toLong
        && r.getLong(3) === in.toLong)
      assert(math.abs(r.getDouble(4) - contrib) < 1e-5)
      assert(math.abs(r.getDouble(5) - q) < 1e-5)
    }
  }

  test("x_graph_reciprocity matches the direct reverse-edge count") {
    val (edges, _) = graph
    val set = edges.toSet
    val rec = edges.count(e => set((e._2, e._1)))
    val row = SparkEntry.queries("x_graph_reciprocity")(spark, sf)
      .collect().head
    assert(row.getLong(0) === edges.length.toLong)
    assert(row.getLong(1) === rec.toLong)
    assert(math.abs(row.getDouble(2) - rec.toDouble / edges.length) < 1e-6)
  }

  test("x_graph_eccentricity matches direct BFS; diameter/radius consistent") {
    val (edges, _) = graph
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
    val eccs = nodes.map { src =>
      val dist = scala.collection.mutable.Map(src -> 0)
      val q = scala.collection.mutable.Queue(src)
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj.getOrElse(u, Nil).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dist(u) + 1; q += w }
        }
      }
      src -> (dist.size - 1, dist.values.max)
    }.toMap
    val out = SparkEntry.queries("x_graph_eccentricity")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet === eccs.keySet)
    val dia = eccs.values.map(_._2).max
    val rad = eccs.values.map(_._2).min
    out.foreach { r =>
      val (reach, ecc) = eccs(r.getInt(0))
      assert(r.getLong(1) === reach.toLong, s"node ${r.getInt(0)}")
      assert(r.getInt(2) === ecc, s"node ${r.getInt(0)}")
      assert(r.getInt(3) === dia && r.getInt(4) === rad)
    }
  }

  test("x_abc_analysis matches the sort-based classification; shares sum to 1") {
    val spends = Tables(spark, sf).orders.groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice")), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(x => (-x._2, x._1))
    val cents = spends.map(x => math.round(x._2 * 100))
    val total = cents.sum.toDouble
    var below = 0L
    val classes = cents.map { c =>
      val cls = if (below / total < 0.80) "A"
        else if (below / total < 0.95) "B" else "C"
      below += c
      cls
    }
    val expect = classes.zip(spends).groupBy(_._1).map { case (cls, xs) =>
      cls -> (xs.length, xs.map(x => math.round(x._2._2 * 100)).sum / total,
        xs.map(_._2._2).min, xs.map(_._2._2).max)
    }
    val out = SparkEntry.queries("x_abc_analysis")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet === expect.keySet)
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    out.foreach { r =>
      val (n, share, mn, mx) = expect(r.getString(0))
      assert(r.getLong(1) === n.toLong, r.getString(0))
      assert(math.abs(r.getDouble(2) - share) < 1e-5)
      assert(r.getDouble(3) === mn && r.getDouble(4) === mx)
    }
  }

  test("x_qq_deciles matches sort-based quantile_cont per segment") {
    val rows = Tables(spark, sf).orders
      .join(Tables(spark, sf).customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def q(vs: Array[Double], p: Double): Double = {
      val s = vs.sorted
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      s(lo) + (h - lo) * (s(math.ceil(h).toInt) - s(lo))
    }
    val a = rows.filter(_._1 == "BUILDING").map(_._2)
    val b = rows.filter(_._1 == "MACHINERY").map(_._2)
    val out = SparkEntry.queries("x_qq_deciles")(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(out.length === 9)
    out.foreach { r =>
      val k = r.getInt(0)
      assert(math.abs(r.getDouble(1) - q(a, k / 10.0)) < 1e-3, s"A d$k")
      assert(math.abs(r.getDouble(2) - q(b, k / 10.0)) < 1e-3, s"B d$k")
      assert(math.abs(r.getDouble(3) - (r.getDouble(1) - r.getDouble(2)))
        < 1e-3)
    }
    // quantiles must be monotone in k per segment
    out.sliding(2).foreach { case Array(p1, p2) =>
      assert(p2.getDouble(1) >= p1.getDouble(1))
      assert(p2.getDouble(2) >= p1.getDouble(2))
    }
  }
}
