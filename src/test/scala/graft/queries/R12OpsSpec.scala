package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent re-derivations of the round-12 statistics: each test
  * recomputes the statistic in plain Scala from collected sf0.001 rows —
  * a different algorithm (sort-based ranks, direct loops) than the
  * distributed binned-prefix forms — and compares. The DuckDB oracle pins
  * cross-engine exactness; these pin that the distributed formulation
  * computes the *intended* statistic.
  */
class R12OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def pairs(): Array[(String, Double)] = {
    val t = Tables(spark, sf)
    t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
  }

  /** average-rank-for-ties over the combined sample, sort-based. */
  private def avgRanks(vs: Array[Double]): Map[Double, Double] = {
    val sorted = vs.sorted
    sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.length) }
  }

  test("x_mannwhitney matches a direct sort-based rank computation") {
    val all = pairs().filter(p => p._1 == "BUILDING" || p._1 == "MACHINERY")
    val ranks = avgRanks(all.map(_._2))
    val b = all.filter(_._1 == "BUILDING").map(_._2)
    val m = all.filter(_._1 == "MACHINERY").map(_._2)
    val (n1, n2) = (b.length.toDouble, m.length.toDouble)
    val r1 = b.map(ranks).sum
    val u1 = n1 * n2 + n1 * (n1 + 1) / 2.0 - r1
    val ties = all.map(_._2).groupBy(identity).values.map(_.length.toLong)
    val tie3 = ties.map(t => t * t * t - t).sum
    val n = n1 + n2
    val sigma = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))
    val z = (u1 - n1 * n2 / 2.0) / sigma
    val row = SparkEntry.queries("x_mannwhitney")(spark, sf).collect().head
    assert(row.getLong(0) === n1.toLong && row.getLong(1) === n2.toLong)
    assert(math.abs(row.getDouble(2) - u1) < 0.51) // query rounds to 1dp
    assert(math.abs(row.getDouble(3) - z) < 1e-3)
  }

  test("x_spearman_corr matches a direct rank-then-Pearson computation") {
    val t = Tables(spark, sf)
    val pa = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice"), col("c_acctbal"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val rv = avgRanks(pa.map(_._1)); val ra = avgRanks(pa.map(_._2))
    val xs = pa.map(p => rv(p._1)); val ys = pa.map(p => ra(p._2))
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
    val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
    val rho = cov / (sx * sy)
    val row = SparkEntry.queries("x_spearman_corr")(spark, sf).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - rho) < 1e-3)
  }

  test("x_anova_f matches the direct sums-of-squares computation") {
    val groups = pairs().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val nn = groups.values.map(_.length).sum
    val gm = groups.values.flatten.sum / nn
    val ssb = groups.values.map { vs =>
      val m = vs.sum / vs.length; vs.length * (m - gm) * (m - gm)
    }.sum
    val ssw = groups.values.map { vs =>
      val m = vs.sum / vs.length; vs.map(v => (v - m) * (v - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (nn - k))
    val row = SparkEntry.queries("x_anova_f")(spark, sf).collect().head
    assert(row.getLong(0) === (k - 1).toLong)
    assert(row.getLong(1) === (nn - k).toLong)
    assert(math.abs(row.getDouble(2) - f) < 1e-3)
    assert(math.abs(row.getDouble(3) - ssb / (ssb + ssw)) < 1e-3)
  }

  test("x_decision_stump's gain equals the best gain of a direct scan") {
    val t = Tables(spark, sf)
    val rows = t.orders.select(col("o_totalprice"),
        (col("o_orderstatus") === "F").cast("long"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val hist = rows.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toMap
    val vs = hist.keys.toArray.sorted
    val ptot = hist.values.map(_._1).sum.toDouble
    val ctot = hist.values.map(_._2).sum.toDouble
    def gini(p: Double, n: Double) = 1.0 - (p / n) * (p / n) -
      ((n - p) / n) * ((n - p) / n)
    var lp = 0.0; var ln = 0.0; var best = Double.MinValue
    vs.dropRight(1).foreach { v =>
      lp += hist(v)._1; ln += hist(v)._2
      val g = gini(ptot, ctot) -
        ln / ctot * gini(lp, ln) -
        (ctot - ln) / ctot * gini(ptot - lp, ctot - ln)
      if (g > best) best = g
    }
    val row = SparkEntry.queries("x_decision_stump")(spark, sf).collect().head
    assert(math.abs(row.getDouble(1) - best) < 1e-6)
    assert(row.getLong(2) + row.getLong(4) === ctot.toLong)
    assert(row.getLong(3) + row.getLong(5) === ptot.toLong)
  }

  test("x_pacf: lag-1 equals the ACF lag-1 value; all values are valid") {
    val acf1 = SparkEntry.queries("x_acf")(spark, sf).collect()
      .find(_.getInt(0) == 1).get.getDouble(1)
    val out = SparkEntry.queries("x_pacf")(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set(1, 2, 3))
    assert(math.abs(out(1) - acf1) < 1e-9)
    out.values.foreach(v => assert(math.abs(v) <= 1.0 + 1e-6))
  }

  test("x_theil_index: non-negative, every segment present, sizes add up") {
    val t = Tables(spark, sf)
    val out = SparkEntry.queries("x_theil_index")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet ===
      t.customer.select("c_mktsegment").distinct()
        .collect().map(_.getString(0)).toSet)
    out.foreach(r => assert(r.getDouble(2) >= -1e-9))
    val buyers = t.orders.select("o_custkey").distinct().count()
    assert(out.map(_.getLong(1)).sum === buyers)
  }

  test("x_hhi matches a direct per-nation computation") {
    val t = Tables(spark, sf)
    val cells = t.lineitem.join(t.supplier,
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("l_suppkey")).count()
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val byNation = cells.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val name = t.nation.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val out = SparkEntry.queries("x_hhi")(spark, sf).collect()
    assert(out.length === byNation.size)
    out.foreach { r =>
      val nk = name.collectFirst {
        case (k, v) if v == r.getString(0) => k }.get
      val cs = byNation(nk)
      val n = cs.sum.toDouble
      val want = cs.map(c => (c / n) * (c / n)).sum
      assert(math.abs(r.getDouble(3) - want) < 1e-5, r.getString(0))
      assert(r.getLong(1) === cs.length.toLong)
    }
  }

  test("x_graph_clustering: coefficients in [0,1]; vertex triangles sum to 3x the global count") {
    val out = SparkEntry.queries("x_graph_clustering")(spark, sf).collect()
    out.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0 + 1e-9, r.getString(0))
    }
    // per-vertex triangle counts triple-count each triangle
    val perVertexSum = out.map(_.getLong(2)).sum
    assert(perVertexSum % 3 === 0L)
    assert(perVertexSum > 0L) // the trade graph is dense enough to close
  }

  test("x_fd_audit: key-determined FD holds, coarse FDs violate") {
    val out = SparkEntry.queries("x_fd_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("o_custkey->c_mktsegment")._2 === 0L) // custkey determines
    assert(out("o_custkey->c_mktsegment")._3 === 1L)
    assert(out("c_nationkey->c_mktsegment")._2 > 0L) // nation does not
    assert(out("o_orderpriority->o_orderstatus")._2 > 0L)
  }

  test("x_ref_integrity: driver testdata is referentially intact, counts line up") {
    val t = Tables(spark, sf)
    val out = SparkEntry.queries("x_ref_integrity")(spark, sf).collect()
    assert(out.length === 7)
    out.foreach(r => assert(r.getLong(3) === 0L, r.getString(0)))
    val byEdge = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEdge("lineitem.l_orderkey->orders") === t.lineitem.count())
    assert(byEdge("orders.o_custkey->customer") === t.orders.count())
    assert(byEdge("nation.n_regionkey->region") === t.nation.count())
  }
}
