package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Analytic invariants for the round-50 batch (Moran's I, Geary's C,
  * HHI/CR4, Theil T/L, RCA, shift-share) — brute-force recomputations
  * with EXPLICIT weight matrices / margin tables, so the fold-the-W-
  * into-group-sums algebra is checked against the textbook form. */
class R50OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def rnd(v: Double, p: Int) =
    BigDecimal(v).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (regionkey, 6dp-snapped per-nation mean order value). */
  private def nationMeans(): Array[(Long, Double)] = {
    val t = graft.Tables(spark, sf)
    t.orders
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(round(avg("o_totalprice"), 6).as("m"))
      .join(t.nation.select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), col("m"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1)))
  }

  /** Explicit same-region binary W (i≠j) plus the z vector. */
  private def spatialSetup(): (Array[Array[Int]], Array[Double]) = {
    val nm = nationMeans()
    val mu = rnd(nm.map(_._2).sum / nm.length, 6)
    val z = nm.map(_._2 - mu)
    val w = Array.tabulate(nm.length, nm.length)((i, j) =>
      if (i != j && nm(i)._1 == nm(j)._1) 1 else 0)
    (w, z)
  }

  test("x_moran_i: matches the textbook form with an explicit weight " +
      "matrix") {
    val r = run("x_moran_i").collect().head
    val (n, mi, ei, zs) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    val (w, z) = spatialSetup()
    assert(z.length == n)
    val nD = n.toDouble
    val s0 = w.map(_.sum).sum.toDouble
    val cross = (for (i <- z.indices; j <- z.indices if w(i)(j) == 1)
      yield z(i) * z(j)).sum
    val sz2 = z.map(v => v * v).sum
    val iB = (nD / s0) * cross / sz2
    assert(math.abs(mi - iB) < 1e-5)
    assert(ei == rnd(-1.0 / (nD - 1), 6))
    val s1 = (for (i <- z.indices; j <- z.indices)
      yield math.pow(w(i)(j) + w(j)(i), 2)).sum / 2
    val s2 = z.indices.map(i =>
      math.pow(w(i).sum + w.map(_(i)).sum, 2)).sum
    val vi = (nD * nD * s1 - nD * s2 + 3 * s0 * s0) /
      (s0 * s0 * (nD * nD - 1)) - math.pow(-1.0 / (nD - 1), 2)
    assert(math.abs(zs - (iB - (-1.0 / (nD - 1))) / math.sqrt(vi))
      < 1e-3)
  }

  test("x_geary_c: matches the textbook form with an explicit weight " +
      "matrix") {
    val r = run("x_geary_c").collect().head
    val (n, gc, zs) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val (w, z) = spatialSetup()
    val nD = n.toDouble
    val s0 = w.map(_.sum).sum.toDouble
    val diff2 = (for (i <- z.indices; j <- z.indices if w(i)(j) == 1)
      yield math.pow(z(i) - z(j), 2)).sum
    val sz2 = z.map(v => v * v).sum
    val cB = ((nD - 1) / (2 * s0)) * diff2 / sz2
    assert(math.abs(gc - cB) < 1e-5)
    val s1 = (for (i <- z.indices; j <- z.indices)
      yield math.pow(w(i)(j) + w(j)(i), 2)).sum / 2
    val s2 = z.indices.map(i =>
      math.pow(w(i).sum + w.map(_(i)).sum, 2)).sum
    val vc = ((2 * s1 + s2) * (nD - 1) - 4 * s0 * s0) /
      (2 * (nD + 1) * s0 * s0)
    assert(math.abs(zs - (cB - 1) / math.sqrt(vc)) < 1e-3)
  }

  test("x_herfindahl: matches brute-force shares; CR4 is the top-4 " +
      "share sum; identities hold") {
    val r = run("x_herfindahl").collect().head
    val (n, hhi, hn, ec, cr4) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val t = graft.Tables(spark, sf)
    val revs = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(round(sum("l_extendedprice"), 2).as("r"))
      .collect().map(_.getDouble(1))
    assert(revs.length == n)
    val tot = revs.sum
    val ss = revs.map(v => math.pow(v / tot, 2)).sum
    assert(hhi == rnd(10000 * ss, 2))
    assert(math.abs(hn - (ss - 1.0 / n) / (1 - 1.0 / n)) < 1e-5)
    assert(math.abs(ec - 1 / ss) < 1e-3)
    assert(math.abs(cr4 -
      revs.sorted.reverse.take(4).sum / tot) < 1e-5)
    assert(hhi >= 10000.0 / n - 0.01 && hhi <= 10000.01)
  }

  test("x_theil_ineq: matches brute force; both indexes non-negative") {
    val r = run("x_theil_ineq").collect().head
    val (n, tT, tL) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    val xs = graft.Tables(spark, sf).orders
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("x"))
      .collect().map(_.getDouble(1))
    assert(xs.length == n)
    val s = xs.sum
    val tB = xs.map(x => x * math.log(x)).sum / s - math.log(s / n)
    val lB = math.log(s / n) - xs.map(math.log).sum / n
    assert(math.abs(tT - tB) < 1e-5)
    assert(math.abs(tL - lB) < 1e-5)
    assert(tT >= 0 && tL >= 0, "entropy inequality indexes are >= 0")
  }

  test("x_rca: top-10 matches a brute-force margin-table recomputation") {
    val rows = run("x_rca").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getDouble(2)))
    assert(rows.length == 10)
    val t = graft.Tables(spark, sf)
    val cells = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.nation.select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey", "p_brand")
      .agg(round(sum("l_extendedprice"), 2).as("rev"))
      .collect().map(r => ((r.getAs[Number](0).longValue,
        r.getString(1)), r.getDouble(2))).toMap
    val tot = cells.values.sum
    val byR = cells.groupBy(_._1._1).map { case (k, m) =>
      (k, m.values.sum) }
    val byB = cells.groupBy(_._1._2).map { case (k, m) =>
      (k, m.values.sum) }
    val rca = cells.map { case ((rk, b), rev) =>
      ((rk, b), rnd((rev / byR(rk)) / (byB(b) / tot), 6))
    }
    val top = rca.toSeq.sortBy { case ((rk, b), v) => (-v, rk, b) }
      .take(10)
    assert(rows.toSeq == top.map { case ((rk, b), v) => (rk, b, v) })
  }

  test("x_shift_share: components are additive per region and match " +
      "brute force") {
    val rows = run("x_shift_share").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (e0, e1, ns, im, rs) = (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs((e1 - e0) - (ns + im + rs)) < 0.05,
        s"shift-share additivity broke for region ${r.get(0)}")
    }
    // brute force the national-share component for one region
    val t = graft.Tables(spark, sf)
    val cells = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.nation.select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("rk"), col("p_brand").as("b"))
      .agg(
        round(sum(when(year(col("o_orderdate")) === 1995,
          col("l_extendedprice")).otherwise(0.0)), 2).as("e0"),
        round(sum(when(year(col("o_orderdate")) === 1996,
          col("l_extendedprice")).otherwise(0.0)), 2).as("e1"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getString(1), r.getDouble(2), r.getDouble(3)))
      .filter(_._3 > 0)
    val gn = (cells.map(_._4).sum - cells.map(_._3).sum) /
      cells.map(_._3).sum
    val r0 = rows.head
    val nsB = cells.filter(_._1 == r0.getAs[Number](0).longValue)
      .map(_._3 * gn).sum
    assert(math.abs(r0.getDouble(3) - nsB) < 0.05)
  }

  test("SQL twins return identical results to their Dataset originals") {
    val pairs = Seq(
      "x_moran_i" -> "x_sql_moran",
      "x_geary_c" -> "x_sql_geary",
      "x_herfindahl" -> "x_sql_hhi",
      "x_theil_ineq" -> "x_sql_theil_ineq",
      "x_rca" -> "x_sql_rca",
      "x_shift_share" -> "x_sql_shift")
    for ((ds, tw) <- pairs) {
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(tw).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
