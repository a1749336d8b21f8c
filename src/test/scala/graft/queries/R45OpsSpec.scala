package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-45 batch (BH-FDR, Lilliefors,
  * TOST, energy distance, L-moments, jackknife, meta-analysis) — each
  * checked against an independent brute-force recomputation or a known
  * mathematical identity, not just shape. */
class R45OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** A&S 7.1.26 erfc — the same rational approximation the SQL fragment
    * encodes, reimplemented independently for cross-checks. */
  private def erfc(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * x)
    (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
  }

  test("x_fdr_bh: step-up coherence — rejections form a prefix of the " +
      "p-ranking and every rejected p clears its own BH threshold") {
    val rows = run("x_fdr_bh").collect()
    assert(rows.length == 25)
    val m = rows.length
    val byRank = rows.sortBy(_.getLong(4))
    // ranks are 1..25 in order
    assert(byRank.map(_.getLong(4)).toSeq == (1L to 25L))
    // p-values monotone along the ranking
    val ps = byRank.map(_.getDouble(3))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b + 1e-9 })
    // rejected is a prefix
    val rej = byRank.map(_.getInt(5))
    assert(rej.zip(rej.tail).forall { case (a, b) => a >= b },
      "rejections must be a prefix of the p-ranking")
    // every rejected p clears its own threshold (within the 6dp release)
    byRank.filter(_.getInt(5) == 1).foreach { r =>
      assert(r.getDouble(3) <= 0.05 * r.getLong(4) / m + 1e-6)
    }
  }

  test("x_lilliefors: D matches a brute-force EDF-vs-Phi sweep over the " +
      "collected quantity histogram") {
    val row = run("x_lilliefors").collect().head
    val (n, mu, sd, d) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
    import org.apache.spark.sql.functions._
    val h = graft.Tables(spark, sf).lineitem
      .groupBy(col("l_quantity").cast("bigint").as("v"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val nn = h.map(_._2).sum
    assert(nn == n)
    var ci = 0L
    var dMax = 0.0
    h.foreach { case (v, c) =>
      val fp = ci.toDouble / nn
      ci += c
      val fi = ci.toDouble / nn
      val z = (v - mu) / sd / 1.4142135623730951
      val phi = if (z >= 0) 1.0 - 0.5 * erfc(z) else 0.5 * erfc(-z)
      dMax = math.max(dMax, math.max(fi - phi, phi - fp))
    }
    assert(math.abs(dMax - d) < 1e-5, s"brute D $dMax vs released $d")
    assert(d > 0 && d < 1)
  }

  test("x_tost_equiv: p-values in (0,1), flag consistent with both " +
      "one-sided tests at alpha = 0.05") {
    val r = run("x_tost_equiv").collect().head
    val (pLo, pHi, eq) = (r.getDouble(4), r.getDouble(5), r.getInt(6))
    assert(pLo >= 0 && pLo <= 1 && pHi >= 0 && pHi <= 1)
    assert(eq == (if (pLo < 0.05 && pHi < 0.05) 1 else 0))
    assert(r.getDouble(3) > 0, "Welch SE must be positive")
  }

  test("x_energy_dist: matches a brute-force histogram-cross " +
      "recomputation and is nonnegative") {
    val row = run("x_energy_dist").collect().head
    val (nx, ny, e) = (row.getLong(0), row.getLong(1), row.getDouble(3))
    import org.apache.spark.sql.functions._
    def hist(flag: String) = graft.Tables(spark, sf).lineitem
      .filter(col("l_returnflag") === flag)
      .groupBy(col("l_quantity").cast("bigint").as("v"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hx = hist("R")
    val hy = hist("N")
    def cross(a: Array[(Long, Long)], b: Array[(Long, Long)]) =
      (for ((v1, c1) <- a; (v2, c2) <- b)
        yield c1.toDouble * c2 * math.abs(v1 - v2)).sum
    val (sx, sy) = (hx.map(_._2).sum.toDouble, hy.map(_._2).sum.toDouble)
    assert(sx == nx && sy == ny)
    val brute = 2 * cross(hx, hy) / sx / sy - cross(hx, hx) / sx / sx -
      cross(hy, hy) / sy / sy
    assert(math.abs(brute - e) < 1e-5, s"brute $brute vs released $e")
    assert(e >= -1e-9, "energy distance is nonnegative")
  }

  test("x_lmoments: l1 = sample mean; l2 = half Gini mean difference " +
      "(brute-forced from the histogram); ratio bounds hold") {
    val row = run("x_lmoments").collect().head
    val (n, l1, l2, lSkew, lKurt) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(6), row.getDouble(7))
    import org.apache.spark.sql.functions._
    val h = graft.Tables(spark, sf).lineitem
      .groupBy(col("l_quantity").cast("bigint").as("v"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nn = h.map(_._2).sum
    assert(nn == n)
    val mean = h.map { case (v, c) => v.toDouble * c }.sum / nn
    assert(math.abs(mean - l1) < 1e-5, s"l1 $l1 vs mean $mean")
    // sample λ2 = GMD/2 with GMD = ΣΣ c_i c_j |v_i − v_j| / (n(n−1))
    val gmd = (for ((v1, c1) <- h; (v2, c2) <- h)
      yield c1.toDouble * c2 * math.abs(v1 - v2)).sum /
      (nn.toDouble * (nn - 1.0))
    assert(math.abs(gmd / 2 - l2) < 1e-5, s"l2 $l2 vs GMD/2 ${gmd / 2}")
    assert(l2 >= 0)
    assert(math.abs(lSkew) < 1 && lKurt > -0.25 && lKurt < 1)
  }

  test("x_jackknife: replicate-based estimate and SE agree with a " +
      "driver-side recomputation from the per-nation frame") {
    val r = run("x_jackknife").collect().head
    val (g, n, theta, thetaJack, se) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(g == 25)
    import org.apache.spark.sql.functions._
    val t = graft.Tables(spark, sf)
    val gg = t.orders
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_i"),
        round(sum(col("o_totalprice")), 2).as("s_i"))
      .collect().map(r2 => (r2.getLong(1), r2.getDouble(2)))
    val (totN, totS) = (gg.map(_._1).sum,
      BigDecimal(gg.map(_._2).sum).setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(totN == n)
    val reps = gg.map { case (ni, si) =>
      BigDecimal((totS - si) / (totN - ni)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val tj = reps.sum / reps.length
    assert(math.abs(tj - thetaJack) < 1e-4, s"theta_jack $thetaJack vs $tj")
    val vRep = reps.map(x => (x - tj) * (x - tj)).sum / (reps.length - 1)
    val seB = math.sqrt(vRep * (g - 1) * (g - 1) / g.toDouble)
    assert(math.abs(seB - se) < 1e-4, s"se $se vs brute $seB")
    assert(math.abs(theta - thetaJack) < 10 * se + 1.0,
      "jackknife estimate should sit near the plug-in estimate")
  }

  test("x_meta_analysis: pooled estimates bracketed by the study " +
      "effects; tau2 and I2 nonnegative; I2 < 1") {
    val r = run("x_meta_analysis").collect().head
    val (k, thFe, thRe, q, tau2, i2) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(k == 5)
    assert(q >= 0 && tau2 >= 0 && i2 >= 0 && i2 < 1)
    // both pooled estimates are convex combinations of study effects
    import org.apache.spark.sql.functions._
    val t = graft.Tables(spark, sf)
    val effs = t.orders
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"),
        when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("arm"))
      .agg(avg("o_totalprice").as("m"))
      .groupBy("r_name")
      .agg((max(when(col("arm") === 1, col("m")))
        - max(when(col("arm") === 0, col("m")))).as("e"))
      .collect().map(_.getDouble(1))
    assert(thFe >= effs.min - 1e-3 && thFe <= effs.max + 1e-3)
    assert(thRe >= effs.min - 1e-3 && thRe <= effs.max + 1e-3)
  }

  test("SQL twins return identical results to their Dataset originals") {
    for (name <- Seq("fdr", "lilliefors", "tost", "energy", "lmoments",
        "jackknife", "meta")) {
      val ds = name match {
        case "fdr" => "x_fdr_bh"
        case "lilliefors" => "x_lilliefors"
        case "tost" => "x_tost_equiv"
        case "energy" => "x_energy_dist"
        case "lmoments" => "x_lmoments"
        case "jackknife" => "x_jackknife"
        case "meta" => "x_meta_analysis"
      }
      val a = run(ds).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val b = run(s"x_sql_$name").collect().map(_.toSeq)
        .sortBy(_.mkString("|"))
      assert(a.toSeq == b.toSeq, s"twin mismatch for $ds")
    }
  }
}
