package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Independent plain-Scala re-derivations and analytic invariants for the
  * round-31/32 batches (fitting II + evaluation). */
class R31R32OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def snap(v: Double, dp: Int) =
    BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_lasso replays coordinate descent on the collected correlations " +
      "and shrinks both coefficients vs the soft-threshold-free path") {
    val m = Tables(spark, sf).lineitem.agg(
      round(corr(col("l_quantity"), col("l_discount")), 6).as("r12"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r1y"),
      round(corr(col("l_discount"), col("l_extendedprice")), 6).as("r2y"))
      .head()
    val (r12, r1y, r2y) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    def st(z: Double, l: Double) =
      if (z > l) z - l else if (z < -l) z + l else 0.0
    var (b1, b2) = (0.0, 0.0)
    var (u1, u2) = (0.0, 0.0) // lambda = 0 shadow path
    for (_ <- 1 to 5) {
      b1 = snap(st(r1y - r12 * b2, 0.02), 9); b2 = snap(st(r2y - r12 * b1, 0.02), 9)
      u1 = snap(r1y - r12 * u2, 9); u2 = snap(r2y - r12 * u1, 9)
    }
    val row = run("x_lasso").collect().head
    assert(math.abs(row.getDouble(1) - snap(b1, 6)) < 1e-9)
    assert(math.abs(row.getDouble(2) - snap(b2, 6)) < 1e-9)
    // L1 shrinkage: each lasso coefficient is no larger in magnitude
    // than its unregularized CD twin
    assert(math.abs(b1) <= math.abs(u1) + 1e-12)
    assert(math.abs(b2) <= math.abs(u2) + 1e-12)
  }

  test("x_gmm_em replays 4 EM rounds on the collected bin frame; the fit " +
      "is a proper mixture") {
    val bins = Tables(spark, sf).orders
      .select((col("o_totalprice") / lit(100000.0)).as("xs"))
      .groupBy(floor(col("xs") * 100).cast("bigint").as("b"))
      .agg(round(avg(col("xs")), 6).as("x"), count(lit(1)).cast("double").as("n"))
      .collect().toSeq.map(r => (r.getDouble(1), r.getDouble(2)))
    val sn0 = bins.map(_._2).sum
    val mm = bins.map { case (x, n) => n * x }.sum / sn0
    val m2 = bins.map { case (x, n) => n * x * x }.sum / sn0
    var (w1, mu1, mu2, v1, v2) = (0.5,
      snap(mm - math.sqrt(m2 - mm * mm), 9),
      snap(mm + math.sqrt(m2 - mm * mm), 9),
      snap(m2 - mm * mm, 9), snap(m2 - mm * mm, 9))
    def phi(x: Double, mu: Double, v: Double) =
      math.exp(-(x - mu) * (x - mu) / (2 * v)) / math.sqrt(2 * math.Pi * v)
    for (_ <- 1 to 4) {
      var (sr, sn, sx1, sxx1, sx2, sxx2) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      for ((x, n) <- bins) {
        val p1 = w1 * phi(x, mu1, v1); val p2 = (1 - w1) * phi(x, mu2, v2)
        val r = p1 / (p1 + p2)
        sr += n * r; sn += n
        sx1 += n * r * x; sxx1 += n * r * x * x
        sx2 += n * (1 - r) * x; sxx2 += n * (1 - r) * x * x
      }
      w1 = snap(sr / sn, 9)
      mu1 = snap(sx1 / sr, 9); mu2 = snap(sx2 / (sn - sr), 9)
      v1 = snap(sxx1 / sr - (sx1 / sr) * (sx1 / sr), 9)
      v2 = snap(sxx2 / (sn - sr) - (sx2 / (sn - sr)) * (sx2 / (sn - sr)), 9)
    }
    val row = run("x_gmm_em").collect().head
    assert(math.abs(row.getDouble(0) - snap(w1, 6)) < 1e-9)
    assert(math.abs(row.getDouble(1) - snap(mu1, 6)) < 1e-9)
    assert(math.abs(row.getDouble(3) - snap(mu2, 6)) < 1e-9)
    assert(row.getDouble(0) > 0 && row.getDouble(0) < 1)   // proper weight
    assert(row.getDouble(2) > 0 && row.getDouble(4) > 0)   // positive sigmas
    assert(row.getDouble(1) < row.getDouble(3))            // ordered means
    assert(!row.getDouble(5).isNaN)                        // finite loglik
  }

  test("x_bradley_terry strengths average to 1 and replay the MM rounds") {
    val rows = run("x_bradley_terry").collect()
    assert(rows.length > 1)
    val strengths = rows.map(_.getDouble(1))
    assert(math.abs(strengths.sum / strengths.length - 1.0) < 1e-4)
    assert(strengths.forall(s => s > 0))
    // the win totals must sum to the total duel count (every duel has
    // exactly one winner)
    val t = Tables(spark, sf)
    val obr = t.lineitem
      .join(t.part.select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey").as("o"), col("p_brand").as("br"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    val duels = obr.as("a").join(obr.as("b"), expr(
      "a.o = b.o AND a.br <> b.br AND a.rev > b.rev")).count()
    assert(rows.map(_.getLong(2)).sum === duels)
  }

  test("x_kde integrates to ~1 over the grid and is nonnegative") {
    val rows = run("x_kde").collect()
    assert(rows.length === 21)
    val dens = rows.map(_.getDouble(1))
    assert(dens.forall(_ >= 0))
    // trapezoidal mass over [0, 500] k$ in per-k$ units: step 25, density
    // is per-1000$ so mass = sum * 25 / 1000; boundary truncation and the
    // h=20 kernel leak keep it shy of 1
    val mass = dens.sum * 25.0 / 1000.0
    assert(mass > 0.8 && mass < 1.1, s"KDE mass $mass")
  }

  test("x_calibration buckets are coherent and Brier beats the trivial " +
      "all-0.5 predictor") {
    val rows = run("x_calibration").collect()
    val brier = rows.head.getDouble(4)
    assert(brier > 0 && brier < 0.25) // 0.25 = constant-0.5 predictor
    rows.foreach { r =>
      val (bucket, meanPred) = (r.getLong(0), r.getDouble(2))
      assert(meanPred >= bucket / 20.0 - 1e-6
        && meanPred < (bucket + 1) / 20.0 + 1e-6)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }

  test("x_conformal achieves its nominal 90% coverage with the " +
      "conservative bin-edge quantile") {
    val row = run("x_conformal").collect().head
    val (nCal, nTest, q90, coverage) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getDouble(3))
    assert(nCal > 0 && nTest > 0 && q90 > 0)
    // conservative upper-edge quantile + exchangeable split => coverage
    // at or above nominal (small split noise tolerated)
    assert(coverage >= 0.88, s"coverage $coverage")
    assert(coverage <= 1.0)
  }

  test("x_silhouette scores are in [-1, 1] and cover the whole corpus") {
    val rows = run("x_silhouette").collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables(spark, sf).embeddings.count())
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("x_leven_match finds the synthetic exact-name duplicates (d = 0 " +
      "bucket) and only same-length candidates") {
    val rows = run("x_leven_match").collect()
    assert(rows.nonEmpty)
    val byD = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byD.getOrElse(0, 0L) > 0, s"no exact-name pairs: $byD")
    assert(byD.values.forall(_ > 0))
  }

  test("x_assoc_rules: confidence/support/lift are coherent and the cut " +
      "is respected") {
    val rows = run("x_assoc_rules").collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      val (support, confidence, lift) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(support >= 0.001 && support <= 1)
      assert(confidence > 0 && confidence <= 1)
      assert(lift > 0)
      // support <= confidence always (support = conf * P(ante))
      assert(support <= confidence + 1e-9)
    }
    // top-15 by lift: returned lifts are non-increasing
    val lifts = rows.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("x_vocab_richness: Chao1 dominates observed types; Good-Turing " +
      "coverage is a proper fraction") {
    val rows = run("x_vocab_richness").collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val (types, chao1, cov) = (r.getLong(2), r.getDouble(5), r.getDouble(6))
      assert(chao1 >= types - 1e-9)
      assert(cov > 0 && cov <= 1)
    }
  }

  test("x_hellinger satisfies the standard distance inequalities") {
    val row = run("x_hellinger").collect().head
    val (bc, h, tv) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(bc > 0 && bc <= 1)
    assert(h >= 0 && h <= 1)
    assert(tv >= 0 && tv < 1)
    // H^2 <= TV <= sqrt(2) H
    assert(h * h <= tv + 1e-6)
    assert(tv <= math.sqrt(2) * h + 1e-6)
  }

  test("x_pr_curve: recall is non-increasing in the threshold, precision " +
      "and F1 are proper fractions, tp <= flagged") {
    val rows = run("x_pr_curve").collect().sortBy(_.getDouble(0))
    assert(rows.length === 9)
    val recalls = rows.map(_.getDouble(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
    }
  }
}
