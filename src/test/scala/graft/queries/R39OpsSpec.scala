package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-39 batch (item-CF, k-NN
  * classification, LAD regression, rank-1 ALS, Markov attribution). */
class R39OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_item_cf: top-3 per item, cosine in (0,1], ranks contiguous, " +
      "and the cosine is symmetric across the mirrored pair") {
    val rows = run("x_item_cf").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_._1)
    byItem.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._5).sorted.sameElements(1 to rs.length))
    }
    rows.foreach { case (_, _, cooc, cos, _) =>
      assert(cooc > 0)
      assert(cos > 0 && cos <= 1)
    }
    // symmetry: where both directions survived the top-3 cut, the
    // cosine must agree
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    m.foreach { case ((a, b), c) =>
      m.get((b, a)).foreach(c2 => assert(math.abs(c - c2) < 1e-9))
    }
  }

  test("x_knn_classify: one prediction per probe, correct flag matches " +
      "the label equality, labels within the corpus label domain") {
    val rows = run("x_knn_classify").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (actual, pred, correct) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert((actual == pred) == (correct == 1))
    }
  }

  test("x_quantile_reg: LAD line has a smaller MAE than the OLS line " +
      "on the same histogram (the point of the robust fit)") {
    val row = run("x_quantile_reg").collect().head
    val (a, b, mae) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    // the synthetic fixture draws price independent of quantity, so only
    // the line's finiteness is contractual, not its sign
    assert(!a.isNaN && !b.isNaN)
    assert(mae > 0)
    // recompute the OLS MAE directly and check the LAD iterate did not
    // do worse (IRLS is monotone-ish on this convexish histogram)
    import org.apache.spark.sql.functions._
    val hist = graft.Tables(spark, sf).lineitem
      .select(col("l_quantity").as("x"),
        (col("l_extendedprice") / 1000.0).as("y"))
      .groupBy(col("x"), round(col("y"), 1).as("yb"))
      .agg(count(lit(1)).as("n"))
    val m = hist.agg(sum(col("n") * lit(1.0)).as("sw"),
      sum(col("n") * lit(1.0) * col("x")).as("swx"),
      sum(col("n") * col("yb")).as("swy"),
      sum(col("n") * lit(1.0) * col("x") * col("x")).as("swxx"),
      sum(col("n") * lit(1.0) * col("x") * col("yb")).as("swxy")).head()
    val (sw, swx, swy, swxx, swxy) = (m.getDouble(0), m.getDouble(1),
      m.getDouble(2), m.getDouble(3), m.getDouble(4))
    val bo = (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
    val ao = (swy - bo * swx) / sw
    val olsMae = hist.agg((sum(col("n")
      * abs(col("yb") - lit(ao) - lit(bo) * col("x"))) / sum(col("n")))
      .as("mae")).head().getDouble(0)
    assert(mae <= olsMae + 1e-6, s"LAD mae $mae vs OLS mae $olsMae")
  }

  test("x_als_factor: factors positive (quantity matrix is positive), " +
      "rmse constant across rows and small relative to the mean rating") {
    val rows = run("x_als_factor").collect()
    assert(rows.length == 25)
    val rmses = rows.map(_.getDouble(2)).distinct
    assert(rmses.length == 1)
    rows.foreach(r => assert(r.getDouble(1) > 0))
    // mean quantity ~25.5; a rank-1 fit of a near-flat positive matrix
    // should reconstruct within a few percent
    assert(rmses.head < 5.0)
  }

  test("x_markov_attribution: conversion probabilities are " +
      "probabilities, removing any channel never helps conversion") {
    val rows = run("x_markov_attribution").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (full, wo, eff) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(full > 0 && full <= 1)
      assert(wo >= 0 && wo <= 1)
      assert(wo <= full + 1e-9,
        "removal cannot increase absorbing conversion mass")
      assert(math.abs(eff - (1 - wo / full)) < 1e-4)
    }
  }
}
