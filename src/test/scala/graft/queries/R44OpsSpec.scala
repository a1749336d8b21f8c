package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Analytic invariants for the round-44 batch (gaps-and-islands, KMV
  * θ-sketch intersection, in-database AdaBoost). */
class R44OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x_gaps_islands: island accounting reconciles with the distinct " +
      "(user, day) frame") {
    import org.apache.spark.sql.functions._
    val rows = run("x_gaps_islands").collect()
    assert(rows.nonEmpty)
    // total active days = sum(len * n_islands)
    val totalDays = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val expected = graft.Tables(spark, sf).events
      .select(col("user_id"), col("ts").cast("date")).distinct().count()
    assert(totalDays == expected,
      s"island days $totalDays != distinct user-days $expected")
    // island lengths bounded by the event window
    assert(rows.map(_.getLong(0)).max <= 366)
  }

  test("x_sketch_kmv_intersect: k_in a true lower-bound sample and the " +
      "estimate within 50% of exact on the fixture") {
    val row = run("x_sketch_kmv_intersect").collect().head
    val (exact, kin, est, rel) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3))
    assert(exact >= 0 && kin >= 0)
    assert(kin <= exact, "sampled intersection cannot exceed the truth")
    assert(est >= 0)
    if (exact > 20) assert(rel < 0.5, s"rel error $rel")
  }

  test("x_adaboost_stumps: monotone alpha sanity — every round has " +
      "err < 0.5 and alpha > 0, thresholds in the quantity domain") {
    val rows = run("x_adaboost_stumps").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (th, dir, err, alpha) = (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))
      assert(th >= 1 && th <= 49)
      assert(dir == 1L || dir == -1L)
      assert(err > 0 && err < 0.5 + 1e-9, s"weak learner err $err")
      assert(alpha >= 0)
    }
    // round 1 picks the best unweighted stump; later rounds reweight so
    // the chosen error climbs toward 0.5
    assert(rows.head.getDouble(3) <= rows.last.getDouble(3) + 1e-6)
  }
}
