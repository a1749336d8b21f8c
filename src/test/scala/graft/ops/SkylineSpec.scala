package graft.ops

import scala.util.Random

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Quadratic reference: a point survives iff nothing dominates it. */
  private def naive(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, mn, mx) =>
      !pts.exists { case (_, mn2, mx2) =>
        mn2 <= mn && mx2 >= mx && (mn2 < mn || mx2 > mx)
      }
    }.map(_._1).toSet

  test("skyline2d matches the quadratic reference on random data with duplicates") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val base = Seq.tabulate(200) { i =>
        (i.toLong, (rnd.nextInt(50) / 2.0), rnd.nextInt(40))
      }
      // force duplicate (mn, mx) points — mutually non-dominated pairs must
      // BOTH survive
      val pts = base ++ base.take(20).map { case (id, mn, mx) => (id + 1000L, mn, mx) }
      val df = pts.toDF("id", "mn", "mx")
      val got = Skyline.skyline2d(df, "mn", "mx")
        .select("id").as[Long].collect().toSet
      assert(got === naive(pts), s"trial $trial")
    }
  }

  test("plan: the corpus-sized local window is hash-partitioned by bucket; " +
      "only the filtered survivor union crosses one partition") {
    val df = Seq.tabulate(100)(i => (i.toLong, i / 3.0, i % 17)).toDF("id", "mn", "mx")
    val plan = Skyline.skyline2d(df, "mn", "mx")
      .queryExecution.executedPlan.toString
    // the distinct-pair window (corpus-sized input) shuffles on _b —
    // parallel per-bucket sorts, never a global sort of the pair set
    assert(plan.contains("hashpartitioning(_b"))
    // the single-partition global pass exists, and everything reaching it
    // has passed the local-survivor Filter (the staircase bound): between
    // the SinglePartition exchange and the first window below it there is
    // a Filter on the running-max column
    val lines = plan.linesIterator.toVector
    val spIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(spIdx >= 0)
    val below = lines.drop(spIdx)
    val filterIdx = below.indexWhere(l => l.contains("Filter") && l.contains("_pm"))
    val windowIdx = below.indexWhere(_.contains("Window"))
    assert(filterIdx >= 0 && (windowIdx < 0 || filterIdx < windowIdx),
      s"global pass not fed by the local-survivor filter:\n$plan")
  }

  test("equal-coordinate duplicates on the frontier are all kept") {
    val pts = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 2.0, 5), (4L, 0.5, 1))
    val got = Skyline.skyline2d(pts.toDF("id", "mn", "mx"), "mn", "mx")
      .select("id").as[Long].collect().toSet
    // (1.0,10) twice: both kept; (2.0,5) dominated by (1.0,10); (0.5,1) on
    // the frontier (cheapest)
    assert(got === Set(1L, 2L, 4L))
  }
}
