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

  test("equal-coordinate duplicates on the frontier are all kept") {
    val pts = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 2.0, 5), (4L, 0.5, 1))
    val got = Skyline.skyline2d(pts.toDF("id", "mn", "mx"), "mn", "mx")
      .select("id").as[Long].collect().toSet
    // (1.0,10) twice: both kept; (2.0,5) dominated by (1.0,10); (0.5,1) on
    // the frontier (cheapest)
    assert(got === Set(1L, 2L, 4L))
  }
}
