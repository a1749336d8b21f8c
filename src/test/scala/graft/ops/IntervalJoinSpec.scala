package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def iv(rows: (Long, Long, Long)*) = rows.toDF("id", "s", "t")

  test("overlapPairs: touch-at-boundary counts, disjoint doesn't, dedup across cells") {
    val left = iv((1L, 0L, 100L), (2L, 250L, 260L), (3L, 1000L, 5000L))
    val right = iv((10L, 100L, 200L), // touches 1 at t=100 (inclusive)
      (11L, 150L, 240L),              // overlaps nothing (1 ends 100, 2 starts 250)
      (12L, 900L, 4000L))             // overlaps 3 across MANY 100-wide cells
    val out = IntervalJoin.overlapPairs(left, right, "id", "s", "t", cellMicros = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L), (3L, 12L)))
  }

  test("overlapPairs: result is cell-width invariant") {
    val l = iv((1L, 0L, 1000L), (2L, 500L, 600L), (3L, 5000L, 6000L))
    val r = iv((7L, 550L, 5500L), (8L, 7000L, 8000L))
    val expected = Set((1L, 7L), (2L, 7L), (3L, 7L))
    for (cell <- Seq(10L, 100L, 1000L, 100000L)) {
      val out = IntervalJoin.overlapPairs(l, r, "id", "s", "t", cell)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(out === expected, s"cell=$cell")
    }
  }

  test("overlapPairs self-join with extraPred canonicalizes and filters") {
    val e = Seq((1L, 100L, 0L, 100L), (2L, 100L, 50L, 150L), (3L, 200L, 60L, 90L))
      .toDF("id", "user", "s", "t")
    val out = IntervalJoin.overlapPairs(e, e, "id", "s", "t", cellMicros = 50L,
      extraPred = col("l.id") < col("r.id") && col("l.user") =!= col("r.user"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) same user → excluded; (1,3) and (2,3) overlap across users
    assert(out === Set((1L, 3L), (2L, 3L)))
  }
}
