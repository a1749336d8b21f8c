package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: observations at t=5, 10, 20, 30 for key 1; t=7 for key 2
  val left = Seq(
    (100L, 1L, 5L, 0.5), (101L, 1L, 10L, 1.0),
    (102L, 1L, 20L, 2.0), (103L, 1L, 30L, 3.0),
    (104L, 2L, 7L, 7.0))
    .toDF("event_id", "k", "t", "v")
  // right: snapshots for key 1 at t=8, 20, 25; none for key 2
  val right = Seq((1L, 8L, 80.0), (1L, 20L, 200.0), (1L, 25L, 250.0))
    .toDF("k", "t", "snap")

  test("asof picks the latest at-or-before right row; inclusive ties; null before any") {
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "snap", "asof_snap")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out.size === 5) // every left row survives
    assert(out(100L) === None)        // t=5: nothing at or before
    assert(out(101L) === Some(80.0))  // t=10: snapshot at 8
    assert(out(102L) === Some(200.0)) // t=20: INCLUSIVE — the t=20 snapshot
    assert(out(103L) === Some(250.0)) // t=30: latest is 25
    assert(out(104L) === None)        // key 2 has no snapshots
  }

  test("duplicate right timestamps collapse deterministically to the max value") {
    val dupRight = right.union(Seq((1L, 20L, 150.0)).toDF("k", "t", "snap"))
    val out = AsOfJoin.asofJoin(left, dupRight, "k", "t", "snap", "asof_snap")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(102L) === Some(200.0)) // max(200, 150) at t=20
  }
}
