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

  test("tolerance: stale matches null out, in-bound matches survive, no-match stays null") {
    val out = AsOfJoin.asofJoinTolerance(left, right, "k", "t", "snap",
      "tol_snap", tolerance = 4L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(100L) === None)        // t=5: no match at all
    assert(out(101L) === Some(80.0))  // t=10, ref 8: lag 2 <= 4
    assert(out(102L) === Some(200.0)) // t=20, ref 20: lag 0
    assert(out(103L) === None)        // t=30, ref 25: lag 5 > 4 → stale
    assert(out(104L) === None)        // key 2: no refs
  }

  test("forward asof picks the earliest at-or-after right row; inclusive; null after all") {
    val out = AsOfJoin.asofJoinForward(left, right, "k", "t", "snap", "next_snap")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out.size === 5)
    assert(out(100L) === Some(80.0))  // t=5: next is 8
    assert(out(101L) === Some(200.0)) // t=10: next is 20
    assert(out(102L) === Some(200.0)) // t=20: INCLUSIVE — the t=20 snapshot
    assert(out(103L) === None)        // t=30: nothing after
    assert(out(104L) === None)        // key 2 has no snapshots
  }

  test("forward asof: NULL left key/ts yield NULL even with following refs in sort order") {
    val l = Seq((1L, Option(1L), Option(1L)), (2L, Option(1L), Option.empty[Long]),
        (3L, Option.empty[Long], Option(5L)))
      .toDF("event_id", "k", "t")
    val r = Seq((1L, 10L, 99.0)).toDF("k", "t", "snap")
    val out = AsOfJoin.asofJoinForward(l, r, "k", "t", "snap", "next_snap")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(out(1L) === Some(99.0)) // real match
    assert(out(2L) === None)       // null ts sorts first — must NOT see the ref
    assert(out(3L) === None)       // null key
  }

  test("duplicate right timestamps collapse deterministically to the max value") {
    val dupRight = right.union(Seq((1L, 20L, 150.0)).toDF("k", "t", "snap"))
    val out = AsOfJoin.asofJoin(left, dupRight, "k", "t", "snap", "asof_snap")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out(102L) === Some(200.0)) // max(200, 150) at t=20
  }

  def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap

  test("custom-plan asofJoinMerge is result-identical to the window formulation") {
    val dupRight = right.union(Seq((1L, 20L, 150.0)).toDF("k", "t", "snap"))
    assert(asMap(AsOfJoin.asofJoinMerge(left, dupRight, "k", "t", "snap", "asof_snap"))
      === asMap(AsOfJoin.asofJoin(left, dupRight, "k", "t", "snap", "asof_snap")))
  }

  test("AsOfJoinStrategy plans AsOfJoinExec with SMJ-style exchanges and sorts") {
    val df = AsOfJoin.asofJoinMerge(left, right, "k", "t", "snap", "asof_snap")
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), plan)
  }

  // DuckDB ASOF LEFT JOIN parity on nulls, hand-computed:
  //   NULL keys/timestamps match nothing; a matched latest row with a NULL
  //   VALUE yields NULL (presence != value).
  val nullLeft = Seq(
    (200L, Some(1L), Some(12L), 0.0), // plain: latest right at t<=12
    (201L, None, Some(12L), 0.0),     // NULL key -> no match
    (202L, Some(1L), None, 0.0))      // NULL ts  -> no match
    .toDF("event_id", "k", "t", "v")
  val nullRight = Seq(
    (Some(1L), Some(8L), Some(80.0)),
    (Some(1L), Some(10L), None),      // latest at t<=12 — value IS null
    (None, Some(9L), Some(999.0)),    // NULL key: never matches
    (Some(1L), None, Some(888.0)))    // NULL ts: never matches
    .toDF("k", "t", "snap")

  test("NULL keys/ts never match; latest-but-null value stays null (both impls)") {
    for (impl <- Seq(AsOfJoin.asofJoin _, AsOfJoin.asofJoinMerge _)) {
      val out = asMap(impl(nullLeft, nullRight, "k", "t", "snap", "asof_snap"))
      assert(out(200L) === None) // matched t=10 row carries a NULL VALUE
      assert(out(201L) === None) // null key
      assert(out(202L) === None) // null ts
    }
  }

  test("null-value rows do not mask presence: earlier non-null not carried past") {
    // left at t=9 must still see the t=8 snapshot (the null-value row is at 10)
    val probe = Seq((300L, Some(1L), Some(9L), 0.0)).toDF("event_id", "k", "t", "v")
    for (impl <- Seq(AsOfJoin.asofJoin _, AsOfJoin.asofJoinMerge _)) {
      val out = asMap(impl(probe, nullRight, "k", "t", "snap", "asof_snap"))
      assert(out(300L) === Some(80.0))
    }
  }
}
