package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, String, Long, Long)*) =
    rows.toDF("k", "s", "t", "id")

  private def collectHist(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet

  test("scd2FromLog: consecutive duplicates collapse, versions chain") {
    // key 1: A A B A  -> versions A[10,30) B[30,40) A[40,∞)
    val h = collectHist(Scd.scd2FromLog(
      log((1L, "A", 10L, 0L), (1L, "A", 20L, 1L), (1L, "B", 30L, 2L),
        (1L, "A", 40L, 3L)), "k", "s", "t", "id"))
    assert(h === Set(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true)))
  }

  test("scd2FromLog: equal-ts changes order by tiebreak") {
    val h = collectHist(Scd.scd2FromLog(
      log((1L, "A", 10L, 2L), (1L, "B", 10L, 1L)), "k", "s", "t", "id"))
    // B (id 1) first, then A (id 2) at the same instant
    assert(h === Set((1L, "B", 10L, Some(10L), false), (1L, "A", 10L, None, true)))
  }

  test("scd2Merge: boundary no-op, close-out, new key, untouched key") {
    val hist = Scd.scd2FromLog(
      log((1L, "A", 10L, 0L), (1L, "B", 20L, 1L), // key 1 history: A then B
        (2L, "X", 15L, 2L), // key 2: open only
        (4L, "Q", 5L, 9L)), // key 4: no incoming changes
      "k", "s", "t", "id")
    val changes = log(
      (1L, "B", 30L, 3L), // repeats current state -> absorbed, NO new version
      (1L, "C", 40L, 4L), // real change -> closes B at 40
      (2L, "X", 35L, 5L), (2L, "Y", 50L, 6L), // no-op then change
      (3L, "N", 45L, 7L)) // brand-new key
    val merged = collectHist(Scd.scd2Merge(hist, changes, "k", "s", "t", "id"))
    assert(merged === Set(
      (1L, "A", 10L, Some(20L), false),
      (1L, "B", 20L, Some(40L), false), // closed by C, NOT by the no-op B
      (1L, "C", 40L, None, true),
      (2L, "X", 15L, Some(50L), false), // valid_from stays the ORIGINAL 15
      (2L, "Y", 50L, None, true),
      (3L, "N", 45L, None, true),
      (4L, "Q", 5L, None, true)))
  }

  test("scd2Merge == full rebuild on randomized multi-batch logs") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 600).map { i =>
      (rnd.nextInt(12).toLong, Seq("A", "B", "C")(rnd.nextInt(3)),
        i.toLong, i.toLong) // ts strictly increasing = in-order CDC
    }
    val full = log(rows: _*)
    val rebuilt = collectHist(Scd.scd2FromLog(full, "k", "s", "t", "id"))
    // apply in 3 batches of 200
    var hist = Scd.scd2FromLog(full.filter(col("t") < 200), "k", "s", "t", "id")
    for (b <- 1 to 2) {
      val batch = full.filter(col("t") >= b * 200 && col("t") < (b + 1) * 200)
      hist = Scd.scd2Merge(hist, batch, "k", "s", "t", "id")
    }
    assert(collectHist(hist) === rebuilt)
  }

  test("stateAsOf: picks the version in force, half-open interval") {
    val hist = Scd.scd2FromLog(
      log((1L, "A", 10L, 0L), (1L, "B", 30L, 1L)), "k", "s", "t", "id")
    def at(t: Long) = Scd.stateAsOf(hist, lit(t)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(9L) === Map.empty[Long, String]) // before first version
    assert(at(10L) === Map(1L -> "A")) // valid_from inclusive
    assert(at(29L) === Map(1L -> "A"))
    assert(at(30L) === Map(1L -> "B")) // valid_to exclusive
    assert(at(99L) === Map(1L -> "B"))
  }
}
