package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("packChunks: offsets, window indices, and boundary flags are exact") {
    val docs = Seq(
      ("s", 1L, 100L), // [0, 100)      → window 0
      ("s", 2L, 28L),  // [100, 128)    → window 0 (exactly fills it — no span)
      ("s", 3L, 10L),  // [128, 138)    → window 1
      ("t", 9L, 300L)  // [0, 300)      → windows 0..2, spans
    ).toDF("shard", "id", "n")
    val out = Packing.packChunks(docs, "shard", "id", col("n"), 128).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(("s", 1L)) === ((0L, 0L, 0L, false)))
    assert(out(("s", 2L)) === ((100L, 0L, 0L, false)))
    assert(out(("s", 3L)) === ((128L, 1L, 1L, false)))
    assert(out(("t", 9L)) === ((0L, 0L, 2L, true)))
  }

  test("packGreedy: overflow opens a new window; oversized doc gets its own") {
    val docs = Seq(
      ("a", 1L, 4L), ("a", 2L, 5L),  // fit together (9 <= 10)
      ("a", 3L, 3L),                 // 9+3 > 10 → bin 1
      ("a", 4L, 25L),                // oversized → own bin 2 (never split)
      ("a", 5L, 1L),                 // 25+1 > 10 → bin 3
      ("b", 1L, 10L), ("b", 2L, 1L)  // fresh shard: bin 0 full, bin 1
    ).toDF("shard", "id", "n")
    val out = Packing.packGreedy(docs, "shard", "id", col("n"), 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(("a", 1L)) === ((0L, 4L)))
    assert(out(("a", 2L)) === ((0L, 9L)))
    assert(out(("a", 3L)) === ((1L, 3L)))
    assert(out(("a", 4L)) === ((2L, 25L)))
    assert(out(("a", 5L)) === ((3L, 1L)))
    assert(out(("b", 1L)) === ((0L, 10L)))
    assert(out(("b", 2L)) === ((1L, 1L)))
  }

  test("packGreedy: per-shard state isolates shards sharing a partition") {
    // 12 shards into the test session's 4 shuffle partitions — several
    // shards per partition, so the iterator walk must reset at each shard
    // change. Every shard has the same doc profile; every shard must pack
    // identically.
    val docs = (0 until 12).flatMap(sh =>
      Seq((s"sh$sh", 1L, 6L), (s"sh$sh", 2L, 6L), (s"sh$sh", 3L, 4L)))
      .toDF("shard", "id", "n")
    val out = Packing.packGreedy(docs, "shard", "id", col("n"), 10L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .groupBy(_._1._1).view.mapValues(_.map { case ((_, id), b) => id -> b }.toMap)
    out.foreach { case (_, bins) =>
      assert(bins === Map(1L -> 0L, 2L -> 1L, 3L -> 1L)) // 6 | 6+4
    }
  }

  test("packStats: utilization = tokens / (windows * cap)") {
    val docs = Seq(("a", 1L, 6L), ("a", 2L, 6L), ("a", 3L, 4L))
      .toDF("shard", "id", "n")
    val stats = Packing.packStats(
      Packing.packGreedy(docs, "shard", "id", col("n"), 10L), 10L).collect()
    assert(stats.length === 1)
    val r = stats.head
    assert(r.getLong(1) === 2L)       // windows
    assert(r.getLong(2) === 16L)      // tokens
    assert(r.getDouble(3) === 0.8)    // 16 / 20
  }

  test("lengthBuckets: power-of-two caps, waste bounded below 1/2, empties excluded") {
    // toks 1, 2 (exact powers stay), 3 -> 4, 5 -> 8, 8 -> 8, 1000 -> 1024, 0 -> dropped
    val docs = Seq(1L, 2L, 3L, 5L, 8L, 1000L, 0L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "toks")
    val out = Packing.lengthBuckets(docs, col("toks")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L, 8L, 1024L))
    assert(out(8L) === ((2L, 13L, 16L, round6(1 - 13.0 / 16)))) // docs 5 & 8
    assert(out(1024L)._4 === round6(1 - 1000.0 / 1024))
    // every cap is a power of two and every bucket wastes < 50%
    assert(out.keys.forall(c => (c & (c - 1)) == 0))
    assert(out.values.forall(_._4 < 0.5))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
