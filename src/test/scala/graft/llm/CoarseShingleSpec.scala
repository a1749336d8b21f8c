package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 dedup-scale surfaces: coarse shingles (TextOps.wordNgrams /
  * ngramJaccardPairs width), the minHashNearDups maxBucket cap, and the
  * srpNearDups maxBucket cap. Fixture tokens are real words (distinct
  * ≤3-char prefixes — the wordHash gotcha). */
class CoarseShingleSpec extends SparkSpec {
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog while the calm cat " +
    "sleeps near the warm stove and the old owl watches from the tall tree"
  val docs = Seq(
    (1L, base),
    (2L, base), // exact dup of 1
    (3L, base.replace("tall tree", "tall oak")), // near dup (one token)
    (4L, "completely different content about database query planning engines"))
    .toDF("doc_id", "text")

  test("wordNgrams(3) equals wordTrigrams; width 5 shingles are correct") {
    val row = Seq(("alpha brown clear delta every fine".split(" ").mkString(" ")))
      .toDF("text")
      .select(TextOps.wordTrigrams(col("text")).as("t3"),
        TextOps.wordNgrams(col("text"), 3).as("n3"),
        TextOps.wordNgrams(col("text"), 5).as("n5"))
      .head()
    assert(row.getSeq[String](0) === row.getSeq[String](1))
    assert(row.getSeq[String](2) === Seq(
      "alpha brown clear delta every", "brown clear delta every fine"))
  }

  test("wordNgrams: doc shorter than the width yields an empty array") {
    val n5 = Seq(("only four tokens here"))
      .toDF("text").select(TextOps.wordNgrams(col("text"), 5)).head().getSeq[String](0)
    assert(n5.isEmpty)
  }

  test("width-5 Jaccard: exact dup scores 1.0; a one-token edit scores " +
      "LOWER than at width 3 (coarsening breaks more shingles)") {
    def pairs(width: Int) =
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.1, width = width)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val j3 = pairs(3); val j5 = pairs(5)
    assert(j5((1L, 2L)) === 1.0)
    assert(j5((1L, 3L)) < j3((1L, 3L))) // 5 broken shingles vs 3
    assert(!j5.keySet.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  // a 40-way exact-dup clique: every band bucket holds all 40 ids
  val clique = (100L until 140L).map(i => (i, base))
  val withClique = (docs.as[(Long, String)].collect().toSeq ++ clique)
    .toDF("doc_id", "text")

  test("minHashNearDups maxBucket: bit-identical when the cap doesn't bind") {
    val uncapped = Dedup.minHashNearDups(docs, "doc_id", "text", 0.5)
      .collect().map(_.toString).sorted.toSeq
    val capped = Dedup.minHashNearDups(docs, "doc_id", "text", 0.5,
      maxBucket = 1000).collect().map(_.toString).sorted.toSeq
    assert(uncapped === capped)
  }

  test("minHashNearDups maxBucket: a hot clique's buckets are dropped; " +
      "pairs outside hot buckets survive") {
    val capped = Dedup.minHashNearDups(withClique, "doc_id", "text", 0.5,
      maxBucket = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 40-clique (ids 100-139, plus 1/2/3 which share its shingles) is
    // hot in EVERY band (1/2 are exact dups of the clique text; 3 is a
    // near dup whose bands mostly coincide) — with all its buckets over
    // the 32 cap, no pair among them can band together
    assert(capped.isEmpty)
    // and an uncapped run on the same corpus DOES find the clique
    val uncapped = Dedup.minHashNearDups(withClique, "doc_id", "text", 0.5)
      .collect()
    assert(uncapped.length > 700) // C(42,2)-ish pairs
  }

  test("srpNearDups maxBucket: hot-bucket clique dropped, small family kept") {
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0.05f, 0f)
    val vecs = ((0L until 40L).map(i => (i, a)) ++ Seq((100L, b), (101L, b)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.srpNearDups(vecs, planes = 32, bandBits = 8,
        dims = 4, tau = 0.9, maxBucket = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L))) // the 40-clique is gone, pair kept
    val uncapped = Similarity.srpNearDups(vecs, planes = 32, bandBits = 8,
      dims = 4, tau = 0.9).collect()
    assert(uncapped.length === 40 * 39 / 2 + 1)
  }
}
