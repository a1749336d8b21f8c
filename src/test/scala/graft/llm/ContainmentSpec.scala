package graft.llm

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 is a verbatim EXCERPT of doc 1 (its first 6 words): every one of
  // its trigrams appears in 1, but Jaccard is diluted by 1's extra length
  val long = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt"
  val docs = Seq(
    (1L, long),
    (2L, "aa bb cc dd ee ff"),
    (3L, "xx yy zz ww vv uu")).toDF("doc_id", "text")

  def pairs(thr: Double): Map[(Long, Long), Double] =
    Dedup.containmentPairs(docs, "doc_id", "text", thr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("an excerpt is fully contained in its source, not vice versa") {
    val p = pairs(0.9)
    assert(p((2L, 1L)) === 1.0) // all 4 of the excerpt's trigrams in source
    assert(!p.contains((1L, 2L))) // 4/18 of the source's trigrams ≈ 0.22
    assert(!p.keys.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("symmetric Jaccard misses the same pair at the same threshold") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).collect()
    assert(j.isEmpty) // jaccard(1,2) = 4/18 — containment is the catcher
  }

  test("the reverse direction appears at a low threshold with the exact ratio") {
    val p = pairs(0.2)
    assert(p((1L, 2L)) === math.rint(4.0 / 18.0 * 1e6) / 1e6)
  }
}
