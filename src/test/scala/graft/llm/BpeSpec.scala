package graft.llm

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  def train(texts: Seq[String], rounds: Int): Seq[(Int, String, Long)] =
    Bpe.train(texts.toDF("text"), "text", rounds).collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  test("hand-checked 2-round trajectory") {
    // corpus: "abab" ×2, "ab" ×1  (the 1-char word "c" is dropped)
    // round 1 pairs: ab at 2 positions per "abab" ×2 + 1 in "ab" = 5,
    //                ba at 1 position ×2 = 2 → merge (a,b): token "ab", 5
    // after: abab → (ab)(ab), ab → (ab)
    // round 2: only pair (ab)(ab): ×2 → token "abab", freq 2
    val m = train(Seq("abab c abab", "ab"), 2)
    assert(m === Seq((1, "ab", 5L), (2, "abab", 2L)))
  }

  test("greedy left-to-right non-overlapping merge: aaa → [aa, a]") {
    // "aaa": round-1 pairs aa at positions 1 and 2 → freq 2; the merge
    // must consume the LEFT occurrence only: (a)(a)(a) → (aa)(a)
    // round 2 then sees exactly one (aa)(a) pair
    val m = train(Seq("aaa"), 2)
    assert(m(0) === ((1, "aa", 2L)))
    assert(m(1) === ((2, "aaa", 1L)))
  }

  test("fully-merged words carry no pairs but stay in the vocab") {
    // "ab" merges to a single symbol in round 1; rounds 2..3 must not
    // crash on its empty pair list (Spark sequence(1,0) descends) and the
    // remaining corpus still trains
    val m = train(Seq("ab", "cd cd", "cd"), 3)
    assert(m(0) === ((1, "cd", 3L)))
    assert(m(1) === ((2, "ab", 1L)))
    // round 3: no pairs remain anywhere → no row (merges exhaust)
    assert(m.size === 2)
  }

  test("encode applies merges in training order, counts symbols per doc") {
    import org.apache.spark.sql.Row
    val docs = Seq((1L, "abab ab x"), (2L, "")).toDF("doc_id", "text")
    // merges: (a,b) then (ab,ab) — "abab"→(ab)(ab)→(abab)=1; "ab"→1; "x"→1
    val out = Bpe.encodeCounts(docs, "doc_id", "text",
      Seq("(a)(b)", "(ab)(ab)")).collect().map { case Row(id: Long, n: Int) => id -> n }.toMap
    assert(out === Map(1L -> 3, 2L -> 0))
  }

  test("tie-break is (freq DESC, pair ASC)") {
    // "xy" and "uv" both freq 1 → '(u)(v)' sorts before '(x)(y)'
    val m = train(Seq("xy uv"), 1)
    assert(m === Seq((1, "uv", 1L)))
  }
}
