package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("contamination: only train docs sharing a trigram with eval; counts distinct") {
    val docs = Seq(
      (0L, "a b c d"),          // eval (id 0)
      (1L, "x a b c y"),        // shares "a b c" → 1
      (2L, "a b c d e"),        // shares "a b c" + "b c d" → 2
      (3L, "p q r s"),          // clean → absent
      (4L, "a b c a b c z")     // "a b c" twice → still 1 (distinct grams)
    ).toDF("doc_id", "text")
    val out = Curation.contamination(docs, "doc_id", "text", col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 4L -> 1L))
  }

  test("repetitionProfile: exact ratios; single-token doc keeps null bigram share") {
    val docs = Seq(
      (1L, "a a a b"),  // 4 words, 2 distinct, top word 3; bigrams: "a a"×2, "a b" → top 2/3
      (2L, "solo")      // 1 word → no bigrams → null share
    ).toDF("doc_id", "text")
    val rows = Curation.repetitionProfile(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getLong(1) === 4L)
    assert(r1.getDouble(2) === 0.5)       // 2/4
    assert(r1.getDouble(3) === 0.75)      // 3/4
    assert(r1.getDouble(4) === 2.0 / 3.0)
    val r2 = rows(2L)
    assert(r2.getLong(1) === 1L)
    assert(r2.getDouble(3) === 1.0)
    assert(r2.isNullAt(4))
  }

  test("mixToBudget: cap never exceeded, id-order deterministic, unweighted groups dropped") {
    val docs = Seq(
      ("en", 1L, 40L), ("en", 2L, 40L), ("en", 3L, 40L), // budget 100: docs 1,2 (80) — 3 would hit 120
      ("de", 1L, 30L), ("de", 2L, 10L),                  // budget 50: both (40)
      ("xx", 1L, 5L)                                     // no weight → dropped
    ).toDF("lang", "id", "n")
    val out = Curation.mixToBudget(docs, "lang", "id", col("n"),
      Map("en" -> 0.5, "de" -> 0.25), budget = 200L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("en", 1L), ("en", 2L), ("de", 1L), ("de", 2L)))
    val stats = Curation.mixStats(Curation.mixToBudget(docs, "lang", "id",
      col("n"), Map("en" -> 0.5, "de" -> 0.25), budget = 200L)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stats("en") === ((100L, 2L, 80L)))
    assert(stats("de") === ((50L, 2L, 40L)))
  }

  test("strideInterleave: round-robin positions, dense per prefix, unindexed groups out") {
    val docs = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L),
      ("b", 5L), ("b", 6L),
      ("zz", 1L) // no index → excluded
    ).toDF("grp", "id")
    val out = Curation.strideInterleave(docs, "grp", "id", Map("a" -> 0, "b" -> 1))
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getLong(3)).toMap
    assert(out === Map(
      ("a", 10L) -> 0L, ("b", 5L) -> 1L,
      ("a", 20L) -> 2L, ("b", 6L) -> 3L,
      ("a", 30L) -> 4L))
    // positions 0..3 are a full round-robin prefix; no duplicates anywhere
    assert(out.values.toSeq.distinct.size === out.size)
  }

  test("featureHash: bucket counts sum to token count; deterministic buckets") {
    val docs = Seq((1L, "the cat the dog"), (2L, "x")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.posexplode(
        TextOps.featureHash(col("text"), 16)).as(Seq("j", "cnt")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 16 buckets per doc; totals = token counts
    assert(out.keys.count(_._1 == 1L) === 16)
    assert(out.collect { case ((1L, _), c) => c }.sum === 4L)
    assert(out.collect { case ((2L, _), c) => c }.sum === 1L)
    // "the" appears twice → its bucket holds at least 2 for doc 1
    assert(out.values.max >= 2)
  }

  test("fuzzyContamination: near-copies of eval flagged, unrelated and eval rows not") {
    import spark.implicits._
    // 100 DISTINCT-PREFIX tokens (the word hash reads the first 3 chars +
    // length, so `tok1..tok100` would collide); last one edited → trigram
    // Jaccard = 97/99 ≈ 0.98 and all four bands match the deterministic
    // signatures with near-certainty
    val letters = (0 until 100).map(i => s"${('a' + i / 10).toChar}${('a' + i % 10).toChar}")
    val base = letters.mkString(" ")
    val nearCopy = (letters.dropRight(1) :+ "zz").mkString(" ")
    val unrelated = (0 until 100)
      .map(i => s"${('0' + i / 10).toChar}${('0' + i % 10).toChar}").mkString(" ")
    val docs = Seq(
      (1L, base, true), // eval
      (2L, nearCopy, false), // train near-dup of eval -> flagged
      (3L, unrelated, false), // train, unrelated
      (4L, base, true) // a second eval doc identical to the first
    ).toDF("doc_id", "text", "is_eval")
    val out = Curation.fuzzyContamination(docs, "doc_id", "text",
      col("is_eval"), 0.7).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(2L)) // only the near-copy, only train side
    assert(out(2L)._1 === 2L) // it matches BOTH eval copies
    assert(out(2L)._2 > 0.8 && out(2L)._2 < 1.0)
    // a stricter threshold clears the report
    assert(Curation.fuzzyContamination(docs, "doc_id", "text",
      col("is_eval"), 0.999).count() === 0L)
  }
}
