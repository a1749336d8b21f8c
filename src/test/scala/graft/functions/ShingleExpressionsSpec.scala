package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextOps

/** Bit-identity of the round-15 native shingle expressions against the
  * retired HOF formulations they replaced (the `*Hof` references kept in
  * TextOps) — same posture as the r12 SrpSignatures pin. Covers both the
  * plain and fused-distinct variants, over the driver's documents fixture
  * and a hand-built edge corpus (empty text, < n tokens, empty tokens from
  * repeated spaces, BMP non-ASCII, nulls).
  *
  * Known out-of-universe divergence, inherited from MinHashUtil: the kernel
  * walks UTF-16 code units (`String.charAt`/`length`) where the HOF used
  * `ascii(substr)`/`length` code points — identical on the Basic
  * Multilingual Plane, divergent only for astral-plane characters, which
  * the fixtures (and the oracle corpus) do not contain.
  */
class ShingleExpressionsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val fixture = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val edges = Seq(
      ("e1", ""), ("e2", "one"), ("e3", "one two"), ("e4", "one two three"),
      ("e5", "a  b   c d"), ("e6", " leading and trailing "),
      ("e7", "rep rep rep rep rep"), ("e8", "café über naïve café über naïve"),
      ("e9", null.asInstanceOf[String])).toDF("id", "text")
    fixture.unionByName(edges)
  }

  private def assertSame(native: org.apache.spark.sql.Column,
      hof: org.apache.spark.sql.Column): Unit = {
    val bad = docs.select(col("id"), native.as("a"), hof.as("b"))
      .filter(!(col("a") <=> col("b"))).limit(5).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("wordNgrams(native) == HOF for widths 2, 3, 5, 13") {
    for (n <- Seq(2, 3, 5, 13))
      assertSame(Shingles.wordNgrams(col("text"), n),
        TextOps.wordNgramsHof(col("text"), n))
  }

  test("wordTrigrams/wordBigrams delegate equals retired HOF") {
    assertSame(TextOps.wordTrigrams(col("text")),
      TextOps.wordTrigramsHof(col("text")))
    assertSame(TextOps.wordBigrams(col("text")),
      TextOps.wordBigramsHof(col("text")))
  }

  test("wordTrigramHashes(native) == HOF (1000003/1000033 universe)") {
    assertSame(Shingles.wordTrigramHashes(col("text")),
      TextOps.wordTrigramHashesHof(col("text")))
  }

  test("wordNgramHashes(native) == HOF (uniform 1000003) for widths 2, 5") {
    for (n <- Seq(2, 5))
      assertSame(Shingles.wordNgramHashes(col("text"), n),
        TextOps.wordNgramHashesHof(col("text"), n))
  }

  test("fused distinct == array_distinct of the plain form") {
    assertSame(Shingles.wordNgrams(col("text"), 3, distinct = true),
      array_distinct(TextOps.wordNgramsHof(col("text"), 3)))
    assertSame(Shingles.wordTrigramHashes(col("text"), distinct = true),
      array_distinct(TextOps.wordTrigramHashesHof(col("text"))))
    assertSame(Shingles.wordNgramHashes(col("text"), 5, distinct = true),
      array_distinct(TextOps.wordNgramHashesHof(col("text"), 5)))
  }

  test("windowHashes(native) == transform/sequence/substring/xxhash64 HOF " +
      "on docs with length >= winLen (incl. multibyte)") {
    import org.apache.spark.sql.Column
    def hof(winLen: Int): Column = expr(
      s"transform(sequence(0, length(text) - $winLen), " +
        s"i -> xxhash64(substring(text, i + 1, $winLen)))")
    for (w <- Seq(3, 40)) {
      val d = docs.filter(length(col("text")) >= w)
      val bad = d.select(col("id"),
          Shingles.windowHashes(col("text"), w).as("a"), hof(w).as("b"))
        .filter(!(col("a") <=> col("b"))).limit(5).collect()
      assert(bad.isEmpty, s"winLen=$w: ${bad.mkString("; ")}")
    }
    // short input → EMPTY array (call sites filter length >= winLen first;
    // the HOF form would walk a descending sequence there)
    import org.apache.spark.unsafe.types.UTF8String
    assert(ShingleUtil.windowHashes(UTF8String.fromString("ab"), 3)
      .numElements() === 0)
  }

  test("charEntropySum(native) == HOF fold (same float accumulation order)") {
    assertSame(Shingles.charEntropySum(col("text")),
      TextOps.charEntropySumHof(col("text")))
  }

  test("interpreted eval matches codegen (kernel is the shared path)") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("a b c a b c")
    val arr = ShingleUtil.ngrams(s, 3, distinct = false)
    assert(arr.numElements() === 4)
    assert(arr.getUTF8String(0).toString === "a b c")
    val dis = ShingleUtil.ngrams(s, 3, distinct = true)
    assert(dis.numElements() === 3)
    // < n tokens → empty array, not null
    assert(ShingleUtil.ngrams(UTF8String.fromString("x y"), 3, false)
      .numElements() === 0)
    assert(ShingleUtil.trigramHashes(UTF8String.fromString(""), false)
      .numElements() === 0)
  }
}
