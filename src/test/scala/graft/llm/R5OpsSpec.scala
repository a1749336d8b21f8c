package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-5 operators: BM25, char entropy, SQ8 quantization, plus the
  * typed-Aggregator geometric mean. */
class R5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: exact score on a hand-checked corpus, rank order, zero-score docs dropped") {
    val docs = Seq(
      (1L, "cat dog cat"),   // tf(cat)=2, dl=3
      (2L, "dog dog bird"),  // tf(cat)=0
      (3L, "cat"),           // tf(cat)=1, dl=1
      (4L, "fish fish fish") // no match
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // N=4, df=2, idf = ln(1 + 2.5/2.5) = ln 2; avgdl = (3+3+1+3)/4 = 2.5
    val idf = math.log(2.0)
    def tfc(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.5))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r6(idf * tfc(2, 3)); val s3 = r6(idf * tfc(1, 1))
    assert(out.map(_._1).toSet === Set(1L, 3L)) // zero-score docs dropped
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === s1 && byId(3L) === s3)
    assert(out.find(_._1 == out.head._1).get._3 === 1) // best rank = 1
  }

  test("charEntropy: uniform chars -> log2(k); single char -> 0; empty -> 0") {
    val docs = Seq((1L, "abcd"), (2L, "aaaa"), (3L, ""), (4L, "aabb"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextOps.charEntropy(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 2.0)  // 4 distinct uniform chars
    assert(out(2L) === 0.0)  // one symbol: zero entropy
    assert(out(3L) === 0.0)
    assert(out(4L) === 1.0)  // two symbols, 50/50
  }

  test("sq8: codes bounded 0..255, max reconstruction error <= half step, range endpoints exact") {
    val emb = Seq(
      (0L, Array(0.0f, 1.0f, 0.5f)),
      (1L, Array(0.25f, 0.75f, 1.0f))).toDF("vec_id", "embedding")
    val err = Sq8.sqError(emb, "embedding").collect().head
    assert(err.getLong(0) === 6L)
    assert(err.getBoolean(3)) // within half step by construction
    // qmin/qmax themselves reconstruct exactly (codes 0 and 255)
    assert(err.getDouble(2) <= (1.0 - 0.0) / 255 / 2 + 1e-12)
    val codes = emb.select(explode(Sq8.sqEncode(col("embedding"), lit(0.0), lit(1.0))))
      .collect().map(_.getLong(0))
    assert(codes.forall(c => c >= 0 && c <= 255))
    assert(codes.contains(0L) && codes.contains(255L))
  }

  test("sq8 topk: ranks by reconstructed distance, excludes self, k bounded") {
    val emb = (0L to 9L).map(i =>
      (i, Array.tabulate(4)(j => (i * 0.1f + j * 0.01f)))).toDF("vec_id", "embedding")
    val out = Sq8.sqTopK(emb.filter($"vec_id" < 2), emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.count(_._1 == 0L) === 3 && out.count(_._1 == 1L) === 3)
    assert(!out.exists(t => t._1 == t._2)) // self excluded
    // vec 0's nearest must be vec 1 (monotone geometry survives quantization)
    assert(out.filter(_._1 == 0L).minBy(_._3)._2 === 1L)
    assert(out.filter(_._1 == 1L).map(_._3).sorted.toSeq === Seq(1, 2, 3))
  }

  test("geoMean1p: exact on hand values, partial-merge invariant under repartition") {
    val df = Seq(("a", 0.0), ("a", 1.0), ("a", 3.0), ("b", 7.0))
      .toDF("k", "v").repartition(3)
    val out = df.groupBy("k")
      .agg(round(graft.functions.GeoMeanAggregator.geoMean1p(col("v")), 6).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // geomean(1, 2, 4) = 2; geomean(8) = 8
    assert(out("a") === 2.0)
    assert(out("b") === 8.0)
  }
}
