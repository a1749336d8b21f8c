package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.TextOps

/** Bit-identity of the native DSIR expressions against the HOF
  * formulations they replaced (TextOps.ngramBuckets and the
  * aggregate/element_at scoring fold). */
class DsirExpressionsSpec extends SparkSpec {

  private val dim = 64

  private lazy val docs = {
    import spark.implicits._
    val fixture = graft.Tables(spark, "/root/testdata/sf0.001").documents
      .select(col("doc_id").cast("string").as("id"), col("text"))
    val edges = Seq(
      ("e1", ""), ("e2", "one"), ("e3", "one two"),
      ("e4", "a  b   c d"), ("e5", " pad  pad "),
      ("e6", "café über naïve café")).toDF("id", "text")
    fixture.unionByName(edges)
  }

  test("ngramBuckets(native) == HOF (filtered tokens, uni then bi)") {
    val bad = docs.select(col("id"),
        Dsir.ngramBuckets(col("text"), dim).as("a"),
        TextOps.ngramBuckets(col("text"), dim).as("b"))
      .filter(!(col("a") <=> col("b"))).limit(5).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("dsirDot(native) == aggregate/element_at fold over the HOF buckets") {
    // a deterministic pseudo-random lrn array literal
    val lrn = array((0 until dim).map(j => lit(((j * 2654435761L) % 2001L)
      - 1000L)): _*)
    val bad = docs.select(col("id"),
        Dsir.dsirDot(col("text"), lrn, dim).as("a"),
        aggregate(TextOps.ngramBuckets(col("text"), dim), lit(0L),
          (acc, j) => acc + element_at(lrn, j.cast("int") + 1)).as("b"))
      .filter(!(col("a") <=> col("b"))).limit(5).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}
