package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The two-oracle discipline for x_dedup_srp_auto, plus the mechanical
  * tier-selection check the round-12 verdict asked for (task 8): each
  * corpus regime must select the documented tier WITHOUT a human reading
  * the canary. */
class R59OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("srpAutoTier: escalates exactly when the corpus outnumbers the " +
      "current band space (n > 2^bits), ladder clamped at 24 bits") {
    assert(Similarity.srpAutoTier(1L) === ((32, 8)))
    assert(Similarity.srpAutoTier(256L) === ((32, 8)))
    assert(Similarity.srpAutoTier(257L) === ((64, 16)))
    assert(Similarity.srpAutoTier(625L) === ((64, 16)))   // gate scales
    assert(Similarity.srpAutoTier(25000L) === ((64, 16))) // sf1h fixture
    assert(Similarity.srpAutoTier(65536L) === ((64, 16)))
    assert(Similarity.srpAutoTier(65537L) === ((144, 24))) // third rung
    assert(Similarity.srpAutoTier(2500000L) === ((144, 24))) // 16-bit-saturating density
  }

  test("x_dedup_srp_auto at the gate scale dispatches to the sized tier " +
      "and its pairs equal x_dedup_srp_sized's exactly") {
    val auto = SparkEntry.queries("x_dedup_srp_auto")(spark, sf).collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getInt(0) == 16), "n = 625 > 256 -> 16-bit tier")
    val sized = SparkEntry.queries("x_dedup_srp_sized")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val autoPairs = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
      .sorted.toSeq
    assert(autoPairs === sized, "same candidate machinery behind the dispatch")
  }

  test("x_dedup_srp_auto on a small written corpus (n <= 256) dispatches " +
      "to the 8-bit default, pairs matching srpNearDups(32, 8) replay") {
    // 150 base vectors -> 150 + 37 clones = 187 <= 256: the 8-bit branch,
    // unreachable at the shipped gate scales, exercised on a real parquet
    // dir so the REGISTERED query (counts included) runs end-to-end
    val dir = java.nio.file.Files
      .createTempDirectory("graft_srp_auto").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 150)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {
      val auto = SparkEntry.queries("x_dedup_srp_auto")(spark, dir).collect()
      assert(auto.nonEmpty)
      assert(auto.forall(_.getInt(0) == 8), "n = 187 <= 256 -> 8-bit tier")
      val small = graft.Tables(spark, dir)
      val expect = Similarity.srpNearDups(R9Ops.srpAugmented(small),
          planes = 32, bandBits = 8, dims = 64, tau = 0.9, maxBucket = 32)
        .collect().map(_.toString).sorted.toSeq
      val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
        .sorted.toSeq
      assert(got === expect)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
    }
  }

  test("x_dedup_srp_auto on a written 66k-replica corpus (n > 2^16) " +
      "dispatches to the 24-bit rung, pairs matching srpNearDups(144, 24)") {
    // 132 sign-flip replicas x 500 base vectors = 66,000 (augmented
    // 82,500 > 2^16): the third rung, unreachable at the shipped gates,
    // exercised end-to-end through the REGISTERED query. Per-replica
    // deterministic sign flips keep replicas decorrelated (an isometry
    // per replica — the make_sf1 --embhonest rationale) so the corpus
    // has no exact-dup cliques, only the 1-in-4 clone families the
    // augmentation adds. Ids strided 1000 stay far below the 10^6 clone
    // offset.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_srp_auto24").toString
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .crossJoin(spark.range(0, 132).select(col("id").as("r")))
      .select((col("vec_id") + col("r") * 1000L).as("vec_id"),
        expr("""transform(embedding, (x, k) ->
                |  CASE WHEN xxhash64(r * 64 + k) % 2 = 0 THEN x
                |  ELSE -x END)""".stripMargin).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {
      val auto = SparkEntry.queries("x_dedup_srp_auto")(spark, dir).collect()
      assert(auto.nonEmpty)
      assert(auto.forall(_.getInt(0) == 24), "n = 82500 > 2^16 -> 24-bit rung")
      val big = graft.Tables(spark, dir)
      val expect = Similarity.srpNearDups(R9Ops.srpAugmented(big),
          planes = 144, bandBits = 24, dims = 64, tau = 0.9, maxBucket = 32)
        .collect().map(_.toString).sorted.toSeq
      val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
        .sorted.toSeq
      assert(got === expect)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
    }
  }

  test("x_dedup_ngram_auto at the growing-vocabulary gate scale keeps " +
      "width 3 and matches x_dedup_ngram_jaccard exactly") {
    val auto = SparkEntry.queries("x_dedup_ngram_auto")(spark, sf).collect()
    assert(auto.nonEmpty)
    assert(auto.forall(_.getInt(0) == 3), "sf0.001 reads heaps -> width 3")
    val base = SparkEntry.queries("x_dedup_ngram_jaccard")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
      .sorted.toSeq
    assert(got === base, "same inverted-index pass behind the dispatch")
  }

  test("x_dedup_ngram_auto on a written saturated-vocabulary corpus " +
      "coarsens to width 5, pairs matching ngramJaccardPairs(width=5)") {
    import spark.implicits._
    // 3-word vocabulary (distinct first-3-chars+length so wordHash can't
    // collide) over 40 docs: every trigram combination appears in the
    // 25% carve already, so n_shingles is FLAT across levels while
    // postings quadruple -> the saturated read -> width 5
    val vocab = Array("aa", "bb", "cc")
    val docs = (0 until 40).map { i =>
      val words = (0 until 30).map(k => vocab((i * 7 + k * 3 + k) % 3))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ngram_auto").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val auto = SparkEntry.queries("x_dedup_ngram_auto")(spark, dir)
        .collect()
      assert(auto.nonEmpty, "a 3-word corpus has width-5 near-dups")
      assert(auto.forall(_.getInt(0) == 5), "saturated read -> width 5")
      val expect = graft.llm.Dedup.ngramJaccardPairs(
          graft.Tables(spark, dir).documents, "doc_id", "text",
          threshold = 0.5, width = 5)
        .collect().map(_.toString).sorted.toSeq
      val got = auto.map(r => s"[${r.get(1)},${r.get(2)},${r.get(3)}]")
        .sorted.toSeq
      assert(got === expect)
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
    }
  }

  test("x_dedup_ngram_auto on a degenerate carve (no doc_id % 4 = 0 " +
      "docs) takes the width-3 default in BOTH engines (ADVICE r13)") {
    import spark.implicits._
    // all ids ≡ 2 (mod 4): the 50% level exists but the 25% level is
    // empty, so heapsRegimeSampled reads "undetermined" -> width 3, and
    // the oracle's lvl-1 scalar subquery is NULL so both WHEN
    // comparisons fail to its ELSE width 3 — the parity the advice
    // flagged, asserted against the DISPATCH COLUMN of both engines
    val docs = (0 until 30).map { i =>
      val words = (0 until 25).map(k => s"w${(i * 5 + k) % 9}x")
      (2L + 4L * i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ngram_degen").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val auto = SparkEntry.queries("x_dedup_ngram_auto")(spark, dir)
        .collect()
      assert(auto.nonEmpty, "a 9-word corpus has width-3 near-dups")
      assert(auto.forall(_.getInt(0) == 3),
        "missing carve level -> undetermined -> width-3 default")
      // oracle shape: an EMPTY scalar subquery (the hp CTE has no lvl-1
      // row on this corpus) is NULL, and a NULL comparison falls through
      // every WHEN to the ELSE width-3 branch — asserted on the exact
      // comparison shape the registered SQL uses (standard 3VL, same in
      // DuckDB; the decision functions' None branch is unit-tested in
      // TierSelectSpec)
      val w = spark.sql(
        """SELECT CASE
          |  WHEN 2 * (SELECT ns FROM (SELECT 1 AS lvl, 10L AS ns)
          |            WHERE lvl = 2)
          |    >= 3 * (SELECT ns FROM (SELECT 1 AS lvl, 10L AS ns)
          |            WHERE lvl = 99) THEN 5
          |  ELSE 3 END AS probe""".stripMargin)
      assert(w.collect().head.getInt(0) == 3,
        "empty scalar subquery comparison falls to ELSE (3VL)")
    } finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => try java.nio.file.Files.delete(f)
          catch { case _: Throwable => () })
    }
  }
}
