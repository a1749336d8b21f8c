package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 ops: SemDeDup (learned-partition embedding dedup) and the
  * CCNet-style bigram-LM quality score / perplexity buckets. */
class R6OpsSpec extends SparkSpec {
  import spark.implicits._

  // two tight pairs on orthogonal axes: (0,1) and (2,3) are near-identical,
  // cross-pair cosines ~0
  val emb = Seq(
    (0L, Array(1.0f, 0.0f), 10),
    (1L, Array(0.99f, 0.01f), 11),
    (2L, Array(0.0f, 1.0f), 12),
    (3L, Array(0.01f, 0.99f), 13)).toDF("vec_id", "embedding", "label")

  test("semDedupPairs finds within-cluster near-dups and nothing across") {
    val pairs = Similarity.semDedupPairs(emb, k = 2, iters = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (2L, 3L)))
  }

  test("semDedup keeps one representative per semantic cluster, passes labels through") {
    val out = Similarity.semDedup(emb, k = 2, iters = 2, threshold = 0.9)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 10, 2L -> 12)) // min-id survivor per pair
  }

  test("semDedup threshold above max cosine keeps everything") {
    val out = Similarity.semDedup(emb, k = 2, iters = 2, threshold = 1.1)
    assert(out.count() === 4)
  }

  test("gopherGate: each rule fires alone and reasons accumulate") {
    val d = Seq(
      (1L, ("the quick brown fox jumps over lazy dogs near " * 3).trim), // 27 toks, has 'the' -> keep
      (2L, "the tiny doc here"), // too few tokens
      (3L, "the " + ("spam " * 30).trim), // repetition (spam share ~0.97)
      (4L, ("a b c d " * 8).trim + " the end padding words making tokens pass extra filler now ok")) // short words
      .toDF("doc_id", "text")
    val out = TextOps.gopherGate(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(5), r.getString(4)))).toMap
    assert(out(1L) === ((true, "")))
    assert(out(2L)._2.contains("tokens"))
    assert(out(3L)._2.contains("repetition"))
    assert(out(4L)._2.contains("word_len"))
    // a doc failing several rules lists them all, comma-joined in rule order
    val multi = TextOps.gopherGate(
      Seq((9L, "zz zz zz")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getString(4)
    assert(multi === "tokens,repetition,word_len,stopwords")
  }

  test("prototypeFilter drops both distance tails per cluster") {
    // one tight cluster around (1,0) with a far outlier, k=1 so the
    // cluster structure is trivial and ranks are hand-checkable
    val vs = Seq(
      (0L, Array(1.0f, 0.0f)), // prototype-adjacent after training
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.7f, 0.3f)),
      (4L, Array(-5.0f, 5.0f))) // far outlier
      .toDF("vec_id", "embedding")
    val out = Similarity.prototypeFilter(vs, k = 1, iters = 1,
      dropNear = 0.2, dropFar = 0.2).collect().map(_.getLong(0)).toSet
    // n=5: drop rank 1 (nearest) and rank 5 (farthest outlier), keep 3
    assert(out.size === 3)
    assert(!out.contains(4L)) // the outlier is gone
    // zero drop fractions pass everything through
    assert(Similarity.prototypeFilter(vs, 1, 1, 0.0, 0.0).count() === 5)
  }

  val docs = Seq(
    (1L, "a b a b"), // bigrams (a,b)x2, (b,a)x1
    (2L, "a b"), // bigram (a,b)x1
    (3L, "c"), // no bigrams -> drops out
    (4L, "")).toDF("doc_id", "text")

  test("lmScore matches the hand-computed add-one bigram NLL") {
    // corpus: C(a,b)=3, C(b,a)=1; C(a)=3, C(b)=3; |V|=3
    // P(b|a)=(3+1)/(3+3)=2/3, P(a|b)=(1+1)/(3+3)=1/3
    val got = TextOps.lmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(1L, 2L)) // docs 3, 4 have no bigrams
    val nll1 = -(2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3
    val nll2 = -math.log(2.0 / 3)
    assert(got(1L)._1 === 3L)
    assert(math.abs(got(1L)._2 - nll1) < 1e-6)
    assert(got(2L)._1 === 1L)
    assert(math.abs(got(2L)._2 - nll2) < 1e-6)
  }

  test("ppxBuckets: most fluent doc is head, least is tail") {
    val got = TextOps.ppxBuckets(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // doc2 (nll≈0.405) <= t1 -> head; doc1 (nll≈0.637) > t2 -> tail
    assert(got === Map(2L -> "head", 1L -> "tail"))
  }

  // target docs speak "x y"; raw docs 10/11 mix target-ish and alien
  // vocabulary, raw doc 12 is purely alien
  val dsirDocs = Seq(
    (1L, "x y x y", "tgt"),
    (2L, "x y y x", "tgt"),
    (10L, "x y q q", "raw"),
    (11L, "q q x y", "raw"),
    (12L, "q r q r", "raw")).toDF("doc_id", "text", "source")
  val isTgt = col("source") === "tgt"

  test("dsirWeights ranks target-like raw docs above alien ones") {
    val w = Curation.dsirWeights(dsirDocs, "doc_id", "text", isTgt, 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet === Set(10L, 11L, 12L)) // raw slice only
    assert(w(10L) > w(12L) && w(11L) > w(12L)) // target-like beats alien
  }

  test("dsirResample is deterministic and bounded by k") {
    val s1 = Curation.dsirResample(dsirDocs, "doc_id", "text", isTgt, 32, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val s2 = Curation.dsirResample(dsirDocs, "doc_id", "text", isTgt, 32, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq) // hash-derived Gumbel noise: replayable
    assert(s1.length === 2)
  }

  val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog while the calm cat sleeps near the stove"),
    (3L, "completely different content about database query planning engines and their cost models"))
    .toDF("doc_id", "text")
  val batchDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog while the calm cat sleeps near the stove"), // exact dup of 1
    (11L, "the quick brown fox jumps over the lazy dog while the calm cat sleeps near the oven"), // near dup of 1
    (12L, "entirely novel text describing streaming watermarks and stateful aggregation semantics today"))
    .toDF("doc_id", "text")

  test("dedupAgainst drops exact and near corpus dups, keeps novel docs") {
    val out = Dedup.dedupAgainst(batchDocs, corpusDocs, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(12L)) // 10 exact-dropped, 11 near-dropped
  }

  test("dedupAgainst is one-directional: within-batch dups both survive") {
    val batch = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainst(batch, corpusDocs, "doc_id", "text", 0.5)
    assert(out.count() === 2) // corpus has no match; batch-internal dedup is exactDedup's job
  }

  test("temperatureSample: alpha<1 saturates the small group, thins the large") {
    val docs = (0L until 90L).map(i => (i, "big")) ++ (100L until 110L).map(i => (i, "small"))
    val df = docs.toDF("doc_id", "grp")
    // rates at B=50, alpha=0.5: r_small = 50*sqrt(10)/(Z*10) > 1 -> capped 1
    // (all 10 kept, deterministically); r_big ~= 0.417 -> ~37 of 90 kept
    val out = Sampling.temperatureSample(df, "grp", "doc_id", 0.5, 50L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "small") === 10)
    val big = out.count(_._2 == "big")
    assert(big > 20 && big < 55, s"big kept $big")
    // budget >= N keeps everything, and the sample replays
    assert(Sampling.temperatureSample(df, "grp", "doc_id", 0.5, 1000L).count() === 100)
    val again = Sampling.temperatureSample(df, "grp", "doc_id", 0.5, 50L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSet === again.toSet)
  }

  test("dsirWeights of an empty doc is exactly 0") {
    val d = Seq((1L, "x", "tgt"), (2L, "", "raw")).toDF("doc_id", "text", "source")
    val w = Curation.dsirWeights(d, "doc_id", "text", col("source") === "tgt", 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w === Map(2L -> 0.0))
  }

  // --- budgetSelect: histogram form vs the naive greedy prefix ---

  /** Naive reference: cumulative sum over (score DESC, id ASC). */
  private def naivePrefix(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, _, t) =>
      cum += t; if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("budgetSelect equals the naive global prefix, boundary bin included") {
    // scores engineered so one bin (0.105 & 0.1051 share floor(s*1000)=105)
    // straddles the budget and needs the exact in-bin prefix
    val rows = Seq(
      (1L, 0.9, 40L), (2L, 0.5, 30L), (3L, 0.105, 20L), (4L, 0.1051, 25L),
      (5L, 0.1, 50L), (6L, 0.05, 10L))
    val df = rows.toDF("doc_id", "score", "toks")
    for (budget <- Seq(0L, 39L, 40L, 95L, 100L, 114L, 120L, 175L, 500L)) {
      val got = Curation.budgetSelect(df, "doc_id", "score", "toks", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === naivePrefix(rows, budget), s"budget=$budget")
    }
  }

  test("budgetSelect: score ties break by id, null scores excluded") {
    val df = Seq((10L, Some(0.2), 5L), (2L, Some(0.2), 5L), (7L, Some(0.2), 5L),
      (99L, None, 5L)).toDF("doc_id", "score", "toks")
    val got = Curation.budgetSelect(df, "doc_id", "score", "toks", 10L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 7L)) // id order within the tied score
  }

  test("budgetSelect plan: histogram broadcast, no corpus-wide global sort") {
    val df = (1L to 100L).map(i => (i, i / 1000.0, 3L)).toDF("doc_id", "score", "toks")
    val plan = Curation.budgetSelect(df, "doc_id", "score", "toks", 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange")) // bin verdicts onto the scan
    // the only unpartitioned exchanges are the KB histogram prefix-sum
    // window (fed by the bin aggregate, never corpus rows) — it prints
    // once per union branch pre-AQE; runtime exchange reuse collapses them
    val sp = plan.linesIterator.zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).toSeq
    assert(sp.size <= 2)
    // each such exchange consumes the bin aggregate, not corpus rows
    val lines = plan.linesIterator.toVector
    sp.foreach { case (_, i) =>
      assert(lines.drop(i + 1).take(6).exists(_.contains("HashAggregate")),
        s"SinglePartition exchange at line $i not fed by the histogram aggregate")
    }
    // ...while the boundary bin's exact window is hash-partitioned
    assert(plan.contains("hashpartitioning(__bin"))
  }
}
