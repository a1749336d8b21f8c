package graft.llm

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR skips an exact duplicate of the first pick in favor of a diverse vector") {
    // query 0 = (1,0); 1 and 2 are IDENTICAL (rel ≈ 0.7); 3 is less
    // relevant (0.6) but anti-correlated with 1 → after picking 1, the
    // duplicate's penalty (max-sim = 1) sinks it below 3
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.7f, 0.7141428f)),
      (2L, Array(0.7f, 0.7141428f)),
      (3L, Array(0.6f, -0.8f))).toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(emb, queryId = 0L, poolSize = 3, k = 3,
      lam = 0.7, mu = 0.3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    assert(sel.map(_._2).toSeq === Seq(1L, 3L, 2L))
  }

  test("pure-relevance order when mu = 0") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.4358899f)),
      (2L, Array(0.8f, 0.6f)),
      (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val sel = Similarity.mmrSelect(emb, 0L, poolSize = 3, k = 3,
      lam = 1.0, mu = 0.0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // relevance order: 1 (0.9) > 2 (0.8) > 3 (0.6)
    assert(sel.map(_._2).toSeq === Seq(1L, 2L, 3L))
  }
}
