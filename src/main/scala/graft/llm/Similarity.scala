package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products / norms are higher-order-function Column expressions
  * (`zip_with` + `aggregate`) — codegen'd, no UDF, accumulation in DOUBLE in
  * array order (deterministic). Cosines are rounded to 6 decimals before
  * ranking so results are reproducible across engines; ties break on the
  * candidate id.
  *
  * Scale paths:
  *   - brute-force top-k: broadcast the (small) query set, scan candidates
  *     once, per-query top-k — O(|queries|·|corpus|) dot products but a
  *     single pass over the corpus, no shuffle of the corpus itself;
  *   - IVF: assign every vector to its nearest centroid (broadcast
  *     centroids), then search only the probed cluster — the corpus is
  *     hash-partitioned by `centroid`, so a query touches 1/k of the data;
  *   - sign-LSH (random hyperplanes): bucket by sign bits, search in-bucket.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in DOUBLE, sequential in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Rounded cosine similarity — backed by the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression (single fused loop in
    * whole-stage codegen; bit-identical to the HOF formulation
    * `dot/(norm·norm)`, asserted in VectorExpressionsSpec). */
  def cosine(a: Column, b: Column, scale: Int = 6): Column =
    round(graft.functions.GraftFunctions.cosineSim(a, b), scale)

  /** Brute-force cosine top-k: for every row of `queries`, the k nearest
    * rows of `corpus` (excluding itself when ids collide). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k via the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate instead of a window:
    * partial (map-side) aggregation ships k rows per query per partition to
    * the exchange, where the window formulation shuffles EVERY scored
    * candidate. Result-identical to [[cosineTopK]] (same tie order). */
  def cosineTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topKByScore(col("cos"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF coarse quantization: nearest centroid per vector by (rounded)
    * squared L2 distance, centroid id breaking ties. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val v = corpus.select(col("vec_id"), col("embedding").as("ve"))
    val d2 = aggregate(
      zip_with(col("ve"), col("ce"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val scored = v.crossJoin(broadcast(c)).select(col("vec_id"), col("centroid_id"),
      round(d2, 6).as("dist2"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("vec_id", "centroid_id", "dist2")
  }

  /** IVF search: top-k among candidates sharing the query's centroid. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val assign = ivfAssign(corpus, centroids).cache() // reused by query + candidate sides
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .join(assign.select(col("vec_id").as("qid"), col("centroid_id")), "qid")
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .join(assign.select(col("vec_id").as("cid"), col("centroid_id")), "cid")
    val scored = c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign-LSH bucket id from `nPlanes` deterministic pseudo-random
    * hyperplanes: plane i, dim j has weight ((i·64+j)·2654435761 mod 1000)
    * / 1000 − 0.5 (exact rational — reproducible in SQL). */
  def lshBucket(embedding: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { i =>
      val proj = aggregate(
        zip_with(embedding, sequence(lit(i * dims), lit(i * dims + dims - 1)),
          (x, idx) => x.cast("double") * ((idx * 2654435761L % 1000).cast("double") / 1000 - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(round(proj, 6) > 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** Embedding near-dup pairs: bucket by sign-LSH, verify cosine ≥ threshold
    * only within buckets (the banded scale path — no all-pairs join). */
  def embeddingNearDups(corpus: DataFrame, nPlanes: Int, dims: Int,
      threshold: Double): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes, dims).as("bucket"))
      .cache() // both sides of the bucket self-join
    val l = b.select(col("bucket"), col("vec_id").as("d1"), col("embedding").as("e1"))
    val r = b.select(col("bucket"), col("vec_id").as("d2"), col("embedding").as("e2"))
    l.join(r, Seq("bucket")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
