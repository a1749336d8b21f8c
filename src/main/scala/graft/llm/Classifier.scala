package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training of a fastText-style QUALITY CLASSIFIER — logistic
  * regression over hashing-trick features, full-batch gradient descent run
  * AS DATAFRAME JOBS. The missing piece between the scoring operators
  * (Gopher rules, bigram-LM perplexity) and a real curation pipeline: the
  * filter model itself is usually trained on the cluster that holds the
  * corpus, and this is that step expressed Spark-first.
  *
  * Distributed shape per iteration (×`iters`, then one scoring pass):
  *   1. dot products: one hash aggregate over the (doc, bucket, cnt)
  *      feature frame against the weight vector — the weights enter as an
  *      ARRAY LITERAL (model size = `dim` — KB), so scoring is map-side;
  *   2. gradient: one hash aggregate back onto the bucket key;
  *   3. a `dim`-row collect updates the driver-side weights — the same
  *      KB model barrier as kmeans centroids (SCALE.md "memory
  *      discipline"); the corpus itself never leaves the executors.
  *
  * DETERMINISM (the cross-engine contract): all sums are over BIGINT
  * nano-units — exact and ORDER-FREE, so partial-aggregation order can't
  * drift the model. The only floating point is the per-doc link function,
  * computed from an exact integer dot product; and instead of `exp` (libm
  * implementations differ by ulps across engines) the link is the
  * RATIONAL fast sigmoid σ̃(x) = 0.5 + x / (2·(1+|x|)) — every operation
  * IEEE-defined, so Spark and DuckDB produce bit-identical doubles —
  * then immediately re-quantized to nano-units via `floor(p·1e9 + 0.5)`.
  * Same GD trajectory, bit-exact, on both engines.
  */
object Classifier {

  /** Quantized fast-sigmoid of a nano-unit integer dot product:
    * `floor(σ̃(dot/1e9)·1e9 + 0.5)` as BIGINT in [0, 1e9]. */
  private def pNano(dotNano: Column): Column = {
    val x = dotNano.cast("double") / lit(1e9)
    floor((lit(0.5) + x / (lit(2.0) * (lit(1.0) + abs(x)))) * lit(1e9) + lit(0.5))
      .cast("long")
  }

  /** Train on hashed features and score every document.
    *
    * @param docs      corpus with `idCol` and `textCol`
    * @param labelWord documents containing this exact token are the
    *                  positive class (a stand-in for "docs a human marked
    *                  high-quality" — the mechanics are label-agnostic)
    * @return (finalWeightsNano, scores) — scores = (doc_id, p_nano,
    *         flagged); p_nano = σ̃(w·x) in nano-units, flagged = p > 0.5
    */
  def trainLogisticHashed(docs: DataFrame, idCol: String, textCol: String,
      labelWord: String, dim: Int = 16, iters: Int = 3): (Array[Long], DataFrame) = {
    val ids = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // (doc, bucket, cnt) sparse features — shared by every iteration
    val feats = Dedup.pin(ids
      .select(col("doc_id"), posexplode(TextOps.featureHash(col("text"), dim))
        .as(Seq("j", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("j").cast("int").as("j"), col("cnt").cast("long").as("cnt")))
    val labels = Dedup.pin(ids.select(col("doc_id"),
      (size(filter(split(col("text"), " "), t => t === labelWord)) > 0)
        .cast("long").as("y")))
    val nDocs = ids.count()

    var w = Array.fill(dim)(0L)
    def dots(wArr: Array[Long]): DataFrame =
      feats.groupBy("doc_id")
        .agg(sum(col("cnt") * element_at(lit(wArr), col("j") + 1)).as("dot"))
    for (_ <- 1 to iters) {
      val p = dots(w).select(col("doc_id"), pNano(col("dot")).as("p"))
      // gradient in exact nano-units: Σ_docs (p − y·1e9)·cnt per bucket
      val grads = feats
        .join(p, "doc_id").join(labels, "doc_id")
        .groupBy("j")
        .agg(sum((col("p") - col("y") * lit(1000000000L)) * col("cnt")).as("gs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // lr = 0.5: Δw_j = floor(gs_j/(2N) + 0.5) nano-units
      w = w.indices.map { j =>
        val gs = grads.getOrElse(j, 0L)
        w(j) - math.floor(gs / (2.0 * nDocs) + 0.5).toLong
      }.toArray
    }
    val scores = ids.select(col("doc_id"))
      .join(dots(w).select(col("doc_id"), pNano(col("dot")).as("p")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("p"), lit(500000000L)).as("p_nano")) // σ̃(0) for featureless docs
      .withColumn("flagged", col("p_nano") > 500000000L)
    (w, scores)
  }
}
