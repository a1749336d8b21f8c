package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the cheap 4×
  * compression tier below PQ ([[Pq]]): one global [qmin, qmax] range, each
  * float mapped to a 0..255 code, distances computed against the
  * RECONSTRUCTED values (asymmetric, exact query side — the faiss
  * `SQ8`/ADC posture). Where PQ trains codebooks, SQ8 is training-free:
  * the only corpus statistic is a min/max aggregate, so it drops into a
  * pipeline as scan → 1-row agg → broadcast → map.
  *
  * Scale shape: the range aggregate reads per-row `array_min`/`array_max`
  * (partial/final agg, no element explode); quantize/reconstruct are
  * in-row `transform`s on the scan; search is the brute-force cosine/L2
  * baseline of [[Similarity]] over reconstructed vectors (IVF/LSH bucket
  * the same reconstructed column for the 100 TB path).
  */
object Sq8 {

  /** Global (qmin, qmax) over every element of `embCol` as a 1-row frame
    * to broadcast — per-row array extrema on the scan, then one min/max. */
  def sqRange(corpus: DataFrame, embCol: String): DataFrame =
    corpus.agg(
      min(array_min(col(embCol).cast("array<double>"))).as("qmin"),
      max(array_max(col(embCol).cast("array<double>"))).as("qmax"))

  /** 0..255 code per element: round((x − qmin)/(qmax − qmin) · 255).
    * A constant corpus (qmax == qmin) degenerates to code 0 everywhere
    * (every value IS qmin) instead of 0/0 = NaN → NULL codes. */
  def sqEncode(emb: Column, qmin: Column, qmax: Column): Column =
    transform(emb.cast("array<double>"),
      x => when(qmax === qmin, 0L)
        .otherwise(round((x - qmin) / (qmax - qmin) * 255).cast("bigint")))

  /** Reconstructed (dequantized) vector: qmin + code · step. */
  def sqRecon(emb: Column, qmin: Column, qmax: Column): Column = {
    val step = (qmax - qmin) / 255.0
    transform(sqEncode(emb, qmin, qmax), c => qmin + c.cast("double") * step)
  }

  /** Reconstruction-error audit: one row
    * (n_values, avg_abs_err, max_abs_err, within_half_step) — the
    * contract a quantized index must satisfy (max error ≤ step/2 by
    * construction) surfaced as a checkable boolean. */
  def sqError(corpus: DataFrame, embCol: String): DataFrame = {
    val r = sqRange(corpus, embCol)
    val step = (col("qmax") - col("qmin")) / 255.0
    val errs = corpus.crossJoin(broadcast(r))
      .select(zip_with(col(embCol).cast("array<double>"),
        sqRecon(col(embCol), col("qmin"), col("qmax")),
        (x, y) => abs(x - y)).as("e"), step.as("step"))
      .select(aggregate(col("e"), lit(0.0), (a, v) => a + v).as("sum_err"),
        array_max(col("e")).as("mx"), size(col("e")).as("n"), col("step"))
    errs.agg(
      sum(col("n")).as("n_values"),
      round(sum(col("sum_err")) / sum(col("n")), 8).as("avg_abs_err"),
      round(max(col("mx")), 8).as("max_abs_err"),
      (max(col("mx")) <= first(col("step")) / 2 + 1e-12).as("within_half_step"))
  }

  /** Asymmetric top-k L2 search: exact query vectors against the
    * reconstructed corpus; d2 rounded for cross-engine determinism, rank
    * by (d2, corpus id), self-match excluded. Brute-force baseline shape
    * (queries × corpus); bucket the reconstructed column for scale. */
  def sqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val r = sqRange(corpus, embCol)
    val q = queries.select(col(idCol).as("qid"),
      col(embCol).cast("array<double>").as("qe"))
    val c = corpus.crossJoin(broadcast(r))
      .select(col(idCol).as("cid"),
        sqRecon(col(embCol), col("qmin"), col("qmax")).as("ce"))
    val d2 = aggregate(zip_with(col("qe"), col("ce"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, v) => acc + v)
    val scored = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), round(d2, 6).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d2"), col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
