package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated document set and a
  * training dataloader: documents (measured in tokens) are laid out into
  * fixed-size context windows. Two standard layouts:
  *
  *  - [[packChunks]]: concat-and-chunk (GPT-style). Documents are
  *    concatenated in order within a shard and the stream is sliced every
  *    `windowSize` tokens; a document may span a window boundary. Pure
  *    prefix-sum arithmetic — one window function, no state.
  *  - [[packGreedy]]: capacity-respecting greedy packing. Documents are
  *    never split; a document that would overflow the current window opens
  *    a new one. Inherently sequential per shard, so the implementation is
  *    a single shard-clustered shuffle followed by an O(1)-state iterator
  *    walk per partition (the same streaming-merge shape as
  *    [[graft.plans.AsOfJoinExec]]) — no per-shard buffering, no
  *    collect_list, parallelism = number of shards.
  *
  * At 100 TB the shard column is the unit of parallelism (a real corpus
  * has 10^4..10^6 shards); both layouts scale with the scan plus exactly
  * one clustered shuffle.
  */
object Packing {

  /** Input row for the greedy packer (resolved by field name). */
  private[llm] final case class PackDoc(shard: String, doc_id: Long, toks: Long)

  /** Output row: the window ("bin") a document landed in, plus the window
    * fill AFTER placing it (exposes utilization without a second pass). */
  private[llm] final case class PackedDoc(
      shard: String, doc_id: Long, toks: Long, bin_id: Long, bin_fill: Long)

  /** Concat-and-chunk layout. For each document: its token offset interval
    * `[start_off, end_off)` in the shard's concatenated stream, the first
    * and last `windowSize`-token context window it touches, and whether it
    * spans a window boundary (the fraction of boundary-spanning documents
    * is the layout's attention-contamination metric).
    *
    * One cumulative-sum window per shard — `sum rows between unbounded
    * preceding and current row`, ordered by `idCol` (ids are unique, so the
    * frame is deterministic).
    */
  def packChunks(docs: DataFrame, shardCol: String, idCol: String,
      tokens: org.apache.spark.sql.Column, windowSize: Int): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive: $windowSize")
    // the frame runs over the RENAMED projection below
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        tokens.cast("bigint").as("toks"))
      .withColumn("end_off", sum("toks").over(w))
      .withColumn("start_off", col("end_off") - col("toks"))
      .withColumn("first_window", floor(col("start_off") / windowSize))
      // last token of the doc sits at end_off - 1 (docs are non-empty:
      // a whitespace split yields at least one token)
      .withColumn("last_window", floor((col("end_off") - 1) / windowSize))
      .withColumn("spans_boundary", col("last_window") > col("first_window"))
      .select("shard", "doc_id", "toks", "start_off",
        "first_window", "last_window", "spans_boundary")
  }

  /** Greedy whole-document packing: walk each shard in id order; if the
    * current window cannot fit the next document, open a new window. A
    * document larger than `cap` gets a window of its own (never split).
    *
    * Plan shape: repartition(shard) + sortWithinPartitions(shard, id) —
    * ONE shuffle — then a mapPartitions pass holding three scalars. The
    * iterator walk restarts its state at every shard change, so any
    * number of shards can share a partition.
    */
  def packGreedy(docs: DataFrame, shardCol: String, idCol: String,
      tokens: org.apache.spark.sql.Column, cap: Long): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val spark = docs.sparkSession
    import spark.implicits._
    val prepped = docs
      .select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("bigint").as("doc_id"),
        tokens.cast("bigint").as("toks"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[PackDoc]
    prepped.mapPartitions { it =>
      var shard: String = null
      var bin = 0L
      var fill = 0L
      it.map { d =>
        if (d.shard != shard) { shard = d.shard; bin = 0L; fill = 0L }
        if (fill > 0 && fill + d.toks > cap) { bin += 1; fill = 0L }
        fill += d.toks
        PackedDoc(d.shard, d.doc_id, d.toks, bin, fill)
      }
    }.toDF()
  }

  /** Per-shard packing summary over a [[packGreedy]] result: window count,
    * token total, and utilization (tokens / (windows · cap)) — the number
    * a pipeline owner watches to size `cap`. */
  def packStats(packed: DataFrame, cap: Long): DataFrame =
    packed.groupBy("shard")
      .agg((max("bin_id") + 1).as("n_windows"), sum("toks").as("n_tokens"))
      .withColumn("utilization",
        col("n_tokens").cast("double") / (col("n_windows") * cap))

  /** LENGTH-BUCKETED batching audit: assign every document to the
    * power-of-two bucket `cap = smallest 2^k ≥ tokens` and report, per
    * bucket, the count, true token mass, padded cost (`n_docs · cap` —
    * what a dataloader batching this bucket at its cap actually feeds the
    * model), and the padding waste ratio. This is the tokenizer-aware
    * batching decision: batching everything at the global max wastes
    * `1 − Σtoks/(N·max)` of compute; bucketing bounds waste below 50%
    * per bucket by construction (cap < 2·tokens).
    *
    * The cap is INTEGER arithmetic on both engines — `(t & (t−1)) = 0`
    * detects exact powers of two and `1 << length(bin(t))` rounds up
    * otherwise; no float `log2` whose `ceil` could tie-break differently
    * across engines at exact powers. Empty documents (0 tokens) are
    * excluded — they have no batch to join.
    *
    * Scale shape: scan-local arithmetic into a partial/final aggregate
    * over ≤ ~40 distinct caps — the shuffle carries one row per bucket
    * per task. */
  def lengthBuckets(docs: DataFrame, tokens: Column): DataFrame =
    docs.select(tokens.cast("bigint").as("toks"))
      .filter(col("toks") > 0)
      .withColumn("bucket_cap",
        when(expr("(toks & (toks - 1)) = 0"), col("toks"))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(toks)))")))
      .groupBy("bucket_cap")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .withColumn("padded", col("n_docs") * col("bucket_cap"))
      .withColumn("waste_ratio",
        round(lit(1.0) - col("n_tokens").cast("double") / col("padded"), 6))
}
