package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators that sit between filtering and packing in a
  * training-data pipeline: eval-set decontamination, repetition profiling
  * (Gopher-style rules), and weighted source mixing to a token budget.
  *
  * All three are declarative — shuffles only where a distributed engine
  * genuinely needs one (the n-gram join, the per-doc aggregate, the
  * per-group prefix sum) and codegen'd Column arithmetic everywhere else.
  */
object Curation {

  /** Eval-set decontamination: training documents that share at least one
    * word n-gram with any held-out (eval) document, with the count of
    * distinct shared n-grams — the contamination report a lab produces
    * before every pretraining run.
    *
    * Shape at scale: the eval side is benchmarks — thousands of documents
    * against billions — so its distinct n-gram set is broadcast and the
    * probe is a map-side hash join on the corpus scan; the corpus never
    * shuffles to discover candidates, only the per-doc count aggregates
    * (and that flows through a partial/final HashAggregate pair keyed on
    * doc_id). `array_distinct` runs in-row BEFORE the explode, so a
    * document repeating one n-gram 1000× expands to one probe row.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column): DataFrame = {
    val tri = docs.select(col(idCol).as("doc_id"), isEval.as("is_eval"),
      explode(array_distinct(TextOps.wordTrigrams(col(textCol)))).as("g"))
    val evalGrams = tri.filter(col("is_eval")).select("g").distinct()
    tri.filter(!col("is_eval"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      // per-doc grams are already distinct (array_distinct pre-explode),
      // so a plain count is a distinct count — no count(DISTINCT) expand
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** Per-document repetition profile (the Gopher repetition rules, exact):
    * token count, distinct-token ratio, most-frequent-token share, and
    * most-frequent-bigram share. High top-shares flag boilerplate and
    * degenerate generations; ratios are exact int/int divisions so they
    * reproduce bit-identically in any engine.
    *
    * One explode + one (doc_id, token) aggregate + one doc_id aggregate —
    * the canonical two-level combine; both aggregates are partial/final
    * pairs, so the shuffle carries counts, not tokens.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.spaceTokens(col(textCol))).as("w"))
    val wordTop = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
        max("c").as("top_c"))
    val bigrams = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.wordBigrams(col(textCol))).as("b"))
    val bigramTop = bigrams.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bc"), sum("c").as("n_bigrams"))
    wordTop.join(bigramTop, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
        (col("top_c").cast("double") / col("n_words")).as("top_word_share"),
        // single-token docs have no bigrams → null share (kept null: a
        // 0.0 would read as "no repetition" which one token can't attest)
        (col("top_bc").cast("double") / col("n_bigrams")).as("top_bigram_share"))
  }

  /** Weighted source mixing: take documents per group (language, source,
    * domain…) in deterministic id order until that group's share of the
    * token budget is exhausted — `floor(budget · weight)` tokens per
    * group, a document kept only if it fits entirely (the cap is never
    * exceeded). Returns the kept documents with their group budget.
    *
    * This is the mixture step that turns "40% en / 15% each else" into a
    * concrete document list. Deterministic by construction (prefix sums
    * over a unique id order), so the same mix reproduces across runs and
    * engines — a requirement for training reproducibility.
    *
    * One window (prefix sum per group) over one clustered shuffle; the
    * weights table is a handful of rows and broadcasts onto the scan.
    */
  def mixToBudget(docs: DataFrame, groupCol: String, idCol: String,
      tokens: Column, weights: Map[String, Double], budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("grp", "weight"))
    val w = Window.partitionBy("grp").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(groupCol).as("grp"), col(idCol).as("doc_id"),
        tokens.cast("bigint").as("toks"))
      .join(wdf, "grp") // inner: groups without a weight are dropped
      .withColumn("grp_budget", floor(col("weight") * budget))
      .withColumn("end_off", sum("toks").over(w))
      .filter(col("end_off") <= col("grp_budget"))
      .select("grp", "doc_id", "toks", "grp_budget")
  }

  /** Strided curriculum interleave: a deterministic global training order
    * that cycles the groups round-robin — document k of group g lands at
    * `position = (k-1) · n_groups + index(g)`. The position is pure
    * arithmetic on a per-group rank, so there is NO global sort or
    * single-partition window anywhere: one clustered shuffle per group for
    * the rank, then map-side math. (The naive formulation — a global
    * `row_number() over (order by rn, grp)` — funnels the corpus through
    * one partition; this shape is how the same order scales.)
    */
  def strideInterleave(docs: DataFrame, groupCol: String, idCol: String,
      groupIndex: Map[String, Int]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = groupIndex.size
    val gi = broadcast(groupIndex.toSeq.toDF("grp", "gi"))
    val w = Window.partitionBy("grp").orderBy("doc_id")
    docs.select(col(groupCol).as("grp"), col(idCol).as("doc_id"))
      .join(gi, "grp") // inner: unindexed groups are excluded from the epoch
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("position", (col("rn") - 1) * n + col("gi"))
      .select("doc_id", "grp", "rn", "position")
  }

  /** Post-mix audit: per-group kept-document and token totals vs budget. */
  def mixStats(mixed: DataFrame): DataFrame =
    mixed.groupBy("grp", "grp_budget")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .select("grp", "grp_budget", "n_docs", "n_tokens")
}
