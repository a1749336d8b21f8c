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
    *
    * `width` picks the n-gram granularity: 3 (default) is the repo's
    * canary-compatible trigram universe; 13 is the published
    * decontamination standard (GPT-3, Brown et al. 2020 appendix C —
    * a 13-token verbatim run is long enough that sharing one is
    * evidence of copying, not vocabulary). Wider grams also shrink df
    * toward 1 (the coarse-shingle effect), so the eval gram set stays
    * broadcastable even on saturated-vocabulary corpora.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, width: Int = 3): DataFrame = {
    // native fused shingle+distinct (round 15; any width — the old
    // width-3 special case only preserved a now-retired HOF plan shape)
    val grams = graft.functions.Shingles.wordNgrams(col(textCol), width,
      distinct = true)
    val tri = docs.select(col(idCol).as("doc_id"), isEval.as("is_eval"),
      explode(grams).as("g"))
    val evalGrams = tri.filter(col("is_eval")).select("g").distinct()
    tri.filter(!col("is_eval"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      // per-doc grams are already distinct (array_distinct pre-explode),
      // so a plain count is a distinct count — no count(DISTINCT) expand
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** FUZZY eval-set decontamination: training documents with a verified
    * MinHash near-duplicate (exact trigram Jaccard ≥ threshold) in the
    * held-out slice — the near-match complement of [[contamination]]'s
    * exact n-gram report. Exact overlap catches verbatim benchmark leaks;
    * this catches the paraphrased/re-wrapped copies (whitespace edits,
    * shuffled boilerplate) that weaken an eval without sharing enough
    * literal n-grams to trip the exact gate. Returns one row per
    * contaminated training doc: match count and max Jaccard.
    *
    * Scale shape — deliberately DIFFERENT from [[Dedup.dedupAgainst]]'s
    * corpus-vs-batch posture: the eval side is benchmarks (thousands of
    * docs against billions), so its band table AND its texts broadcast;
    * the corpus discovers candidates map-side on its own scan, and only
    * the candidate train docs (a sliver when banding is selective) carry
    * their trigram sets into the exact verify. The corpus never shuffles
    * to find candidates — the one shuffle is the per-doc match aggregate.
    */
  def fuzzyContamination(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, threshold: Double): DataFrame = {
    def bandsOf(df: DataFrame, as: String) = {
      val sigs = Dedup.pin(df.select(col(idCol).as(as),
          graft.functions.MinHash16.minHash16(col(textCol)).as("mh"))
        .filter(col("mh").isNotNull))
      (0 until Dedup.NumBands).map { b =>
        val cols = (0 until Dedup.RowsPerBand)
          .map(r => element_at(col("mh"), b * Dedup.RowsPerBand + r + 1))
        sigs.select(col(as), lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
      }.reduce(_ union _)
    }
    val ev = docs.filter(isEval)
    val tr = docs.filter(!isEval)
    val cand = bandsOf(tr, "doc_id")
      .join(broadcast(bandsOf(ev, "eid")), Seq("band", "sig"))
      .select("doc_id", "eid").distinct()
    val evTxt = ev.select(col(idCol).as("eid"), col(textCol).as("etxt"))
    val trTxt = tr.select(col(idCol).as("doc_id"), col(textCol).as("ttxt"))
    cand.join(broadcast(evTxt), "eid").join(trTxt, "doc_id")
      .select(col("doc_id"), col("eid"),
        graft.functions.Shingles.wordTrigramHashes(col("ttxt"),
          distinct = true).as("s1"),
        graft.functions.Shingles.wordTrigramHashes(col("etxt"),
          distinct = true).as("s2"))
      .select(col("doc_id"), col("eid"),
        size(array_intersect(col("s1"), col("s2"))).as("i"),
        size(col("s1")).as("n1"), size(col("s2")).as("n2"))
      .select(col("doc_id"), col("eid"),
        round(col("i") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"), max("jaccard").as("max_jaccard"))
  }

  /** DSIR bucket log-likelihood ratios ("Data Selection for Language Models
    * via Importance Resampling", Xie et al. 2023, arXiv:2302.03169): fit two
    * add-one-smoothed multinomials over the hashed n-gram buckets
    * ([[TextOps.ngramBuckets]]) — p̂ from the TARGET slice (the domain you
    * want more of), q̂ from the RAW slice — and return one row holding the
    * dim-length array `lrn[j] = round((ln p̂[j] − ln q̂[j])·10⁹)` in integer
    * NANO-NATS: quantizing here makes the downstream per-doc sums exact
    * BIGINT arithmetic, so they cannot drift with float summation order
    * across partitions or engines (a raw-double fold flipped a 6th
    * decimal on 1 of 475 docs the first time this ran).
    *
    * Scale shape — the deliberate CONTRAST with [[TextOps.lmScore]]: the
    * model here is dim-sized BY CONSTRUCTION (the paper's hashing trick:
    * 10⁴–10⁵ buckets regardless of corpus size), so it collapses to a
    * 1-row broadcast array and per-doc scoring never joins. One corpus
    * explode feeds a (bucket, target?) hash aggregate with map-side
    * combine; the bucket spine (`range(dim)`) fills never-hit buckets so
    * smoothing sees all dim cells. The dim-row count table is pinned —
    * totals and per-bucket ratios both consume it, and unpinned each would
    * replay the corpus explode. */
  def dsirLogRatio(docs: DataFrame, textCol: String, isTarget: Column,
      dim: Int): DataFrame = {
    // r15: native fused bucket expression (one codegen'd loop per doc)
    // replaces the filter+transform+zip_with HOF chain — bit-identity
    // pinned in DsirExpressionsSpec against TextOps.ngramBuckets
    val feats = docs.select(isTarget.as("is_t"),
      explode(graft.functions.Dsir.ngramBuckets(col(textCol), dim)).as("j"))
    val cnts = Dedup.pin(feats.groupBy("j").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("is_t"), 0L).otherwise(1L)).as("rc")))
    val spine = docs.sparkSession.range(dim).select(col("id").as("j"))
    val filled = spine.join(cnts, Seq("j"), "left").na.fill(0L, Seq("tc", "rc"))
    val tot = cnts.agg(sum("tc").as("tn"), sum("rc").as("rn"))
    filled.crossJoin(broadcast(tot))
      .select(col("j"),
        round((log((col("tc") + 1).cast("double") / (col("tn") + dim))
          - log((col("rc") + 1).cast("double") / (col("rn") + dim))) * 1e9)
          .cast("bigint").as("lrn"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("lrn")))),
        s => s.getField("lrn")).as("lrn"))
  }

  /** Per-document DSIR importance weight over the RAW slice:
    * `logw = (Σ occurrences · lrn[bucket]) / 10⁹` rounded to 6 — the log
    * importance ratio of the doc under the two bucket models. The sum is
    * exact BIGINT ([[dsirLogRatio]]) and the 6-decimal rounding happens in
    * INTEGER space too (nano→micro via `round(sum/1000.0)`: every `n.5` is
    * an exactly-representable double, so the HALF_UP tie-break is
    * bit-identical across engines — `round(x, 6)` on the raw double is
    * not: a nano-sum ending in 500 is a decimal tie that BigDecimal-exact
    * Spark and float-multiply DuckDB resolve differently, hit at sf0.1).
    * Scoring is a map-side fold
    * of the in-row bucket list over the broadcast `lrn` array: the corpus
    * is read once and never shuffled; a doc with no tokens scores 0 (an
    * empty product of ratios). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int): DataFrame =
    // r15: the per-doc scoring fold (interpreted aggregate HOF +
    // per-element element_at) is now the native DsirDot — one fused
    // loop computing buckets and Σ lrn[bucket] together; the BIGINT sum
    // is order-free so the result is bit-identical (DsirExpressionsSpec)
    docs.filter(!isTarget).select(col(idCol), col(textCol))
      .crossJoin(broadcast(dsirLogRatio(docs, textCol, isTarget, dim)))
      .select(col(idCol),
        (round(graft.functions.Dsir.dsirDot(col(textCol), col("lrn"), dim)
          .cast("double") / 1000.0).cast("bigint") / lit(1000000.0d))
          .as("logw"))

  /** DSIR selection: sample k raw documents WITHOUT replacement with
    * probability ∝ exp(logw) via the Gumbel top-k trick (perturb each
    * weight with Gumbel noise, take the k largest) — the paper's
    * resampling step, made replayable by deriving the noise from
    * [[Sampling.hashBucket]] instead of rand():
    * `u = (hash(id)+0.5)/2³²`, `g = −ln(−ln u)`. Deterministic, stable
    * under corpus append (a doc's score never changes), and the top-k is
    * `TakeOrderedAndProject` — partial per-partition heaps, never a
    * global sort. */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dim: Int, k: Int): DataFrame = {
    val u = (Sampling.hashBucket(col(idCol)).cast("double") + 0.5d) / 4294967296.0d
    dsirWeights(docs, idCol, textCol, isTarget, dim)
      .select(col(idCol), col("logw"),
        round(col("logw") - log(-log(u)), 6).as("score"))
      .orderBy(desc("score"), col(idCol)).limit(k)
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

  /** TOKEN-BUDGET selection: keep the highest-quality documents whose
    * cumulative token count fits a global budget — the greedy prefix of
    * the corpus under the total order (score DESC, id ASC). This is the
    * "select the best N-billion tokens" step that follows scoring in a
    * curation pipeline (quality-classifier selection as in GPT-3/CCNet
    * pipelines; the prefix form of top-k under a token — not document —
    * budget).
    *
    * The NAIVE plan is a global window cumsum over (score DESC, id) —
    * a single-partition sort of the corpus, the exact funnel a 100 TB run
    * cannot contain. This implementation is the two-pass histogram form
    * of the same EXACT semantics:
    *
    *  1. quantize the score into `floor(score · bins)` — a BOUNDED key
    *     space (≤ bins+1 cells regardless of corpus size) that is
    *     MONOTONE in score, so bin order refines to score order and no
    *     tie in exact score can cross a bin edge. One map-side-combined
    *     aggregate → per-bin token totals (a KB frame).
    *  2. prefix-sum the KB histogram (window over ≤ bins rows — the only
    *     unpartitioned window, and it never sees corpus rows), classify
    *     each bin: fully-kept (everything above it plus itself fits),
    *     fully-dropped, or THE boundary bin (at most one straddles the
    *     budget). Broadcast the ≤ bins-row verdict table.
    *  3. fully-kept bins pass map-side on a fresh scan — no sort, no
    *     shuffle. Only the boundary bin's documents (≈ corpus/bins worst
    *     case) flow through an exact per-bin window ordered by
    *     (score DESC, id) to take the prefix that fills the residual.
    *
    * The kept SET equals the naive global prefix exactly: bins partition
    * the score axis, so every document of a higher bin precedes every
    * document of a lower bin in (score DESC, id) order, and within the
    * boundary bin the window replays the global order verbatim. If the
    * boundary bin itself is too large to sort in one task, re-run the
    * histogram inside it with finer bins — the recursion divides the
    * residual by `bins` each level (documented in SCALE.md; one level is
    * enough at any realistic skew: 100 TB / 1000 bins = 100 GB boundary).
    *
    * Null scores are excluded (a doc that cannot be ranked cannot be
    * selected). Corpus reads: one for the histogram (the duplicated
    * broadcast-verdict subtree collapses to a ReusedExchange under AQE)
    * plus one per union branch — three cheap pruned columnar scans, no
    * shuffle of corpus rows anywhere; cheaper at scale than persisting
    * the scored corpus to save re-reads.
    */
  def budgetSelect(docs: DataFrame, idCol: String, scoreCol: String,
      tokCol: String, budget: Long, bins: Int = 1000): DataFrame = {
    val d = docs
      .select(col(idCol).as("doc_id"), col(scoreCol).as("score"),
        col(tokCol).cast("bigint").as("toks"))
      .filter(col("score").isNotNull)
      .withColumn("__bin", floor(col("score") * bins).cast("bigint"))
    val hist = d.groupBy("__bin").agg(sum("toks").as("__bt"))
    // KB window: one row per occupied bin, never corpus rows
    val before = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = hist
      .withColumn("__before", coalesce(sum("__bt").over(before), lit(0L)))
      .select(col("__bin").as("__b"), col("__before"),
        (col("__before") + col("__bt") <= budget).as("__all"),
        (col("__before") < budget && col("__before") + col("__bt") > budget)
          .as("__bnd"))
    val joined = d.join(broadcast(verdict), col("__bin") === col("__b"))
    val keepAll = joined.filter(col("__all"))
      .select("doc_id", "score", "toks")
    // exact prefix inside the one straddling bin — window partitioned by
    // the bin key, so it is NOT a global sort even here
    val inBin = Window.partitionBy("__bin")
      .orderBy(desc("score"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("__bnd"))
      .withColumn("__cum", col("__before") + sum("toks").over(inBin))
      .filter(col("__cum") <= budget)
      .select("doc_id", "score", "toks")
    keepAll.unionByName(boundary)
  }

  /** Post-mix audit: per-group kept-document and token totals vs budget. */
  def mixStats(mixed: DataFrame): DataFrame =
    mixed.groupBy("grp", "grp_budget")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .select("grp", "grp_budget", "n_docs", "n_tokens")
}
