package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as iterative DataFrame jobs — the
  * outer loop around the single merge step the `x_bpe_pairs` query audits.
  *
  * Scale shape (the reason BPE trains at 100 TB at all): the corpus
  * collapses to its VOCABULARY first — ONE word-count aggregate; Zipf makes
  * the vocab millions of rows where the corpus is trillions of tokens — and
  * every merge round after that touches only the vocab frame. Per round the
  * work is one vocab-sized pair explode + aggregate, a top-1
  * `TakeOrderedAndProject`, and a map-side `replace` against the 1-row
  * broadcast winner. The corpus is never re-read; the driver never sees
  * anything but the per-round merge row.
  *
  * Representation: a word's current symbol segmentation is a wrapped string
  * `"(s1)(s2)…(sk)"` (symbols are `[a-z]+`, so parens cannot collide).
  * Merging the winning pair `"(x)(y)"` is then a LITERAL left-to-right
  * `replace` — exactly BPE's greedy non-overlapping merge order — and the
  * identical expression runs in DuckDB, so the oracle replays the full
  * trajectory (adjacent-position pair counts, (freq DESC, pair ASC)
  * tie-break, merge application) bit-for-bit.
  */
object Bpe {

  /** Wrapped segmentation of a raw word: `"ab"` → `"(a)(b)"`. Both engines
    * regex-replace every char with its wrapped form. */
  private def wrapChars(w: org.apache.spark.sql.Column) =
    regexp_replace(w, "(.)", "($1)")

  /** Train `rounds` BPE merges over the space-tokenized corpus.
    *
    * Returns one row per merge round: `(round, token, freq)` where `token`
    * is the newly created symbol (the concatenation of the merged pair) and
    * `freq` its weighted adjacent-pair count at selection time. Words
    * shorter than 2 chars carry no pairs and are dropped up front (mirrors
    * `x_bpe_pairs`).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    // corpus → vocabulary: the ONLY corpus-sized job in the whole training.
    // Pinned once (lazy checkpoint) — every merge round replays from the
    // materialized vocab blocks, never from the corpus.
    val vocab0 = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(wrapChars(col("w")).as("sym"), col("c"))
      .localCheckpoint(false)

    // Each round's winner is ONE row, and [[encodeCounts]] (and every
    // caller) consumes the merge list as a driver-side model artifact
    // anyway — so collect it per round and apply the merge as a LITERAL
    // replace. That removes the per-round eager checkpoint + broadcast
    // round-trips of the old loop (measured: 3 jobs + 3 broadcast
    // exchanges for 3 rounds → 3 one-row collects; x_token_fertility
    // build 3.3 s → ~1.5 s at sf0.1) while keeping per-round driver
    // traffic at one bounded row — the same model-artifact posture as
    // Classifier's collected coefficients. Merge application chains as
    // literal replaces on the pinned vocab, exactly BPE's left-to-right
    // non-overlapping greedy order (and the identical expression shape
    // the DuckDB oracle replays).
    val spark = docs.sparkSession
    var symExpr = "sym"
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      // vocab-sized: explode adjacent positions of the current segmentation
      val pairFreq = vocab0
        .select(split(expr(s"substring($symExpr, 2, length($symExpr) - 2)"), "\\)\\(").as("syms"),
          col("c"))
        // fully-merged words carry no pairs; and Spark's sequence(1, 0)
        // would DESCEND ([1, 0]) instead of being empty
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> concat('(', syms[i - 1], ')(', syms[i], ')'))")).as("pair"),
          col("c"))
        .groupBy("pair").agg(sum(col("c")).as("freq"))
      // top-1 winner: bounded-heap TakeOrderedAndProject, never a global
      // sort; one 1-row collect per round. No pairs anywhere → training is
      // exhausted: this and every later round produce no merge row (the
      // pre-round-14 loop's empty crossJoin had the same observable output)
      val ws = pairFreq.orderBy(col("freq").desc, col("pair")).limit(1)
        .select(col("pair"), col("freq")).collect()
      if (ws.isEmpty) exhausted = true
      else {
        val pair = ws(0).getString(0)
        // symbols are [a-z]+ inside parens, so the literal cannot contain a
        // quote — the same inlining contract encodeCounts already relies on
        merges += ((r, pair, pair.replace(")(", "").stripPrefix("(").stripSuffix(")"),
          ws(0).getLong(1)))
        symExpr = s"replace($symExpr, '$pair', '${pair.replace(")(", "")}')"
      }
    }
    import spark.implicits._
    merges.result().toDF("round", "pair", "token", "freq")
  }

  /** ENCODE under a trained merge list: token count per document.
    *
    * `pairs` is the ordered merge list from [[train]] (`pair` column —
    * wrapped `"(x)(y)"` forms; the merged replacement is derived). The
    * merge list is a bounded model artifact (one row per merge round), so
    * baking it into the expression as literals — the same posture as
    * Classifier's collected model — makes encoding a SINGLE scan-local
    * projection: wrap each word's chars, apply the merges in training
    * order as literal replaces, count symbols, sum over the document.
    * Zero shuffle, zero joins; at 100 TB corpus tokenization is exactly
    * this map-only pass. */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      pairs: Seq[String]): DataFrame = {
    // char-class regex [)][(] avoids backslash-escape dialect traps
    val wrapped = "concat('(', array_join(split(w, ''), ')('), ')')"
    val enc = pairs.foldLeft(wrapped) { (e, p) =>
      val merged = p.replace(")(", "")
      s"replace($e, '$p', '$merged')"
    }
    docs.select(col(idCol),
      expr(s"aggregate(filter(split($textCol, ' '), w -> length(w) > 0), " +
        s"0, (acc, w) -> acc + size(split($enc, '[)][(]')))")
        .cast("int").as("n_tokens"))
  }
}
