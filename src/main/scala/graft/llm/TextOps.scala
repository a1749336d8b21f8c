package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * shingling, tokenization, language-ID, quality scoring, fingerprinting.
  *
  * Everything here is a codegen-friendly Column expression (no UDFs, no
  * driver-side loops) built from `org.apache.spark.sql.functions` +
  * higher-order array functions, so it whole-stage-compiles and scales
  * linearly with the scan. All hashes use exact integer arithmetic so
  * results are reproducible across engines (the DuckDB oracles compute the
  * same numbers).
  */
object TextOps {

  /** Character 3-gram shingles as exact 24-bit integers:
    * ascii(c1)·2^16 + ascii(c2)·2^8 + ascii(c3). */
  def charShingles(text: Column): Column = {
    val t = text
    val body = transform(sequence(lit(1), length(t) - 2),
      i => (ascii(t.substr(i, lit(1))) * 65536
        + ascii(t.substr(i + 1, lit(1))) * 256
        + ascii(t.substr(i + 2, lit(1)))).cast("bigint"))
    when(length(t) >= 3, body).otherwise(array().cast("array<bigint>"))
  }

  /** Whitespace tokens (single-space split — mirrors the oracle's
    * string_split; empty tokens kept for positional determinism). */
  def spaceTokens(text: Column): Column = split(text, " ", -1)

  /** Word 3-gram shingles as space-joined strings — the native fused
    * expression (round 15; one codegen'd loop per document). The retired
    * HOF formulation ([[wordTrigramsHof]]) is kept as the bit-identity
    * reference: higher-order lambdas don't codegen, so it paid an
    * interpreted pass per zip level plus intermediate arrays. */
  def wordTrigrams(text: Column): Column =
    graft.functions.Shingles.wordNgrams(text, 3)

  /** Retired zip_with formulation of [[wordTrigrams]] — bit-identity
    * reference for ShingleExpressionsSpec only. (Shifted slices + zip_with
    * rather than element_at inside a lambda: `element_at(split(..), i)`
    * would re-split the text per element — O(tokens²) per row.) */
  private[graft] def wordTrigramsHof(text: Column): Column = {
    val toks = spaceTokens(text)
    val n = greatest(size(toks) - 2, lit(0))
    val t1 = slice(toks, lit(1), n)
    val t2 = slice(toks, lit(2), n)
    val t3 = slice(toks, lit(3), n)
    zip_with(zip_with(t1, t2, (a, b) => concat(a, lit(" "), b)),
      t3, (ab, c) => concat(ab, lit(" "), c))
  }

  /** Exact 26-bit word hash: first three chars (underscore-padded) packed +
    * length·2^24 — identical to the oracle's arithmetic. */
  def wordHash(tok: Column): Column = {
    val padded = concat(tok, lit("___"))
    (ascii(padded.substr(1, 1)) * 65536 + ascii(padded.substr(2, 1)) * 256
      + ascii(padded.substr(3, 1))).cast("bigint") + length(tok).cast("bigint") * 16777216L
  }

  /** Position-weighted rolling document fingerprint:
    * Σ position·wordHash(token) — order-sensitive (a permuted document gets a
    * different fingerprint), exact int64 (no overflow below ~2^17 tokens). */
  def fingerprint(text: Column): Column = {
    // transform's (element, 0-based index) lambda — the split feeds transform
    // ONCE; element_at(split(..), i) in an aggregate lambda would re-split
    // per element (O(tokens²) per row, measured 19s → sub-second on 500 docs).
    val weighted = transform(spaceTokens(text),
      (t, i) => (i.cast("bigint") + 1L) * wordHash(t))
    aggregate(weighted, lit(0L), (acc, v) => acc + v)
  }

  /** Exact int64 hash of a word trigram from its three word hashes —
    * Horner-combined mod 2147483647 (Broder shingling; reproducible in SQL). */
  def wordTrigramHashes(text: Column): Column =
    graft.functions.Shingles.wordTrigramHashes(text)

  /** Retired zip_with formulation of [[wordTrigramHashes]] — bit-identity
    * reference for ShingleExpressionsSpec only. */
  private[graft] def wordTrigramHashesHof(text: Column): Column = {
    val p = 2147483647L
    val toks = spaceTokens(text)
    val n = greatest(size(toks) - 2, lit(0))
    val t1 = slice(toks, lit(1), n)
    val t2 = slice(toks, lit(2), n)
    val t3 = slice(toks, lit(3), n)
    val h12 = zip_with(t1, t2, (a, b) => (wordHash(a) * 1000003L + wordHash(b)) % p)
    zip_with(h12, t3, (ab, c) => (ab * 1000033L + wordHash(c)) % p)
  }

  /** Word n-grams as space-joined strings — [[wordTrigrams]] generalized
    * to arbitrary width. COARSER shingles (n=5) are the df-saturation
    * mitigation the round-10 sf1 sweep called for: on a vocabulary of V
    * words the n-gram universe is ~V^n, so widening n restores Heaps-law
    * behavior (df ≈ 1) on corpora whose trigram universe has saturated —
    * at the price of less tolerance to small edits (one changed word
    * breaks n shingles instead of 3). Width 3 reproduces
    * [[wordTrigrams]] exactly. */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.Shingles.wordNgrams(text, n)

  /** Retired slice/zip_with formulation of [[wordNgrams]] — bit-identity
    * reference for ShingleExpressionsSpec only. */
  private[graft] def wordNgramsHof(text: Column, n: Int): Column = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    val toks = spaceTokens(text)
    val cnt = greatest(size(toks) - (n - 1), lit(0))
    (0 until n).map(k => slice(toks, lit(k + 1), cnt))
      .reduce((acc, s) => zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
  }

  /** Exact int64 hashes of word n-grams — [[wordTrigramHashes]]'s Horner
    * chain generalized to arbitrary width with a UNIFORM 1000003
    * multiplier (n = 3 therefore does NOT reproduce the trigram formula,
    * whose second step uses 1000033 — the two universes are deliberately
    * distinct). The MinHash input for coarse-shingle LSH: on a saturated
    * vocabulary the trigram-hash universe tops out at V³ and signature
    * minima concentrate; width-5 hashes restore the diversity the bands
    * need. */
  def wordNgramHashes(text: Column, n: Int): Column =
    graft.functions.Shingles.wordNgramHashes(text, n)

  /** Retired slice/zip_with formulation of [[wordNgramHashes]] —
    * bit-identity reference for ShingleExpressionsSpec only. */
  private[graft] def wordNgramHashesHof(text: Column, n: Int): Column = {
    require(n >= 2, s"shingle width must be >= 2, got $n")
    val p = 2147483647L
    val toks = spaceTokens(text)
    val cnt = greatest(size(toks) - (n - 1), lit(0))
    val slices = (0 until n).map(k => slice(toks, lit(k + 1), cnt))
    val h0 = transform(slices.head, t => wordHash(t))
    slices.tail.foldLeft(h0)((acc, sl) =>
      zip_with(acc, sl, (a, t) => (a * 1000003L + wordHash(t)) % p))
  }

  /** Word bigrams as space-joined strings — same shifted-slice shape as
    * [[wordTrigrams]] (lambdas never re-evaluate the split). */
  def wordBigrams(text: Column): Column =
    graft.functions.Shingles.wordNgrams(text, 2)

  /** Retired zip_with formulation of [[wordBigrams]] — bit-identity
    * reference for ShingleExpressionsSpec only. */
  private[graft] def wordBigramsHof(text: Column): Column = {
    val toks = spaceTokens(text)
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Hashing-trick token-count features: element j counts the tokens with
    * `wordHash(t) % dim == j` — the fixed-width bag-of-words a downstream
    * linear scorer consumes, with no vocabulary to build or broadcast.
    * In-row transform+filter over the split (O(dim·tokens) per row, zero
    * shuffle, whole-stage codegen); callers `posexplode` to long form. */
  def featureHash(text: Column, dim: Int): Column = {
    // ONE pass: hash each token into its bucket, then fold the bucket ids
    // into a dim-length count array. A per-bucket filter would re-evaluate
    // the split+hash chain once PER BUCKET (the element_at(split) trap
    // above — HOF lambdas don't share subexpressions); the aggregate's
    // init argument is evaluated once.
    val buckets = transform(spaceTokens(text), t => wordHash(t) % dim)
    aggregate(buckets,
      array_repeat(lit(0L), dim),
      (acc, h) => transform(acc, (v, i) => when(i.cast("bigint") === h, v + 1L).otherwise(v)))
  }

  /** Gopher-style composite quality GATE with audit reasons ("Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * Rae et al. 2021, Table A1's document-filter family): token-count
    * range, most-frequent-token share (repetition), mean word length
    * band, and stopword presence — each failed rule contributes its name
    * to a `reasons` string, `keep = (reasons = '')`. Emitting the
    * reasons, not just the verdict, is the part a production pipeline
    * needs: filter-rate dashboards are per-rule, and a rule misfiring on
    * a domain shows up as its reason spiking.
    *
    * All four signals are IN-ROW (one pass over the token array, the
    * top-share via a nested HOF over the distinct tokens — O(n·distinct)
    * per document, zero shuffle, no explode): the corpus is scanned once
    * and nothing moves. Rule comparisons run on exact int/int divisions
    * (IEEE-identical across engines); the reported columns round to 6. */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 25, maxTokens: Int = 10000,
      maxTopShare: Double = 0.12): DataFrame = {
    val ft = spaceTokens(col(textCol))
    val n = size(ft)
    val sumLen = aggregate(transform(ft, t => length(t).cast("bigint")),
      lit(0L), (a, b) => a + b)
    val meanLen = sumLen.cast("double") / n
    val topC = array_max(transform(array_distinct(ft),
      w => size(filter(ft, x => x === w))))
    val topShare = topC.cast("double") / n
    val theCount = occurrences(col(textCol), " the ")
    docs.select(col(idCol), n.as("n_tokens"),
      round(topShare, 6).as("top_share"),
      round(meanLen, 6).as("mean_word_len"),
      concat_ws(",",
        when(n < minTokens || n > maxTokens, lit("tokens")),
        when(topShare > maxTopShare, lit("repetition")),
        when(meanLen < 3.0 || meanLen > 10.0, lit("word_len")),
        when(theCount < 1, lit("stopwords"))).as("reasons"))
      .withColumn("keep", col("reasons") === "")
  }

  /** Hashed n-gram bucket ids (unigrams + bigrams) in [0, dim) — the DSIR
    * feature space ("Data Selection for Language Models via Importance
    * Resampling", Xie et al. 2023, arXiv:2302.03169 §3: hashed n-grams into
    * a fixed bucket count). One occurrence per token/bigram instance (NOT
    * distinct), so bucket counts are the bag-of-ngrams the two multinomial
    * models are fit on. In-row, zero shuffle, same shifted-slice bigram
    * shape as [[wordBigrams]]; empty tokens filtered so the unigram and
    * bigram universes agree with [[lmScore]]'s. */
  def ngramBuckets(text: Column, dim: Int): Column = {
    val ft = filter(spaceTokens(text), t => t =!= "")
    val n = greatest(size(ft) - 1, lit(0))
    val uni = transform(ft, t => wordHash(t) % dim)
    val bi = zip_with(slice(ft, lit(1), n), slice(ft, lit(2), n),
      (a, b) => ((wordHash(a) * 1000003L + wordHash(b)) % 2147483647L) % dim)
    concat(uni, bi)
  }

  /** Occurrence count of `kw` in `text` via length arithmetic — exact. */
  def occurrences(text: Column, kw: String): Column =
    ((length(text) - length(replace(text, lit(kw), lit("")))) / kw.length).cast("int")

  /** Marker keywords per language for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "es" -> Seq(" el ", " los "),
    "de" -> Seq(" der ", " und "),
    "fr" -> Seq(" le ", " les "))

  /** Per-language marker score. */
  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang).map(occurrences(text, _)).reduce(_ + _)

  /** Argmax language with first-listed priority on ties; 'unknown' if no
    * marker hit at all. */
  def predictedLang(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(best === 0, "unknown")) {
      case (acc, (l, s)) => acc.when(s === best, l)
    }
    chain.otherwise("unknown")
  }

  /** Non-empty token count. */
  def tokenCount(text: Column): Column =
    size(filter(spaceTokens(text), t => t =!= ""))

  /** BPE-ish regex token count: letter runs, digit runs, single punctuation. */
  val TokenRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(TokenRegex), lit(0)))

  /** Simple quality score: stopword density + length prior, rounded for
    * cross-engine determinism. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = occurrences(text, " the ") / nTok
    round(stopRatio * 0.5 + least(length(text).cast("double") / 1000, lit(1.0)) * 0.5, 6)
  }

  /** Quality gate WITH observability: filter docs below `minQuality` and
    * report (docs_in, docs_kept, mean_quality) through an `Observation` —
    * metrics accumulated ON THE SAME PASS as the filter, not a second
    * scan. This is the production posture for curation pipelines: every
    * gate in a 100 TB run must account for what it dropped (a silent 40%
    * language-filter loss is a training-data incident), and a separate
    * `count()` per stage would double-scan the corpus. The caller reads
    * the Observation after the FIRST action on the returned frame. */
  def qualityGate(docs: DataFrame, textCol: String, minQuality: Double):
      (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val scored = docs.withColumn("__q", qualityScore(col(textCol)))
      .observe(obs,
        count(lit(1)).as("docs_in"),
        sum(when(col("__q") >= minQuality, 1L).otherwise(0L)).as("docs_kept"),
        round(avg(col("__q")), 6).as("mean_quality"))
    (scored.filter(col("__q") >= minQuality).drop("__q"), obs)
  }

  /** SEGMENT-level dedup across documents (the paragraph-dedup pass of a
    * training-data pipeline, on token windows since this corpus has no
    * paragraph breaks): split every doc into non-overlapping `segTokens`
    * windows, keep each distinct segment text ONLY at its first global
    * occurrence (min (doc_id, segment index) — deterministic), and
    * reassemble documents from their surviving segments. This is the
    * sub-document complement to whole-doc dedup: near-dup docs share most
    * segments but survive whole-doc hashing; repeated boilerplate
    * (headers, licenses, navigation) repeats across UNRELATED docs and
    * only a segment-granular pass removes it.
    *
    * Scale shape: one shuffle on the segment hash (16-byte md5, never the
    * segment text) for the argmin, one id shuffle to reassemble. Output:
    * (id, n_segments, n_kept, text) — drop-accounting included, docs whose
    * every segment was boilerplate survive with empty text for the caller
    * to gate on. */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    val segs = chunk(docs, idCol, textCol, segTokens, segTokens)
      .withColumn("seg_hash", md5(col("chunk_text").cast("binary")))
    // first global owner per distinct segment: min (id, chunk_idx)
    val owners = segs.groupBy(col("seg_hash"))
      .agg(min(struct(col("id"), col("chunk_idx"))).as("owner"))
    segs.join(owners, "seg_hash")
      .withColumn("keep",
        col("owner.id") === col("id") && col("owner.chunk_idx") === col("chunk_idx"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips nulls → survivors only, then reassemble in order
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("chunk_idx"), col("chunk_text"))))),
          s => s("chunk_text"))).as("text"))
  }

  /** Overlapping context-window chunks: token windows of `chunkTokens`
    * starting every `stride` tokens (stride < chunk ⇒ overlap, the
    * standard training-data windowing). Declarative row amplification —
    * `explode(sequence)` over in-row slices, so it distributes and prunes
    * like any lateral view and memory is bounded by one document's
    * tokens. Output: (id, chunk_idx, n_tokens, chunk_text). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      "stride must be positive and no larger than the chunk")
    val toks = filter(spaceTokens(col(textCol)), t => t =!= "")
    docs.select(col(idCol).as("id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), col("toks"),
        explode(sequence(lit(0),
          floor((size(col("toks")) - 1) / stride).cast("int"))).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("chunk"))
      .select(col("id"), col("chunk_idx"),
        size(col("chunk")).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Redact digit runs to a placeholder — the minimal form of the PII/
    * number-normalization scrub every corpus pipeline runs. Pure
    * codegen'd `regexp_replace`; count via `regexp_count` for audit. */
  val NumberRegex = "[0-9]+"
  def redactNumbers(text: Column): Column =
    regexp_replace(text, lit(NumberRegex), lit("<NUM>"))
  def numberCount(text: Column): Column =
    regexp_count(text, lit(NumberRegex)).cast("int")

  /** PII patterns chosen to behave identically under Java regex and RE2
    * (the oracle engine): plain character classes, no lookaround. */
  val EmailRegex = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlRegex = "https?://[^ ]+"

  /** Structured-PII scrub for training corpora: emails → `<EMAIL>`,
    * URLs → `<URL>`, then remaining digit runs → `<NUM>`, in that order
    * (emails/URLs contain digits — scrubbing numbers first would tear
    * them mid-pattern and leak the rest). Pure codegen'd `regexp_replace`
    * chain, scan-local; the audit counts ride the same projection. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRegex), lit("<EMAIL>")),
        lit(UrlRegex), lit("<URL>")),
      lit(NumberRegex), lit("<NUM>"))
  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailRegex)).cast("int")
  def urlCount(text: Column): Column =
    regexp_count(text, lit(UrlRegex)).cast("int")

  /** HTML/boilerplate cleanup — the markup-strip stage of a web-crawl
    * curation pipeline (CCNet/RefinedWeb posture): drop `<script>`/`<style>`
    * elements WITH their payload (their body is code, not prose), strip all
    * remaining tags, decode the five XML entities, collapse whitespace runs,
    * trim. Pure codegen'd `regexp_replace` chain, scan-local, zero shuffle;
    * every pattern is lookaround-free so the identical regexes run in the
    * DuckDB oracle. `&amp;` decodes LAST so `&amp;lt;` yields the literal
    * `&lt;` (standard entity-decode order). */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      lit("<(script|style)[^>]*>[^<]*</(script|style)>"), lit(" "))
    val noTags = regexp_replace(noScript, lit("<[^>]+>"), lit(" "))
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, lit("[ \\t\\n\\r]+"), lit(" ")))
  }

  /** Corpus vocabulary: top-`k` tokens by total occurrence count (count
    * DESC, token ASC tiebreak) — the tokenizer-training precursor. One
    * explode + one map-side-combined count; the top-k is
    * `TakeOrderedAndProject` (bounded heap per partition, k rows to the
    * driver), so the exchange never carries the full vocabulary. */
  def vocab(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(filter(spaceTokens(col(textCol)), t => t =!= ""))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** TF-IDF top-`k` terms per document: tf = in-doc occurrences, idf =
    * ln((N+1)/(df+1)) with df = documents containing the term, score
    * rounded for cross-engine determinism, rank by (score DESC, term ASC).
    *
    * Shapes at scale: tf is one (doc, term) aggregate; df re-aggregates
    * tf's output (terms, not token instances — the big explode happens
    * once); N joins in as a broadcast 1-row aggregate, not a collected
    * driver scalar; the per-doc top-k is a rank-filtered window that
    * Spark 4 plans as WindowGroupLimit (map-side partial top-k). */
  def tfIdfTop(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = docs.select(col(idCol).as("id"),
        explode(filter(spaceTokens(col(textCol)), t => t =!= "")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1) / (col("df") + 1)), 6))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rk"))
  }

  /** Character-level Shannon entropy (bits/char) — the cheap gibberish /
    * compression-ratio proxy every corpus quality gate runs: natural text
    * sits ~4 bits, base64 blobs and key-mashing score high, repeated
    * boilerplate scores low. Entirely in-row (distinct chars × text scan,
    * O(|Σ|·|text|) with |Σ| bounded by the charset) so it rides the
    * document scan with zero shuffle, like [[qualityScore]].
    *
    * Formula: H = (ln n − Σ c·ln c / n) / ln 2 over per-char counts c —
    * one log per DISTINCT char rather than one per char, and the same
    * expression the oracle evaluates. Empty/null-safe: 0.0. */
  def charEntropy(text: Column): Column = {
    // r15: the Σ count·ln(count) fold is the native CharEntropySum — the
    // HOF form paid one full interpreted filter pass PER DISTINCT CHAR
    // (O(len·distinct) per doc); the kernel is one counting pass + one
    // in-first-occurrence-order fold (bit-identical float order —
    // ShingleExpressionsSpec pins it against the HOF below).
    val n = length(text).cast("double")
    val sumClnC = graft.functions.Shingles.charEntropySum(text)
    when(n > 0, round((log(n) - sumClnC / n) / math.log(2.0), 6)).otherwise(0.0)
  }

  /** Retired HOF formulation of [[charEntropy]]'s fold — bit-identity
    * reference for ShingleExpressionsSpec only. */
  private[graft] def charEntropySumHof(text: Column): Column = {
    val chars = split(text, "", -1)
    val counts = transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast("double"))
    aggregate(counts, lit(0.0), (acc, c) => acc + c * log(c))
  }

  /** BM25 (Okapi) scores against a FIXED term set — the ranked-retrieval
    * upgrade of [[tfIdfTop]] and the relevance filter of a targeted-corpus
    * pipeline ("score every page against these probe queries").
    *
    * Scale shape: with the term set fixed and small, tf per term is an
    * in-row token-equality count on the scan — NO explode, no (doc, term)
    * shuffle at all (contrast [[tfIdfTop]]). The corpus statistics
    * (N, avgdl, per-term df) reduce to ONE 1-row aggregate that joins back
    * as a broadcast, so the whole query is: scan → 1-row agg → broadcast
    * join → scan-local arithmetic → bounded-heap top-k.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the non-negative Lucene
    * form); tf component = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16, "fixed small probe-term set")
    def tfOf(t: String) =
      size(filter(spaceTokens(col(textCol)), x => x === t)).cast("double")
    val base = docs.select(
      col(idCol).as("id") +: tokenCount(col(textCol)).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) => tfOf(t).as(s"tf$i") }: _*)
    val stats = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +: terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i")): _*)
    val scored = base.crossJoin(broadcast(stats))
      .withColumn("score", round(terms.indices.map { i =>
        val idf = log(lit(1.0) +
          (col("n_docs") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5))
        val tf = col(s"tf$i")
        idf * (tf * (k1 + 1)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      }.reduce(_ + _), 6))
      .filter(col("score") > 0)
    // global top-k as TakeOrderedAndProject (bounded heap per partition,
    // k rows to one task) — a rank-filtered global window would instead
    // funnel the WHOLE scored corpus through one partition. The rank is
    // attached after the limit, over k rows only.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
    scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("id"), col("score"), col("rank"))
  }

  /** Greedy token-budget shard packing (sequence packing's outer loop):
    * assign each document to a shard so shards hold ~`targetTokens`
    * tokens, preserving id order within a packing group.
    *
    * SCALE SHAPE: a single global running sum would be one task — instead
    * documents first hash into `groups` independent packing groups
    * (partition-parallel), and the running sum runs per group
    * (`shard_id = group · 2^20 + local shard`). At 100 TB, `groups`
    * scales with the cluster and each group's window is one ordinary
    * partitioned window — no global order, no single-task stage.
    * Deterministic: group and order are pure functions of the id. */
  def packShards(docs: DataFrame, idCol: String, textCol: String,
      targetTokens: Int, groups: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("id"),
        pmod(col(idCol), lit(groups)).as("grp"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id"), col("n_tokens"),
        (col("grp") * lit(1048576L) +
          floor(col("cum_before") / targetTokens)).as("shard_id"))
  }

  /** Per-document negative log-likelihood under an add-one-smoothed bigram
    * LM trained on the corpus itself — the CCNet quality signal ("CCNet:
    * Extracting high quality monolingual datasets from web crawl data",
    * Wenzek et al. 2020, which scores with a KenLM n-gram model and
    * buckets the corpus by perplexity; the bigram model keeps the same
    * posture fully inside the engine and exactly SQL-replayable).
    * P(w₂|w₁) = (C(w₁w₂)+1) / (C(w₁)+|V|); nll = −mean ln P over the
    * document's bigrams (token-weighted). Documents with < 2 non-empty
    * tokens have no bigrams and drop out.
    *
    * SCALE SHAPE: one token explode feeds the unigram counts, one bigram
    * explode feeds both the count model and the per-doc scoring — each a
    * map-side-combined hash aggregate. Scoring joins the doc's DISTINCT
    * (w₁,w₂) counts (not token instances) to the model, keyed on the
    * bigram/unigram — corpus-sized but key-partitioned exchanges; stopword
    * bigrams are hot keys that AQE skew-split handles. |V| is a broadcast
    * 1-row aggregate. Nothing is ever collected; the model tables stay
    * distributed (a 100 TB corpus's bigram table can be TB-sized itself —
    * that is why this is a join, not a broadcast map). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ft = filter(spaceTokens(col(textCol)), t => t =!= "")
    val toks = docs.select(explode(ft).as("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val vsize = uni.agg(count(lit(1)).as("v"))
    // bigrams via the shifted-slice shape of [[wordBigrams]], over the
    // FILTERED tokens so the unigram and bigram vocabularies agree
    val nbg = greatest(size(ft) - 1, lit(0))
    val bg = docs.select(col(idCol).as("id"),
        explode(zip_with(slice(ft, lit(1), nbg), slice(ft, lit(2), nbg),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val model = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val docBg = bg.groupBy("id", "w1", "w2").agg(count(lit(1)).as("k"))
    docBg.join(model, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vsize))
      .groupBy("id")
      .agg(sum(col("k")).cast("bigint").as("n_bigrams"),
        round(-sum(col("k") * log((col("cb") + 1) / (col("cw") + col("v"))))
          / sum(col("k")), 6).as("nll"))
  }

  /** CCNet's head/middle/tail cut: bucket documents by [[lmScore]] NLL
    * terciles (head = most fluent third). Thresholds are the EXACT
    * interpolated percentiles of the rounded scores — Spark `percentile`
    * and DuckDB `quantile_cont` share R-7 interpolation bit-for-bit (the
    * x_quantiles contract), so the cut replays cross-engine. The
    * threshold row is a 1-row broadcast (the S4 scalar shape); per-doc
    * assignment is a map-side compare. At 100 TB the exact percentile's
    * collect-all-values aggregate is the one non-scalable piece — swap in
    * `percentile_approx` (sketch-sized state, same 1-row broadcast) and
    * the rest of the plan is unchanged. */
  def ppxBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = lmScore(docs, idCol, textCol)
    val cuts = scored.agg(
      round(expr("percentile(nll, CAST(1 AS DOUBLE)/3)"), 6).as("t1"),
      round(expr("percentile(nll, CAST(2 AS DOUBLE)/3)"), 6).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("id"), col("n_bigrams"), col("nll"),
        when(col("nll") <= col("t1"), lit("head"))
          .when(col("nll") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
