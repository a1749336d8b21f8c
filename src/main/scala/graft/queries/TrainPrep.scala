package graft.queries

import org.apache.spark.sql.functions._

import graft.{QDef, Tables}
import graft.llm.{Curation, Packing, Sampling, TextOps}
import graft.streaming.TwsUserStats

/** Training-data preparation operators: sequence packing, eval-set
  * decontamination, repetition profiling, weighted source mixing, rolling
  * time windows, and the transformWithState batch twin. Engine bodies in
  * [[graft.llm.Packing]] / [[graft.llm.Curation]] /
  * [[graft.streaming.TwsUserStats]]; every row here is oracle-checked
  * against a DuckDB replay of the same arithmetic.
  */
object TrainPrep {

  /** Context-window size for both packing layouts (tokens). */
  private val WindowSize = 128

  /** The PINNED eval benchmark sets for the decontamination family —
    * literal doc-id lists compiled into both the Spark bodies and the
    * oracle texts, so the "fixed benchmark set" boundedness contract
    * holds by CONSTRUCTION (eval frames are ≤|list| rows at any
    * corpus size — these queries no longer need the growth-probe
    * exemption). The lists equal the former modulus slices
    * (doc_id % 97 = 0 and doc_id % 5 = 3) restricted to ids < 500 —
    * ids present at every driver sf — so sf0.01 results are unchanged
    * while sf-proportional eval growth is gone. */
  private[queries] val EvalExactIds: Seq[Long] =
    Seq(0L, 97L, 194L, 291L, 388L, 485L)
  private[queries] val EvalFuzzyIds: Seq[Long] = 3L until 500L by 5L
  private[queries] val EvalExactIdsSql: String =
    EvalExactIds.mkString(", ")
  private[queries] val EvalFuzzyIdsSql: String =
    EvalFuzzyIds.mkString(", ")

  /** Global token budget for x_budget_select — ≈ a third of the sf0.01
    * corpus (27k whitespace tokens), so full-keep bins, the boundary bin,
    * and dropped bins all occur at every driver SF. */
  private[queries] val BudgetTokens = 9000L

  /** DuckDB oracle for token-budget selection — shared with the SQL-text
    * twin `x_sql_budget` (SqlSurface). The oracle replays the NAIVE
    * global-cumsum form; the engine's histogram form selects the same set
    * by construction (bin key monotone in score). Window sum CAST back to
    * BIGINT (DuckDB HUGEINT — the x_pack_chunks lesson). */
  private[queries] val BudgetOracle: String = {
    val nTok = "len(list_filter(string_split(text, ' '), x -> x <> ''))"
    val quality = s"round(${StarExt.occSql(" the ")} / $nTok * 0.5" +
      s" + least(CAST(length(text) AS DOUBLE) / 1000, 1.0) * 0.5, 6)"
    s"""WITH s AS (
       |  SELECT doc_id, $quality AS score, CAST($nTok AS BIGINT) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, score, toks,
       |    CAST(sum(toks) OVER (ORDER BY score DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM s WHERE score IS NOT NULL)
       |SELECT doc_id, score, toks FROM c WHERE cum <= $BudgetTokens""".stripMargin
  }

  /** DuckDB oracle for concat-and-chunk packing — shared with the SQL-text
    * twin `x_sql_pack_chunks` (SqlSurface). DuckDB `sum() OVER` returns
    * HUGEINT (int128) where Spark writes BIGINT and the driver hash is
    * dtype-sensitive, so `end_off` and every column derived from it are
    * cast back — the same convention as the other cumsum oracles
    * (x_pack_stats, x_rolling_time). */
  private[queries] val PackChunksOracle: String =
    s"""WITH d AS (
       |  SELECT source AS shard, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (
       |  SELECT shard, doc_id, toks,
       |    CAST(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS end_off
       |  FROM d)
       |SELECT shard, doc_id, toks,
       |  CAST(end_off - toks AS BIGINT) AS start_off,
       |  CAST((end_off - toks) // $WindowSize AS BIGINT) AS first_window,
       |  CAST((end_off - 1) // $WindowSize AS BIGINT) AS last_window,
       |  (end_off - 1) // $WindowSize > (end_off - toks) // $WindowSize
       |    AS spans_boundary
       |FROM c""".stripMargin

  /** Shared greedy-packing oracle: DuckDB recursive CTE walking each shard
    * in id order with (bin, fill) state — the sequential semantics the
    * engine reproduces with one clustered shuffle + O(1)-state iterators. */
  private val GreedyPackCte =
    s"""d AS (
       |  SELECT source AS shard, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
       |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents),
       |pack AS (
       |  SELECT shard, doc_id, toks, rn, CAST(0 AS BIGINT) AS bin_id,
       |    toks AS bin_fill
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.doc_id, d.toks, d.rn,
       |    CASE WHEN p.bin_fill + d.toks <= $WindowSize
       |      THEN p.bin_id ELSE p.bin_id + 1 END,
       |    CASE WHEN p.bin_fill + d.toks <= $WindowSize
       |      THEN p.bin_fill + d.toks ELSE d.toks END
       |  FROM d JOIN pack p ON d.shard = p.shard AND d.rn = p.rn + 1)""".stripMargin

  /** Token-budget mixing: binary-exact weights (0.5 / 0.125 — exact in both
    * engines' doubles, so floor(weight·budget) can never straddle an ulp)
    * and a fixed total budget. */
  private val MixBudget = 10000L
  private val MixWeights = Map(
    "en" -> 0.5, "de" -> 0.125, "es" -> 0.125, "fr" -> 0.125, "zh" -> 0.125)
  private val MixCte =
    s"""d AS (SELECT lang AS grp, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
       |w(grp, weight) AS (VALUES
       |  ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.125 AS DOUBLE)),
       |  ('es', CAST(0.125 AS DOUBLE)), ('fr', CAST(0.125 AS DOUBLE)),
       |  ('zh', CAST(0.125 AS DOUBLE))),
       |j AS (SELECT d.grp, d.doc_id, d.toks,
       |    CAST(floor(w.weight * $MixBudget) AS BIGINT) AS grp_budget,
       |    sum(d.toks) OVER (PARTITION BY d.grp ORDER BY d.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
       |  FROM d JOIN w ON d.grp = w.grp)""".stripMargin

  /** DSIR constants: feature buckets and the target domain slice. */
  private val DsirDim = 64
  private val DsirTarget = "src0"

  /** [[graft.llm.TextOps.wordHash]] rendered over an arbitrary DuckDB
    * expression (StarExt's WordHashSql is fixed to the alias `tok`). */
  private def whSql(c: String) =
    s"""(CAST(ascii(substr($c || '___', 1, 1))*65536
       |  + ascii(substr($c || '___', 2, 1))*256
       |  + ascii(substr($c || '___', 3, 1)) AS BIGINT)
       |  + CAST(length($c) AS BIGINT)*16777216)""".stripMargin

  /** Shared DSIR oracle front half: hashed unigram+bigram features, the
    * two add-one multinomials (bucket spine so smoothing sees empty
    * cells), per-bucket log ratios rounded to 9 (libm parity), and
    * per-raw-doc weights `dwts(doc_id, logw)` rounded to 6 — the exact
    * replay of [[graft.llm.Curation.dsirWeights]]. */
  private[queries] val DsirCtes =
    s"""dft AS (
       |  SELECT doc_id, source = '$DsirTarget' AS is_t,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents),
       |duni AS (
       |  SELECT doc_id, is_t, ${whSql("tok")} % $DsirDim AS j
       |  FROM (SELECT doc_id, is_t, unnest(t) AS tok FROM dft)),
       |dbi AS (
       |  SELECT doc_id, is_t,
       |    ((${whSql("t[CAST(i AS INT)]")} * 1000003
       |      + ${whSql("t[CAST(i AS INT)+1]")}) % 2147483647) % $DsirDim AS j
       |  FROM dft, unnest(range(1, len(t))) u(i)),
       |dfeats AS (SELECT * FROM duni UNION ALL SELECT * FROM dbi),
       |dcnt AS (
       |  SELECT j, sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc,
       |    sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS rc
       |  FROM dfeats GROUP BY 1),
       |dspine AS (SELECT unnest(range(0, $DsirDim)) AS j),
       |dfill AS (
       |  SELECT s.j, coalesce(tc, 0) AS tc, coalesce(rc, 0) AS rc
       |  FROM dspine s LEFT JOIN dcnt c ON c.j = s.j),
       |dtot AS (SELECT sum(tc) AS tn, sum(rc) AS rn FROM dfill),
       |dlr AS (
       |  SELECT j, CAST(round((ln((tc + 1.0) / (tn + $DsirDim))
       |    - ln((rc + 1.0) / (rn + $DsirDim))) * 1000000000.0) AS BIGINT)
       |    AS lrn
       |  FROM dfill CROSS JOIN dtot),
       |dwts AS (
       |  SELECT d.doc_id,
       |    CAST(round(coalesce(sum(lrn), 0) / 1000.0) AS BIGINT)
       |      / 1000000.0 AS logw
       |  FROM documents d
       |  LEFT JOIN dfeats f ON f.doc_id = d.doc_id
       |  LEFT JOIN dlr ON dlr.j = f.j
       |  WHERE d.source <> '$DsirTarget'
       |  GROUP BY 1)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Concat-and-chunk (GPT-style) packing: per-shard prefix sums place
    // every document in the concatenated token stream; window indices and
    // the boundary-spanning flag are pure arithmetic on the offsets. One
    // window function per shard — no state, no iteration.
    QDef("x_pack_chunks", PackChunksOracle) { (s, d) =>
      Packing.packChunks(Tables(s, d).documents, "source", "doc_id",
        size(TextOps.spaceTokens(col("text"))), WindowSize)
    },

    // Greedy whole-document packing: documents never split, a doc that
    // would overflow the current window opens a new one. The oracle is a
    // row-at-a-time recursive CTE; the engine is one repartition(shard) +
    // sortWithinPartitions + O(1)-state mapPartitions walk.
    QDef("x_pack_greedy",
      s"""WITH RECURSIVE $GreedyPackCte
         |SELECT shard, doc_id, toks, bin_id, bin_fill FROM pack""".stripMargin) { (s, d) =>
      Packing.packGreedy(Tables(s, d).documents, "source", "doc_id",
        size(TextOps.spaceTokens(col("text"))), WindowSize)
    },

    // Packing audit: windows, tokens, and utilization per shard — the
    // number that sizes the context-window cap in production.
    QDef("x_pack_stats",
      s"""WITH RECURSIVE $GreedyPackCte
         |SELECT shard, max(bin_id) + 1 AS n_windows,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(toks) AS DOUBLE) / ((max(bin_id) + 1) * $WindowSize)
         |    AS utilization
         |FROM pack GROUP BY shard""".stripMargin) { (s, d) =>
      Packing.packStats(
        Packing.packGreedy(Tables(s, d).documents, "source", "doc_id",
          size(TextOps.spaceTokens(col("text"))), WindowSize), WindowSize)
    },

    // Length-bucketed batching audit (Packing.lengthBuckets): power-of-two
    // caps from INTEGER bit arithmetic (no float log2 tie risk), per-bucket
    // doc/token/padded-cost/waste accounting — the tokenizer-aware batching
    // decision. Scan-local math into a ~10-key aggregate.
    QDef("x_pack_length_buckets",
      """WITH d AS (
        |  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS toks
        |  FROM documents),
        |b AS (
        |  SELECT CASE WHEN (toks & (toks - 1)) = 0 THEN toks
        |         ELSE CAST(CAST(1 AS BIGINT) << length(bin(toks)) AS BIGINT)
        |         END AS bucket_cap, toks
        |  FROM d WHERE toks > 0)
        |SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  CAST(count(*) * bucket_cap AS BIGINT) AS padded,
        |  round(1.0 - CAST(sum(toks) AS DOUBLE) / (count(*) * bucket_cap), 6)
        |    AS waste_ratio
        |FROM b GROUP BY 1""".stripMargin) { (s, d) =>
      Packing.lengthBuckets(Tables(s, d).documents,
        TextOps.tokenCount(col("text")))
    },

    // Eval-set decontamination: train docs sharing >=1 word trigram with
    // the PINNED eval benchmark (EvalExactIds — a literal id list, so
    // the eval n-gram frame is bounded by construction at any corpus
    // size), with the distinct shared-ngram count. Eval n-grams
    // broadcast; the corpus is probed map-side and never shuffles to
    // find candidates.
    QDef("x_contamination",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |tri AS (
         |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
         |  FROM toks, unnest(range(1, len(w) - 1)) t(i)),
         |ev AS (SELECT DISTINCT g FROM tri
         |  WHERE doc_id IN ($EvalExactIdsSql))
         |SELECT t.doc_id, count(*) AS shared_ngrams
         |FROM tri t JOIN ev USING (g)
         |WHERE t.doc_id NOT IN ($EvalExactIdsSql)
         |GROUP BY t.doc_id""".stripMargin) { (s, d) =>
      Curation.contamination(Tables(s, d).documents, "doc_id", "text",
        col("doc_id").isin(EvalExactIds: _*))
    },

    // FUZZY decontamination (Curation.fuzzyContamination): train docs
    // with a verified MinHash near-duplicate (trigram Jaccard >= 0.7) in
    // the PINNED eval benchmark (EvalFuzzyIds — a literal id list, so
    // the eval band/text frames are bounded by construction) — catches
    // the paraphrased leaks the exact-ngram gate above can't. Eval
    // bands + texts broadcast; candidates discovered map-side on the
    // corpus scan. The oracle replays the same 16-hash signatures, 4x4
    // banding, and exact-Jaccard verify as the x_dedup_minhash_lsh
    // oracle, restricted to cross-split candidate pairs.
    QDef("x_contamination_fuzzy",
      s"""WITH ${StarExt.WordShCte},
         |${StarExt.MhCte},
         |${StarExt.BandsCte},
         |cand AS (
         |  SELECT DISTINCT a.id AS did, b.id AS eid FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.sig = b.sig
         |  WHERE a.id NOT IN ($EvalFuzzyIdsSql)
         |    AND b.id IN ($EvalFuzzyIdsSql)),
         |sizes AS (SELECT id, count(*) AS n FROM wsh GROUP BY id),
         |inter AS (
         |  SELECT c.did, c.eid, count(*) AS i FROM cand c
         |  JOIN wsh s1 ON s1.id = c.did
         |  JOIN wsh s2 ON s2.id = c.eid AND s2.sh = s1.sh
         |  GROUP BY 1, 2),
         |jac AS (
         |  SELECT did, eid, round(i / (n1.n + n2.n - i), 6) AS j
         |  FROM inter
         |  JOIN sizes n1 ON n1.id = did
         |  JOIN sizes n2 ON n2.id = eid
         |  WHERE round(i / (n1.n + n2.n - i), 6) >= 0.7)
         |SELECT did AS doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches,
         |  max(j) AS max_jaccard
         |FROM jac GROUP BY 1""".stripMargin) { (s, d) =>
      Curation.fuzzyContamination(Tables(s, d).documents, "doc_id", "text",
        col("doc_id").isin(EvalFuzzyIds: _*), 0.7)
    },

    // DSIR importance weights (arXiv:2302.03169): add-one multinomials
    // over hashed unigram+bigram buckets, p̂ from the src0 target slice,
    // q̂ from the rest; per-doc logw = Σ lr[bucket]. The model is
    // dim-sized by construction (1-row broadcast array) — the contrast
    // with x_text_lm_score's corpus-sized model join.
    QDef("x_dsir_weights",
      s"""WITH $DsirCtes
         |SELECT doc_id, logw FROM dwts""".stripMargin) { (s, d) =>
      Curation.dsirWeights(Tables(s, d).documents, "doc_id", "text",
        col("source") === DsirTarget, DsirDim)
    },

    // ... and the DSIR cut: Gumbel top-k resampling (∝ exp(logw), without
    // replacement), noise derived from the deterministic id hash so both
    // engines draw the identical sample. TakeOrderedAndProject top-k.
    QDef("x_dsir_resample",
      s"""WITH $DsirCtes
         |SELECT doc_id, logw,
         |  round(logw - ln(-ln(((${Sampling.hashBucketSql("doc_id")}) + 0.5)
         |    / 4294967296.0)), 6) AS score
         |FROM dwts ORDER BY score DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      Curation.dsirResample(Tables(s, d).documents, "doc_id", "text",
        col("source") === DsirTarget, DsirDim, 50)
    },

    // Token-budget selection (Curation.budgetSelect): the greedy
    // highest-quality-first prefix under a 9000-token global budget. The
    // engine runs the two-pass histogram form (bounded floor(score·1000)
    // bins, KB prefix-sum window, broadcast verdicts, exact sort only
    // inside the one boundary bin); the oracle replays the NAIVE global
    // cumsum — the two are provably the same set because the bin key is
    // monotone in score and score ties cannot cross a bin edge. Window
    // sums CAST back to BIGINT (DuckDB HUGEINT, the x_pack_chunks lesson).
    QDef("x_budget_select", BudgetOracle) { (s, d) =>
      val scored = Tables(s, d).documents.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).as("t"))
      Curation.budgetSelect(scored, "doc_id", "q", "t", BudgetTokens)
    },

    // PRETRAIN-PREP pipeline composite: Gopher quality gate → fuzzy
    // (MinHash) eval decontamination — BOTH the eval slice and its
    // verified near-dups leave the pool — → token-budget selection of the
    // best 6000 tokens. Chains the round-6 batch-2 operators end-to-end;
    // the oracle replays the full cascade (gopher rules, signature
    // banding + exact-Jaccard cross-split pairs, naive budget cumsum), so
    // equality proves the STAGES compose, not just each stage alone.
    QDef("x_pipeline_pretrain", {
      val nTok = "len(list_filter(string_split(text, ' '), x -> x <> ''))"
      val quality = s"round(${StarExt.occSql(" the ")} / $nTok * 0.5" +
        s" + least(CAST(length(text) AS DOUBLE) / 1000, 1.0) * 0.5, 6)"
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |wc AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
         |st AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, max(c) AS top_c,
         |    CAST(sum(length(tok) * c) AS BIGINT) AS sum_len
         |  FROM wc GROUP BY 1),
         |gr AS (
         |  SELECT st.doc_id,
         |    CASE WHEN n < 25 OR n > 10000 THEN 1 ELSE 0 END
         |      + CASE WHEN CAST(top_c AS DOUBLE) / n > 0.12 THEN 1 ELSE 0 END
         |      + CASE WHEN CAST(sum_len AS DOUBLE) / n < 3.0
         |             OR CAST(sum_len AS DOUBLE) / n > 10.0 THEN 1 ELSE 0 END
         |      + CASE WHEN ${StarExt.occSql(" the ")} < 1 THEN 1 ELSE 0 END
         |      AS fails
         |  FROM st JOIN documents USING (doc_id)),
         |docsrc AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN gr ON gr.doc_id = d.doc_id AND gr.fails = 0),
         |${StarExt.minhashPairsCtes(0.7)},
         |cont AS (
         |  SELECT DISTINCT CASE WHEN d1 IN ($EvalFuzzyIdsSql) THEN d2
         |    ELSE d1 END AS doc_id
         |  FROM pairs
         |  WHERE (d1 IN ($EvalFuzzyIdsSql)) <> (d2 IN ($EvalFuzzyIdsSql))),
         |train AS (
         |  SELECT s.doc_id, s.text FROM docsrc s
         |  WHERE s.doc_id NOT IN ($EvalFuzzyIdsSql)
         |    AND NOT EXISTS (SELECT 1 FROM cont c WHERE c.doc_id = s.doc_id)),
         |sc AS (
         |  SELECT doc_id, $quality AS score, CAST($nTok AS BIGINT) AS toks
         |  FROM train),
         |cum AS (
         |  SELECT doc_id, score, toks,
         |    CAST(sum(toks) OVER (ORDER BY score DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
         |  FROM sc WHERE score IS NOT NULL)
         |SELECT doc_id, score, toks FROM cum WHERE c <= 6000""".stripMargin
    }) { (s, d) =>
      val docs = Tables(s, d).documents
      // pinned (lazy checkpoint): the gopher-gated corpus feeds the fuzzy
      // contamination pass (signature + both text re-joins) AND the train
      // filter — unpinned, the gate's token-profile aggregate+join replays
      // once per reference (guide §5 reuse-vs-recompute)
      val kept = docs.join(
        TextOps.gopherGate(docs, "doc_id", "text")
          .filter(col("keep")).select("doc_id"),
        "doc_id")
        .localCheckpoint(false)
      val contaminated = Curation
        .fuzzyContamination(kept, "doc_id", "text",
          col("doc_id").isin(EvalFuzzyIds: _*), 0.7)
        .select("doc_id")
      val train = kept.filter(!col("doc_id").isin(EvalFuzzyIds: _*))
        .join(contaminated, Seq("doc_id"), "left_anti")
      // phase-2 pin (r15): budgetSelect reads its input three times
      // (histogram + fully-kept pass + boundary-bin pass) — for a bare
      // corpus scan that is three cheap pruned reads, but HERE each replay
      // re-runs the contamination anti-join and the per-doc quality/token
      // scoring. The pinned frame is (doc_id, q, t) — KB-scale rows.
      val scored = train.select(col("doc_id"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).as("t"))
        .localCheckpoint(false)
      Curation.budgetSelect(scored, "doc_id", "q", "t", 6000L)
    },

    // Gopher-style repetition profile: distinct-token ratio and top
    // word/bigram shares per document, exact int/int divisions.
    QDef("x_text_repetition",
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |wc AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
        |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  count(*) AS n_distinct, max(c) AS top_c FROM wc GROUP BY 1),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        |  FROM toks, unnest(range(1, len(w))) t(i)),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, max(c) AS top_bc,
        |  CAST(sum(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY 1)
        |SELECT ws.doc_id, ws.n_words,
        |  CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
        |  CAST(top_c AS DOUBLE) / n_words AS top_word_share,
        |  CAST(top_bc AS DOUBLE) / n_bigrams AS top_bigram_share
        |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id""".stripMargin) { (s, d) =>
      Curation.repetitionProfile(Tables(s, d).documents, "doc_id", "text")
    },

    // Weighted source mixing: per-language token budgets filled in
    // deterministic id order, cap never exceeded. The kept-document list.
    QDef("x_mix_sources",
      s"""WITH $MixCte
         |SELECT grp, doc_id, toks, grp_budget FROM j
         |WHERE end_off <= grp_budget""".stripMargin) { (s, d) =>
      Curation.mixToBudget(Tables(s, d).documents, "lang", "doc_id",
        size(TextOps.spaceTokens(col("text"))), MixWeights, MixBudget)
    },

    // Post-mix audit: docs/tokens kept per group vs the group budget.
    QDef("x_mix_stats",
      s"""WITH $MixCte
         |SELECT grp, grp_budget, count(*) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens
         |FROM j WHERE end_off <= grp_budget GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Curation.mixStats(
        Curation.mixToBudget(Tables(s, d).documents, "lang", "doc_id",
          size(TextOps.spaceTokens(col("text"))), MixWeights, MixBudget))
    },

    // Event-time rolling window: per-customer 7-day trailing order count
    // and total, RANGE frame on the timestamp (micros — exact). Money in
    // integer cents so the windowed sums are order-insensitive and
    // hash-identical cross-engine.
    QDef("x_rolling_time",
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  count(*) OVER w AS roll_cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w
        |    AS BIGINT) AS roll_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // o_orderdate arrives TIMESTAMP_NTZ; the session runs UTC, so the
      // cast to TIMESTAMP is a pure reinterpretation and unix_micros is
      // the exact integer frame key
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-7L * 86400L * 1000000L, 0L)
      Tables(s, d).orders
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .withColumn("roll_cnt", count(lit(1)).over(w))
        .withColumn("roll_cents", sum("cents").over(w))
        .drop("cents")
    },

    // Strided curriculum interleave: the global round-robin training order
    // as pure per-group-rank arithmetic — no global sort, no
    // single-partition window (the scale trap the naive row_number-over-
    // everything formulation falls into).
    QDef("x_interleave",
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |m(grp, gi) AS (VALUES ('en', 0), ('de', 1), ('es', 2), ('fr', 3),
        |  ('zh', 4))
        |SELECT r.doc_id, m.grp, r.rn, (r.rn - 1) * 5 + m.gi AS position
        |FROM r JOIN m ON r.lang = m.grp""".stripMargin) { (s, d) =>
      Curation.strideInterleave(Tables(s, d).documents, "lang", "doc_id",
        Map("en" -> 0, "de" -> 1, "es" -> 2, "fr" -> 3, "zh" -> 4))
    },

    // Hashing-trick features: 16-bucket token-count vector per document,
    // computed in-row on the scan (no vocabulary, no shuffle) and emitted
    // long-form. The oracle replays the exact wordHash arithmetic.
    QDef("x_feature_hash",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  ascii(substr(t || '___', 1, 1)) * 65536
        |    + ascii(substr(t || '___', 2, 1)) * 256
        |    + ascii(substr(t || '___', 3, 1)) + length(t) * 16777216 AS wh
        |  FROM tok),
        |c AS (SELECT doc_id, wh % 16 AS j, count(*) AS cnt FROM h GROUP BY 1, 2)
        |SELECT d.doc_id, j.j, coalesce(c.cnt, 0) AS cnt
        |FROM (SELECT doc_id FROM documents) d
        |CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
        |LEFT JOIN c ON c.doc_id = d.doc_id AND c.j = j.j""".stripMargin) { (s, d) =>
      Tables(s, d).documents
        .select(col("doc_id"),
          posexplode(TextOps.featureHash(col("text"), 16)).as(Seq("j", "cnt")))
        .select(col("doc_id"), col("j").cast("bigint").as("j"),
          col("cnt").cast("bigint").as("cnt"))
    },

    // Batch twin of the transformWithState running per-user aggregate
    // (TwsUserStats — same integer-cents arithmetic the processor carries
    // across micro-batches; MemoryStream parity in EventStreamsSpec).
    QDef("x_stream_tws",
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS total_cents,
        |  max(value) AS max_value
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      TwsUserStats.userStatsBatch(Tables(s, d).events)
    }
  )
}
