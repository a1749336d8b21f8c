package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. All banded/bucketed — NEVER an all-pairs
  * crossJoin: candidate generation is a shuffle-join on band signatures
  * (O(n·bands) rows), and only candidates pay the exact-verification cost.
  * At 100 TB the band join is the only wide operation and it partitions by
  * signature, so it scales out; skewed signatures (boilerplate docs) are
  * handled by AQE skew splitting.
  */
object Dedup {

  /** Frames referenced several times by a band/bucket self-join are pinned
    * with LAZY `localCheckpoint(eager = false)`. The alternatives, measured:
    *
    *  - `cache()` (lazy, lineage-preserving) DOUBLE-COMPUTES under a
    *    self-join: the two branches hit the unpopulated cache concurrently
    *    in the same first job and `BlockManager.getOrElseUpdate` lets both
    *    recompute rather than block (1.6× on x_dedup_ngram_jaccard at
    *    bench scale). A lazy checkpoint instead collapses both branches
    *    onto ONE marked RDD, so the DAG computes each partition once.
    *  - EAGER `localCheckpoint()` runs the WHOLE pipeline's Spark jobs at
    *    CONSTRUCTION time, even if the result is never consumed. The lazy
    *    flag defers the persist to first use — though under AQE, building
    *    the checkpoint RDD still materializes any shuffle stages BELOW the
    *    pin at construction (AdaptiveSparkPlanExec.execute resolves its
    *    stages); for the narrow scan+project frames pinned here the
    *    deferral is real, for shuffle-bearing frames it is partial.
    *
    * Deliberate, documented cost of any localCheckpoint: lineage is
    * truncated, so after an executor loss the blocks have NO recompute
    * path — the job fails and the caller re-runs the query (on a
    * preemptible cluster, prefer a reliable `checkpoint()` dir, or accept
    * the retry). Blocks are GC-cleaned with the frame — nothing pins the
    * CacheManager across a 200-query session.
    *
    * Iterative loops need the EAGER variant — see [[truncate]]. */
  private[llm] def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)

  /** Lineage TRUNCATION for iterative loops — [[clusters]]' pointer-jumping
    * round builds each label frame from a SELF-JOIN of the previous one, so
    * under plain cache() the logical plan DOUBLES per round (cache
    * substitution happens at physical planning; the analyzer still walks
    * the full tree every action) and analysis time goes exponential in the
    * iteration count. `localCheckpoint` cuts the plan to a leaf each round
    * — the same checkpoint cadence GraphX's Pregel uses. Cost, explicitly:
    * eager materialization (fine here — an action follows immediately in
    * the same round) and no recompute path on executor loss (an executor
    * loss mid-loop fails the job; the caller restarts the query — the
    * standard trade for iterative algorithms, where replaying N rounds of
    * lineage is no cheaper than rerunning). Blocks are GC-cleaned with the
    * frame, so superseded rounds free themselves. */
  private[llm] def truncate(df: DataFrame): DataFrame = df.localCheckpoint()

  /** MinHash parameters — shared with the DuckDB oracle generator. */
  val Prime: Long = 2147483647L
  val HashAB: Seq[(Long, Long)] = Seq(
    (1000003L, 12345L), (1000033L, 54321L), (1000211L, 11111L), (1000231L, 22222L),
    (1000249L, 33333L), (1000253L, 44444L), (1000273L, 55555L), (1000289L, 66666L),
    (1000291L, 10101L), (1000303L, 20202L), (1000313L, 30303L), (1000333L, 40404L),
    (1000357L, 50505L), (1000367L, 60606L), (1000381L, 70707L), (1000393L, 80808L))
  val NumBands = 4
  val RowsPerBand = 4

  /** Documents typically arrive in O(1) input splits (a handful of parquet
    * files); an operator whose per-row work is HEAVY enough serializes on
    * the split count unless the cheap doc rows are repartitioned first.
    * Applied selectively, by measurement: [[substringSpans]]' window
    * expansion (~|text| rows × substring each) gains 2.5× from running
    * wide; the hash/shingle one-pass operators (MinHash16, SimHash32,
    * trigram explode) were measured NET SLOWER with it at bench scale —
    * their per-row work is too cheap to amortize the extra shuffle and
    * 16× task count, so they keep the scan's own partitioning. Row order
    * never matters downstream (sets, minima, aggregates), so where
    * applied this is result-invariant. */
  private[llm] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact dedup: group identical texts (md5 key), keep the smallest id.
    * One hash aggregate — at scale, pre-hash to a 128-bit key so the
    * shuffle carries 16 bytes per row, not the document body. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("text_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** (id, char-3-gram shingle) exploded distinct set — base for SimHash. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(TextOps.charShingles(col(textCol))).as("sh"))
      .distinct()

  /** (id, word-trigram-hash) exploded distinct set — base for MinHash.
    * Word shingles (Broder-style), NOT char 3-grams: over a shared
    * vocabulary the baseline char-trigram Jaccard is ~0.5, so LSH bands
    * collide for ~40% of ALL pairs (measured: 5.2M candidates on 5k docs);
    * word trigrams put baseline overlap near 0 and only true near-dups
    * band together. */
  def wordShingleSet(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(TextOps.wordTrigramHashes(col(textCol))).as("sh"))
      .distinct()

  /** 16 MinHash signatures per document, one hash-aggregate pass. */
  def minHashSignatures(sh: DataFrame): DataFrame = {
    val aggs = HashAB.zipWithIndex.map { case ((a, b), k) =>
      min((lit(a) * col("sh") + lit(b)) % Prime).as(s"m$k")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: NumBands bands of RowsPerBand signatures each, signature
    * string per band; candidate pairs = documents sharing any band. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      sigs.select(col("id"), lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
    }.reduce(_ union _)
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.sig") === col("r.sig")
        && col("l.id") < col("r.id"))
      .select(col("l.id").as("d1"), col("r.id").as("d2"))
      .distinct()
  }

  /** Exact Jaccard over the shingle sets, computed ONLY for candidate pairs. */
  def verifiedJaccard(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val s1 = sh.select(col("id").as("d1"), col("sh"))
    val s2 = sh.select(col("id").as("d2"), col("sh"))
    val inter = cand.join(s1, "d1").join(s2, Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        round(col("i") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
  }

  /** MinHash+LSH near-dup pipeline: shingle → sign → band → verify ≥ threshold.
    *
    * Scan-local signature generation: the native
    * [[graft.functions.MinHash16]] expression computes all 16 minima in one
    * fused pass per document (min over a multiset == min over the set, so
    * the explode→distinct→groupBy shuffle of the grouped formulation —
    * [[wordShingleSet]] + [[minHashSignatures]], kept as the
    * oracle-mirroring reference — is unnecessary). Exact-Jaccard
    * verification runs per CANDIDATE pair via `array_intersect` on
    * distinct-shingle arrays built only for candidate documents, so the
    * shingle set is never exploded or materialized corpus-wide. The cached
    * signature frame is referenced 8× by the band self-join; at production
    * scale it'd be a checkpointed table.
    *
    * `maxBucket` bounds the band self-join against ADVERSARIAL duplication
    * (viral exact-dup clusters, saturated vocabularies — the regimes the
    * R54 canaries x_band_density / x_exact_dup_profile detect): (band, sig)
    * buckets holding more than `maxBucket` ids are removed by an anti-join
    * BEFORE the self-join, hard-bounding per-bucket pair expansion at
    * maxBucket²/2 no matter the corpus. Below the cap the result is
    * bit-identical to the uncapped pass; when the cap engages, pairs whose
    * ONLY shared band was hot are missed — a recall trade the band-density
    * canary quantifies. The default (Int.MaxValue) adds no plan nodes. */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
        graft.functions.MinHash16.minHash16(col(textCol)).as("mh"))
      .filter(col("mh").isNotNull) // < 3 tokens → no shingles → no signature
      .transform(pin) // see [[pin]] for the localCheckpoint-vs-cache tradeoff
    val bandsAll = (0 until NumBands).map { b =>
      val cols = (0 until RowsPerBand).map(r => element_at(col("mh"), b * RowsPerBand + r + 1))
      sigs.select(col("id"), lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
    }.reduce(_ union _)
    val bands =
      if (maxBucket == Int.MaxValue) bandsAll
      else {
        // no forced broadcast: AQE owns the build side (the
        // x_dedup_substring lesson — on adversarial corpora the hot set
        // can be large); bandsAll re-derives from the PINNED sigs frame,
        // so the two references share one materialization
        val hot = bandsAll.groupBy("band", "sig")
          .agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
          .select("band", "sig")
        bandsAll.join(hot, Seq("band", "sig"), "left_anti")
      }
    val cand = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.sig") === col("r.sig")
          && col("l.id") < col("r.id"))
      .select(col("l.id").as("d1"), col("r.id").as("d2"))
      .distinct()
    // Exact-Jaccard verify: join the texts back and build the distinct-
    // shingle arrays AFTER the joins, so trigram sets are materialized only
    // for documents that actually appear in a candidate pair (the candidate
    // set is tiny next to the corpus when banding is selective).
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
    cand
      .join(txt.select(col("id").as("d1"), col("txt").as("txt1")), "d1")
      .join(txt.select(col("id").as("d2"), col("txt").as("txt2")), "d2")
      .select(col("d1"), col("d2"),
        graft.functions.Shingles.wordTrigramHashes(col("txt1"),
          distinct = true).as("sh1"),
        graft.functions.Shingles.wordTrigramHashes(col("txt2"),
          distinct = true).as("sh2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).as("i"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
      .select(col("d1"), col("d2"),
        round(col("i") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** INCREMENTAL dedup: filter a new batch against an EXISTING corpus —
    * the daily-crawl posture, where re-deduplicating 100 TB to admit a
    * 0.1 TB increment is not an option. A new document survives iff (a)
    * its exact text does not already exist in the corpus and (b) it has
    * no verified near-duplicate (Jaccard ≥ threshold) in the corpus.
    * Within-batch duplicates are the batch operators' job
    * ([[exactDedup]]/[[minHashNearDups]] over the batch) — this operator
    * is deliberately one-directional so the two compose.
    *
    * Scale shape: the corpus never ships documents — only 16-byte md5
    * keys (exact anti-join) and its LSH band table (band, sig, id), i.e.
    * the SIGNATURE INDEX a production pipeline keeps precomputed and
    * bucketed by (band, sig) so each increment joins against it with
    * zero corpus-side work. Candidates are verified exactly, texts joined
    * back only for documents that banded together; survivors come from an
    * id-only anti-join, so batch bodies move once. */
  def dedupAgainst(newDocs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val exactKeys = corpus
      .select(md5(col(textCol).cast("binary")).as("text_key")).distinct()
    val fresh = newDocs
      .withColumn("text_key", md5(col(textCol).cast("binary")))
      .join(exactKeys, Seq("text_key"), "left_anti").drop("text_key")
    def bandsOf(df: DataFrame, as: String) = {
      val sigs = pin(df.select(col(idCol).as(as),
          graft.functions.MinHash16.minHash16(col(textCol)).as("mh"))
        .filter(col("mh").isNotNull))
      (0 until NumBands).map { b =>
        val cols = (0 until RowsPerBand)
          .map(r => element_at(col("mh"), b * RowsPerBand + r + 1))
        sigs.select(col(as), lit(b).as("band"), concat_ws(",", cols: _*).as("sig"))
      }.reduce(_ union _)
    }
    val cand = bandsOf(fresh, "nid").join(bandsOf(corpus, "cid"), Seq("band", "sig"))
      .select("nid", "cid").distinct()
    val matched = cand
      .join(fresh.select(col(idCol).as("nid"), col(textCol).as("ntxt")), "nid")
      .join(corpus.select(col(idCol).as("cid"), col(textCol).as("ctxt")), "cid")
      .select(col("nid"),
        graft.functions.Shingles.wordTrigramHashes(col("ntxt"),
          distinct = true).as("sh1"),
        graft.functions.Shingles.wordTrigramHashes(col("ctxt"),
          distinct = true).as("sh2"))
      .select(col("nid"), size(array_intersect(col("sh1"), col("sh2"))).as("i"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
      .filter(round(col("i") / (col("n1") + col("n2") - col("i")), 6)
        >= threshold)
      .select(col("nid").as(idCol)).distinct()
    fresh.join(matched, Seq(idCol), "left_anti")
  }

  /** Connected components over near-dup pairs — the step that turns "pairs
    * found" into "documents deduplicated": A~B and B~C place A, B, C in one
    * component even when A≁C directly (transitive closure).
    *
    * Input: a (d1, d2) pair frame from any of the near-dup detectors.
    * Output: (id, comp) for every document that appears in at least one
    * pair, with `comp` = the smallest document id reachable through pairs
    * (the same labeling GraphX `ConnectedComponents` produces — agreement
    * is property-tested in DedupClustersSpec). Documents in no pair are
    * absent here and pass through [[survivors]] untouched.
    *
    * Algorithm: iterative min-label propagation with POINTER JUMPING —
    * each round every node takes the min label among itself and its
    * neighbors (one join + one aggregate on the edge list), then labels
    * shortcut through their current representative (`comp ← comp(comp)`),
    * which collapses chains geometrically: rounds grow as O(log diameter),
    * not O(diameter). Per round the working set is one (id, comp) row per
    * clustered doc and the symmetric edge list — both shuffle-partitioned
    * by id, nothing driver-side except the convergence counter (the same
    * loop shape as the PageRank iteration in graph.GraphMetrics). Each
    * round's label frame is TRUNCATED ([[truncate]]) so iteration N+1 both
    * reads materialized blocks and plans against a leaf — the self-join
    * would otherwise double the logical plan every round. The shared edge
    * list is truncated the same way (eager — every round reads it, and the
    * loop's first count consumes it immediately anyway); superseded
    * rounds' blocks are GC-reclaimed. */
  def clusters(pairs: DataFrame, maxIters: Int = 25): DataFrame = {
    // symmetrize in ONE pass over `pairs` (explode of the 2-element array)
    // rather than union(pairs, pairs.swapped): the union form walks the
    // pair-generation lineage TWICE in the same job (measured 2× on
    // x_pipeline_dedup's band-join upstream)
    val edges = truncate(pairs
      .select(explode(array(
        struct(col("d1").as("u"), col("d2").as("v")),
        struct(col("d2").as("u"), col("d1").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct())
    var lab = truncate(edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp")))
    var iter = 0
    var converged = false
    while (!converged) {
      val nbrMin = edges
        .join(lab.select(col("id").as("v"), col("comp").as("vc")), "v")
        .groupBy(col("u").as("id")).agg(min(col("vc")).as("nmin"))
      val prop = truncate(lab.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp")))
      // pointer jump: comp values are always ids of clustered docs (mins of
      // ids), so the rep lookup is an inner self-join that always matches
      val next = truncate(prop
        .join(prop.select(col("id").as("comp"), col("comp").as("jc")), "comp")
        .select(col("id"), col("jc").as("comp")))
      val changed = next.join(lab.withColumnRenamed("comp", "oc"), "id")
        .filter(col("comp") =!= col("oc")).count()
      lab = next
      iter += 1
      converged = changed == 0
      if (!converged && iter >= maxIters) throw new IllegalStateException(
        s"Dedup.clusters did not converge in $maxIters rounds (pointer " +
          s"jumping bounds rounds by O(log diameter) — this input would " +
          s"need a component of diameter > 2^$maxIters)")
    }
    lab
  }

  /** Keep ONE document per duplicate cluster: every clustered document
    * whose id is not its component's representative (the min id) is
    * dropped; documents in no pair pass through unchanged. The anti-join
    * shuffles on the id key only — document bodies never move. */
  def survivors(docs: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("id") =!= col("comp")).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** 32-bit SimHash as a pure scalar Column over the text — ONE pass, zero
    * shuffle: the 32 bit-weights accumulate in a struct inside a single
    * `aggregate` HOF over the distinct-shingle array. At 100 TB this is the
    * formulation that matters — the grouped variant below explodes shingles
    * through a shuffle (~30× row amplification); this one is scan-local. */
  def simHashColumn(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val arr = array_distinct(TextOps.charShingles(text))
    val zero = struct((0 until 32).map(j => lit(0L).as(s"w$j")): _*)
    aggregate(arr, zero,
      (acc, sh) => struct((0 until 32).map { j =>
        (acc.getField(s"w$j") + (shiftright(sh, j) % 2 * 2 - 1)).as(s"w$j")
      }: _*),
      acc => (0 until 32).map { j =>
        when(acc.getField(s"w$j") > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _))
  }

  /** Per-document SimHash via the native codegen'd expression (scale path:
    * one fused loop per row, no shingle materialization, no shuffle).
    * Char-shingled variant. */
  def simHashDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.SimHash32.simHash32(col(textCol)).as("simhash"))

  /** Word-trigram-shingled native SimHash — the variant to use on corpora
    * with a shared vocabulary (same rationale as [[wordShingleSet]]: char
    * shingles make nearly ALL documents Hamming-close, so the pair phase
    * goes quadratic; word trigrams isolate true near-dups). */
  def simHashDocsWords(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.SimHash32.simHash32Words(col(textCol)).as("simhash"))

  /** 32-bit SimHash per document from the exploded shingle set (grouped
    * formulation — mirrors the SQL oracle; result-identical to
    * [[simHashColumn]]): bit j set iff Σ_{shingles}(2·bit_j(sh)−1) > 0. */
  def simHash(sh: DataFrame): DataFrame = {
    val weights = (0 until 32).map { j =>
      sum(shiftright(col("sh"), j) % 2 * 2 - 1).as(s"w$j")
    }
    sh.groupBy("id").agg(weights.head, weights.tail: _*)
      .select(col("id"),
        (0 until 32).map(j => when(col(s"w$j") > 0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming. Bucketed by
    * the high byte (near-dups differ in ≤ maxHamming bits, so pairs whose
    * high bytes differ in more than maxHamming bits can't match — at scale,
    * band over several byte-slices like MinHash-LSH instead of self-joining
    * everything; here both byte-halves are used as two bands). */
  def simHashNearDups(sh: DataFrame, maxHamming: Int): DataFrame =
    simHashNearDupsFromHashes(simHash(sh), maxHamming)

  /** Near-dup pairs from a precomputed (id, simhash) frame. */
  def simHashNearDupsFromHashes(hashedIn: DataFrame, maxHamming: Int): DataFrame = {
    // referenced 4× by the band self-join; see [[pin]] for the tradeoff
    val hashed = pin(hashedIn)
    val bands = Seq(
      hashed.select(col("id"), col("simhash"), lit(0).as("band"), (col("simhash") % 65536).as("sig")),
      hashed.select(col("id"), col("simhash"), lit(1).as("band"), shiftright(col("simhash"), 16).as("sig")))
      .reduce(_ union _)
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.sig") === col("r.sig")
        && col("l.id") < col("r.id"))
      .select(col("l.id").as("d1"), col("r.id").as("d2"),
        bit_count(expr("l.simhash ^ r.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Default document-frequency ceiling for [[ngramJaccardPairs]]: trigrams
    * appearing in more documents than this are dropped from the shingle
    * universe (boilerplate carries no near-dup signal; its posting lists are
    * the one structure that would OOM a single task at web scale). */
  val DefaultMaxDf = 1000

  /** Hot-shingle-capped posting lists: (trigram, sorted id array), with
    * every array bounded by `maxDf` BY CONSTRUCTION — trigrams whose df
    * exceeds the cap are removed by a broadcast anti-join BEFORE any list
    * is collected, so no aggregation buffer ever holds a hot posting list.
    * Zipf ⇒ the hot set is tiny ⇒ it broadcasts and the anti-join is
    * map-side. Exposed for the boundedness test. */
  private[llm] def postingLists(kept: DataFrame): DataFrame =
    kept.groupBy("g").agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)

  /** (id, n-gram) pairs with hot shingles (df > maxDf) anti-joined away —
    * the filtered shingle universe everything downstream sees. `width`
    * selects the shingle coarseness (see [[TextOps.wordNgrams]]: wider
    * shingles restore Heaps-law df on saturated vocabularies); width 3
    * keeps the original [[TextOps.wordTrigrams]] expression so existing
    * plans are unchanged. */
  private[llm] def keptShingles(docs: DataFrame, idCol: String,
      textCol: String, maxDf: Int, width: Int = 3): DataFrame = {
    // native fused shingle+distinct (round 15): one codegen'd loop per
    // document replaces the slice/zip_with HOF chain + array_distinct pass
    val grams = graft.functions.Shingles.wordNgrams(col(textCol), width,
      distinct = true)
    val g = docs.select(col(idCol).as("id"), explode(grams).as("g"))
      .transform(pin) // referenced by both the df-count and the anti-join
    val hot = g.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    g.join(broadcast(hot), Seq("g"), "left_anti")
  }

  /** Word n-gram Jaccard near-dups within a partition-friendly scope column
    * (e.g. language): pairs are generated per shared trigram — an inverted-
    * index join, not a crossJoin — then scored exactly.
    *
    * `maxDf` caps posting-list length: trigrams with document frequency
    * above the cap are dropped from the shingle universe (index, sizes, and
    * intersections alike — standard df filtering, so the Jaccard stays
    * exact and self-consistent over the filtered universe). Below the cap
    * the result is bit-identical to the uncapped computation. When the cap
    * engages, dropping hot trigrams shrinks both intersection AND union, so
    * borderline scores can cross the threshold in EITHER direction — pairs
    * can newly appear as well as disappear; the scores themselves remain
    * exact over the filtered universe. The cap is what makes the exact path
    * safe at 100 TB: without it one hot trigram (df 10⁶) materializes a
    * 10⁶-element array in a single task. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Int = DefaultMaxDf, width: Int = 3): DataFrame =
    // Per-document shingle SETS in-row (array_distinct before the explode):
    // (id, g) duplicates can only arise within one document, so this equals
    // the exploded global `.distinct()` — minus its corpus-wide shuffle.
    jaccardFromKept(keptShingles(docs, idCol, textCol, maxDf, width), threshold)

  /** [[ngramJaccardPairs]] over the word-trigram-HASH shingle universe
    * ([[TextOps.wordTrigramHashes]]) instead of trigram strings — the SAME
    * universe [[minHashNearDups]]'s exact-Jaccard verify scores, so
    * `lsh ⊆ hash-truth` holds by construction (below the df cap). The two
    * universes differ only where [[TextOps.wordHash]] collides (words
    * sharing first-3-chars + length, e.g. 'their'/'there'): a collision
    * makes two distinct string trigrams one hash shingle, so the hash
    * Jaccard can exceed the string Jaccard. Use THIS truth when comparing
    * against MinHash-LSH output; use the string variant when the score
    * itself is the product. */
  def ngramHashJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Int = DefaultMaxDf): DataFrame = {
    val g = docs.select(col(idCol).as("id"),
      explode(graft.functions.Shingles.wordTrigramHashes(col(textCol),
        distinct = true)).as("g"))
      .transform(pin) // referenced by both the df-count and the anti-join
    val hot = g.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    jaccardFromKept(g.join(broadcast(hot), Seq("g"), "left_anti"), threshold)
  }

  /** Shared tail of the exact-Jaccard passes: sizes + inverted-index
    * intersection counts over an already-df-capped (id, g) shingle frame.
    * pinned: referenced by sizes AND the posting lists ([[pin]] tradeoff).
    *
    * Candidate pairs come straight off the inverted index: group the
    * posting list per shingle and expand ordered id pairs in-row. One
    * deterministic hash-aggregate shuffle replaces the g⋈g self-join,
    * whose build side sat on the broadcast threshold and flip-flopped
    * plans run-to-run. Singleton shingles (most, by Zipf) die at the size
    * filter; per-shingle pair expansion is Σ min(df, maxDf)² — bounded,
    * unlike the raw Σ df². */
  private def jaccardFromKept(keptIn: DataFrame, threshold: Double): DataFrame = {
    val kept = pin(keptIn)
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = interCounts(postingLists(kept))
    inter
      .join(sizes.select(col("id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        round(col("i") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Ordered (d1 < d2) shared-distinct-trigram counts straight off the
    * inverted index: per-trigram in-row pair expansion + one count
    * aggregate (see [[ngramJaccardPairs]] for why this beats a g⋈g
    * self-join). */
  private def interCounts(byG: DataFrame): DataFrame =
    byG.select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("d1"), b.as("d2")))))).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("i"))

  /** DIRECTIONAL containment near-dups: C(src→ref) = |grams(src) ∩
    * grams(ref)| / |grams(src)| — flags documents mostly CONTAINED in
    * another (quotes, excerpts, page-of-a-book) that symmetric Jaccard
    * misses: a 100-word excerpt of a 10k-word source has Jaccard ≈ 0.01
    * but containment ≈ 1.0. Same inverted-index machinery as
    * [[ngramJaccardPairs]] (shared [[keptShingles]]/[[postingLists]]/
    * intersection counts, same `maxDf` hot-trigram cap and exactness
    * contract); each unordered intersection row fans out to its two
    * directions in-row, so the asymmetric score costs nothing extra. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Int = DefaultMaxDf): DataFrame = {
    val kept = pin(keptShingles(docs, idCol, textCol, maxDf))
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = interCounts(postingLists(kept))
    inter
      .select(explode(array(
        struct(col("d1").as("src"), col("d2").as("ref")),
        struct(col("d2").as("src"), col("d1").as("ref")))).as("e"), col("i"))
      .select(col("e.src").as("src"), col("e.ref").as("ref"), col("i"))
      .join(sizes.select(col("id").as("src"), col("n")), "src")
      .select(col("src"), col("ref"),
        round(col("i") / col("n"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** EXACT SUBSTRING dedup (the suffix-array method of "Deduplicating
    * Training Data Makes Language Models Better", re-expressed for Spark):
    * find, per document, the maximal spans whose every `minLen`-char
    * window also appears in ANOTHER document — i.e. verbatim text shared
    * across documents, the kind MinHash's whole-doc granularity cannot
    * see. A substring of length ≥ minLen is duplicated iff all its
    * length-minLen windows are, so position windows + run merging find
    * exactly the spans a suffix array would, with only distributed
    * primitives:
    *
    *  1. every start position's `minLen`-window (in-row `transform` over
    *     `sequence` — the array feeds the HOF once; O(chars·minLen) work,
    *     no shuffle);
    *  2. windows seen in >1 distinct doc (one hash-aggregate keyed on
    *     xxhash64 of the window — 8 bytes/key instead of minLen chars,
    *     accepting 2^-64 collision odds to cut shuffle bytes);
    *  3. mark those positions, merge consecutive runs per doc
    *     (gaps-and-islands over a per-doc window — the only per-doc
    *     state is a row_number).
    *
    * Returns (id, span_start, span_end) with span_end exclusive; spans
    * shorter than minLen cannot exist by construction. The windows frame
    * feeds BOTH the duplicate-window aggregate and the mark join (pinned —
    * self-join lineage re-execution, see [[pin]]). */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int): DataFrame = {
    val docsWide = spread(docs.filter(length(col(textCol)) >= minLen))
    // Windows are keyed by xxhash64 from the start: 8 bytes per key instead
    // of minLen chars, so the duplicate-window aggregate and the mark join
    // shuffle a fixed-width integer regardless of minLen (2^-64 collision
    // odds — a colliding window is marked duplicated, never dropped text
    // corrupted, since spans only gate removal downstream).
    // r15: native fused window-hash kernel. The HOF form
    // (transform(sequence(...), i -> xxhash64(substring(text, i+1, minLen))))
    // re-seeks the code-point boundary from byte 0 on every substring call
    // — O(chars²) per document; the kernel walks boundaries once and
    // hashes byte ranges in place (bit-identity pinned in
    // ShingleExpressionsSpec; the length >= minLen filter above is the
    // kernel's contract for short docs).
    def wins = docsWide
      .select(col(idCol).as("id"),
        posexplode(graft.functions.Shingles.windowHashes(col(textCol), minLen)))
      .toDF("id", "pos", "wkey")
    // "seen in >1 doc" is min(id) ≠ max(id) — two cheap partial aggregates
    // with full map-side combine, NOT countDistinct (whose distinct
    // pre-shuffle doubles the exchange). dupWins is NOT force-broadcast:
    // on boilerplate-heavy corpora (templated text, crawl headers) most
    // windows are cross-doc shared, so dupWins approaches the window
    // universe and a broadcast build is a driver OOM at scale. AQE picks
    // broadcast when dupWins is genuinely small (this corpus: 4.5% of
    // distinct windows at sf0.01 AND sf0.1 — ratio scale-stable) and a
    // shuffled hash join when it isn't — see SCALE.md "substring-dedup
    // dupWins sizing" for the measurements behind dropping the hint.
    val dupWins = wins.groupBy("wkey")
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("wkey")
    val marked = wins.join(dupWins, "wkey").select("id", "pos")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    marked
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + minLen).as("span_end"))
      .drop("grp")
  }

  /** APPLY substring dedup — the cut step of the suffix-array method
    * ("Deduplicating Training Data Makes Language Models Better" removes
    * the duplicated spans it finds; [[substringSpans]] only locates them).
    * Stitches each document's non-duplicated segments back together.
    *
    * Spans are per-run maximal but MAY OVERLAP across runs: each run of
    * marked positions extends `minLen` chars past its last start, so two
    * runs separated by a small gap of unmarked positions produce character
    * spans that overlap. The in-row stitcher therefore carries a running
    * cursor (`greatest(cur, span_end)`) — interval union, not naive
    * concatenation — and `substring` with a non-positive length yields ""
    * for contained spans.
    *
    * Scale shape: one hash-aggregate packs spans to a per-doc sorted list
    * (spans per doc are few — boilerplate runs, not the window universe),
    * then ONE equi-join back to the corpus and a single in-row
    * `aggregate` HOF does all stitching — no explode, no window function,
    * no per-segment shuffle. Docs with no spans pass through unchanged via
    * the left join. Returns (idCol, clean_text, removed_chars). */
  def removeSpans(docs: DataFrame, spans: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spanList = spans.groupBy(col("id").as(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").cast("int").as("s"),
        col("span_end").cast("int").as("e")))).as("sp"))
    docs.join(spanList, Seq(idCol), "left_outer")
      .withColumn("clean_text", expr(
        s"""aggregate(
           |  coalesce(sp, CAST(array() AS array<struct<s:int,e:int>>)),
           |  named_struct('cur', 0, 'acc', ''),
           |  (st, x) -> named_struct(
           |    'cur', greatest(st.cur, x.e),
           |    'acc', concat(st.acc,
           |      substring($textCol, st.cur + 1, x.s - st.cur))),
           |  st -> concat(st.acc, substring($textCol, st.cur + 1)))""".stripMargin))
      .select(col(idCol), col("clean_text"),
        (length(col(textCol)) - length(col("clean_text")))
          .cast("long").as("removed_chars"))
  }
}
