package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TopKByScore}

/** Product quantization (PQ) — the memory-compression half of a
  * production ANN index (IVF gives the candidate pruning, PQ shrinks each
  * candidate from `dims · 4` bytes to `m` code bytes so a 100 TB corpus'
  * index fits in cluster RAM).
  *
  * The embedding is split into `m` contiguous subvectors of `dims / m`
  * floats; each subspace gets its own deterministic k-means codebook
  * ([[Similarity.kmeans]] contract: lowest-id init, fixed iterations,
  * rounded float32 centroids), and a vector is stored as the `m` nearest
  * sub-centroid ids. Search is ADC (asymmetric distance computation): the
  * query stays full-precision, one `m × ksub` lookup table of exact
  * query-to-sub-centroid distances is built per query, and a candidate's
  * approximate distance is the sum of `m` table lookups — no decode, no
  * float math per candidate beyond `m` adds.
  *
  * Scale shape: codebooks are `m · ksub` rows (KBs) collapsed to ONE
  * broadcast array row, so encoding is map-only over the corpus (the corpus
  * never shuffles — same posture as [[Similarity.ivfAssign]]); the per-query
  * LUT set is |queries| rows and broadcasts into the code scan; the only
  * exchange in search is the bounded-heap [[TopKByScore]] partial aggregate
  * (≤ k rows per query per partition). Subspace codebooks train
  * independently — on a real cluster the `m` k-means runs are parallel jobs
  * over the same cached corpus.
  *
  * Determinism contract (what makes the DuckDB oracle replayable): all
  * distances are `round(·, 6)`; argmins break ties on the lower code id;
  * ADC sums are re-rounded to 6 decimals; top-k ties break on the lower
  * candidate id.
  */
object Pq {

  /** Per-subspace codebooks: `(subspace, code, embedding)` with
    * `embedding` the `dims/m`-float sub-centroid. Code ids are the k-means
    * cluster ids (init vector ids — clusters that lose every vector drop
    * out, identical to [[Similarity.kmeans]]). */
  def pqTrain(corpus: DataFrame, m: Int, dims: Int, ksub: Int, iters: Int): DataFrame = {
    val dsub = dims / m
    require(dsub * m == dims, s"dims=$dims not divisible by m=$m")
    // pinned like [[Similarity.kmeans]]'s result: the m·ksub-row codebook
    // feeds encode AND search branches; unpinned, every consumer would
    // replay all m training chains
    Dedup.pin((0 until m).map { s =>
      val sub = corpus.select(col("vec_id"),
        slice(col("embedding"), s * dsub + 1, dsub).as("embedding"))
      Similarity.kmeans(sub, ksub, iters)
        .select(lit(s).as("subspace"), col("cluster_id").cast("int").as("code"),
          col("embedding"))
    }.reduce(_ unionByName _))
  }

  /** Codebook collapsed to ONE broadcast row holding a (subspace, code)-
    * sorted `array<struct<subspace, code, ce>>` — the same shape as
    * [[Similarity]]'s centroid array, so encode/LUT are per-row folds, not
    * joins. Pinned ([[Dedup.pin]]) for the same reason as
    * [[Similarity.centroidArray]]: encode and LUT branches each fold the
    * row, and an unpinned use replays all `m` [[pqTrain]] k-means chains
    * per branch — the dominant cost of every `x_pq_*`/`x_sim_ivfpq_*`
    * query when run cold. */
  private def codebookArray(codebook: DataFrame): DataFrame =
    Dedup.pin(codebook.agg(array_sort(collect_list(struct(
      col("subspace").cast("int").as("subspace"), col("code").cast("int").as("code"),
      col("embedding").as("ce")))).as("cb")))

  /** Subvector `s` of embedding `e` (1-based slice over `dsub` floats);
    * `s` may be a lambda-bound column. */
  private def subvec(e: Column, s: Column, dsub: Int): Column =
    slice(e, s * dsub + 1, lit(dsub))

  /** Nearest code in subspace `s` for embedding `e`: argmin of (rounded
    * dist², code) over the in-scope broadcast `cb` array. */
  private def nearestCode(e: Column, s: Column, dsub: Int): Column =
    array_min(transform(
      filter(col("cb"), c => c.getField("subspace") === s),
      c => struct(
        round(GraftFunctions.l2Sq(subvec(e, s, dsub), c.getField("ce")), 6).as("dist2"),
        c.getField("code").as("code")))).getField("code")

  /** PQ encode: `(vec_id, codes)` with `codes` an `array<int>` of length
    * `m` — subspace s's nearest sub-centroid id. Map-only over the corpus
    * (broadcast codebook fold); at 100 TB this is the pass that writes the
    * compact index, and the corpus never shuffles. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int, dims: Int): DataFrame = {
    val dsub = dims / m
    corpus.select(col("vec_id"), col("embedding").as("ve"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(m - 1)),
          s => nearestCode(col("ve"), s, dsub)).as("codes"))
  }

  /** ADC search: approximate L2² top-k of every query against the PQ
    * `codes` table. Per query one exact `m × ksub` LUT (subspace → code →
    * rounded dist²) is built against the broadcast codebook; a candidate's
    * distance is the rounded sum of its `m` looked-up entries — `zip_with`
    * over (codes, lut) + `aggregate`, all codegen-friendly Column ops.
    * Output: `(qid, cid, adc, rank)` with rank 1 = nearest, ties on the
    * lower cid, self-matches excluded. */
  def pqSearchADC(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
      m: Int, dims: Int, k: Int): DataFrame = {
    val dsub = dims / m
    val qlut = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(codebookArray(codebook)))
      .select(col("qid"),
        transform(sequence(lit(0), lit(m - 1)), s =>
          map_from_entries(transform(
            filter(col("cb"), c => c.getField("subspace") === s),
            c => struct(c.getField("code"),
              round(GraftFunctions.l2Sq(subvec(col("qe"), s, dsub),
                c.getField("ce")), 6))))).as("lut"))
    codes.crossJoin(broadcast(qlut))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(aggregate(
          zip_with(col("codes"), col("lut"), (cd, mp) => element_at(mp, cd)),
          lit(0.0), (acc, v) => acc + v), 6).as("adc"))
      // negate: TopKByScore keeps (score desc, id asc) = (adc asc, cid asc)
      .groupBy("qid")
      .agg(TopKByScore.topKByScore(-col("adc"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        round(-col("col.score"), 6).as("adc"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact L2² top-k ground truth (the brute-force counterpart of
    * [[Similarity.cosineTopK]] under the squared-L2 metric ADC
    * approximates). Same broadcast-queries / heap-aggregate shape. */
  def l2TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(GraftFunctions.l2Sq(col("qe"), col("ce")), 6).as("dist2"))
      .groupBy("qid")
      .agg(TopKByScore.topKByScore(-col("dist2"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        round(-col("col.score"), 6).as("dist2"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** TWO-STAGE SEARCH: ADC shortlist → EXACT re-rank — the production ANN
    * retrieval shape (compressed first pass over everything, full-precision
    * refinement over almost nothing). Stage 1 takes the top-`shortlist`
    * candidates per query by ADC (m table-lookup adds per candidate);
    * stage 2 computes exact L2² ONLY for those `|queries| · shortlist`
    * rows — the corpus' full-precision vectors are touched for shortlist
    * members alone, which is what makes re-ranking affordable when the
    * corpus itself no longer fits in RAM uncompressed. Recall approaches
    * the shortlist's COVERAGE (a true neighbor missing from the shortlist
    * is unrecoverable; one inside it is always re-ranked into place), so
    * shortlist size is the recall/cost knob. Output: exact-distance top-k,
    * same shape/tiebreaks as [[l2TopK]]. */
  def pqRerank(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      m: Int, dims: Int, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val codes = pqEncode(corpus, codebook, m, dims)
    val cand = pqSearchADC(queries, codes, codebook, m, dims, shortlist)
      .select(col("qid"), col("cid"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    cand
      .join(corpus.select(col("vec_id").as("cid"), col("embedding").as("ce")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        round(GraftFunctions.l2Sq(col("qe"), col("ce")), 6).as("dist2"))
      .groupBy("qid")
      .agg(TopKByScore.topKByScore(-col("dist2"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        round(-col("col.score"), 6).as("dist2"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF-PQ: the standard FAISS index posture, composed from the two
    * tiers this library already has — IVF prunes WHICH candidates are
    * scanned (only the query's `nprobe` nearest cells), PQ shrinks WHAT is
    * read per candidate (m code bytes + LUT adds instead of a full-vector
    * distance). At 100 TB neither tier suffices alone: flat PQ still scans
    * every code, IVF with exact distances still reads full vectors.
    *
    * Scale shape: ONE map-only pass computes each corpus vector's IVF cell
    * AND its PQ codes (both the centroid array and the codebook are 1-row
    * broadcast frames folded per row — the corpus never shuffles and is
    * read exactly once); the query side is broadcast-sized (nprobe cell
    * rows + one m×ksub LUT per query); the only exchange is the bounded-
    * heap [[TopKByScore]] partial aggregate. A candidate appears at most
    * once per query (it lives in exactly one cell), so no dedup step.
    *
    * Same determinism contract as the component tiers: rounded distances,
    * ties on lower ids — the DuckDB oracle replays cell assignment, probe
    * ranking, and the LUT sums exactly. Output matches [[pqSearchADC]]:
    * `(qid, cid, adc, rank)`. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, dims: Int, k: Int, nprobe: Int): DataFrame = {
    val dsub = dims / m
    val cents = Similarity.centroidArray(centroids)
    val cbArr = codebookArray(codebook)
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ve"))
      .crossJoin(broadcast(cents))
      .crossJoin(broadcast(cbArr))
      .select(col("cid"),
        Similarity.nearest(col("ve")).getField("centroid_id").as("centroid_id"),
        transform(sequence(lit(0), lit(m - 1)),
          s => nearestCode(col("ve"), s, dsub)).as("codes"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .crossJoin(broadcast(cbArr))
      .select(col("qid"),
        explode(slice(array_sort(transform(col("cents"), cc =>
          struct(round(GraftFunctions.l2Sq(col("qe"), cc.getField("ce")), 6).as("dist2"),
            cc.getField("centroid_id").as("centroid_id")))), 1, nprobe))
          .as("probe"),
        transform(sequence(lit(0), lit(m - 1)), s =>
          map_from_entries(transform(
            filter(col("cb"), cc => cc.getField("subspace") === s),
            cc => struct(cc.getField("code"),
              round(GraftFunctions.l2Sq(subvec(col("qe"), s, dsub),
                cc.getField("ce")), 6))))).as("lut"))
      .select(col("qid"), col("probe.centroid_id").as("centroid_id"), col("lut"))
    c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(aggregate(
          zip_with(col("codes"), col("lut"), (cd, mp) => element_at(mp, cd)),
          lit(0.0), (acc, v) => acc + v), 6).as("adc"))
      .groupBy("qid")
      .agg(TopKByScore.topKByScore(-col("adc"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        round(-col("col.score"), 6).as("adc"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF-PQ + exact re-rank: the COMPLETE production retrieval stack
    * (FAISS `IVF…,PQ…` + refine) — IVF prunes which candidates, ADC ranks
    * them from codes alone, and only the top-`shortlist` survivors have
    * their full-precision vectors read for exact ordering. At 100 TB the
    * exact stage touches |queries|·shortlist vectors out of the whole
    * corpus; everything upstream reads codes. Output: exact-distance
    * top-k, same shape/tiebreaks as [[l2TopK]]. */
  def ivfPqRerank(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, dims: Int, shortlist: Int, k: Int,
      nprobe: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist must be >= k=$k")
    val cand = ivfPqTopK(queries, corpus, centroids, codebook, m, dims,
      shortlist, nprobe).select(col("qid"), col("cid"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    cand
      .join(corpus.select(col("vec_id").as("cid"), col("embedding").as("ce")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        round(GraftFunctions.l2Sq(col("qe"), col("ce")), 6).as("dist2"))
      .groupBy("qid")
      .agg(TopKByScore.topKByScore(-col("dist2"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"),
        round(-col("col.score"), 6).as("dist2"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Recall@k of IVF-PQ search against the exact-L2 ground truth — losses
    * from BOTH tiers show up here (a neighbor outside the probed cells is
    * unrecoverable; one inside can still be mis-ranked by quantization).
    * Exact fractions, same contract as [[pqRecall]]/[[Similarity.ivfRecall]]. */
  def ivfPqRecall(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codebook: DataFrame, m: Int, dims: Int, k: Int, nprobe: Int): DataFrame = {
    val truth = l2TopK(queries, corpus, k).select(col("qid"), col("cid"))
    val approx = ivfPqTopK(queries, corpus, centroids, codebook, m, dims, k, nprobe)
      .select(col("qid"), col("cid"), lit(1).as("hit"))
    truth.join(approx, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("hits"))
      .select(col("qid"), col("hits"),
        round(col("hits") / lit(k.toDouble), 6).as("recall"))
  }

  /** Recall@k of ADC search against the exact-L2 ground truth — the
    * compression-loss number a PQ user asks for (the IVF analogue is
    * [[Similarity.ivfRecall]]). Exact fractions: hits INT / constant k. */
  def pqRecall(queries: DataFrame, corpus: DataFrame, codebook: DataFrame,
      m: Int, dims: Int, k: Int): DataFrame = {
    val truth = l2TopK(queries, corpus, k).select(col("qid"), col("cid"))
    val codes = pqEncode(corpus, codebook, m, dims)
    val approx = pqSearchADC(queries, codes, codebook, m, dims, k)
      .select(col("qid"), col("cid"), lit(1).as("hit"))
    truth.join(approx, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("hits"))
      .select(col("qid"), col("hits"),
        round(col("hits") / lit(k.toDouble), 6).as("recall"))
  }
}
