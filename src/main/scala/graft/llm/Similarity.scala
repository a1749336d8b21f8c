package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products / norms are higher-order-function Column expressions
  * (`zip_with` + `aggregate`) — codegen'd, no UDF, accumulation in DOUBLE in
  * array order (deterministic). Cosines are rounded to 6 decimals before
  * ranking so results are reproducible across engines; ties break on the
  * candidate id.
  *
  * Scale paths:
  *   - brute-force top-k: broadcast the (small) query set, scan candidates
  *     once, per-query top-k — O(|queries|·|corpus|) dot products but a
  *     single pass over the corpus, no shuffle of the corpus itself;
  *   - IVF: assign every vector to its nearest centroid by folding over a
  *     broadcast centroid array (map-only, the corpus never shuffles), then
  *     search only the probed cluster — a query touches 1/k of the data;
  *   - sign-LSH (random hyperplanes): bucket by sign bits, search in-bucket.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in DOUBLE, sequential in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Rounded cosine similarity — backed by the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression (single fused loop in
    * whole-stage codegen; bit-identical to the HOF formulation
    * `dot/(norm·norm)`, asserted in VectorExpressionsSpec). */
  def cosine(a: Column, b: Column, scale: Int = 6): Column =
    round(graft.functions.GraftFunctions.cosineSim(a, b), scale)

  /** Brute-force cosine top-k: for every row of `queries`, the k nearest
    * rows of `corpus` (excluding itself when ids collide). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k via the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate instead of a window:
    * partial (map-side) aggregation ships k rows per query per partition to
    * the exchange, where the window formulation shuffles EVERY scored
    * candidate. Result-identical to [[cosineTopK]] (same tie order). */
  def cosineTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topKByScore(col("cos"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Centroid set collapsed to ONE row holding a centroid_id-sorted
    * `array<struct<centroid_id, ce>>` — broadcast to every task so
    * assignment is a per-row argmin, not a join. The centroid count is the
    * IVF fan-out (hundreds to thousands), always broadcastable.
    *
    * Pinned ([[Dedup.pin]], lazy checkpoint): every search query folds
    * this row into BOTH its corpus and query branches, and when the
    * centroids come from [[kmeans]] each unpinned use would replay the
    * whole training chain (measured: x_sim_ivf_trained 3.4 s → 1.9 s
    * isolated). 1-row frame — checkpoint cost is nil. */
  private[llm] def centroidArray(centroids: DataFrame): DataFrame =
    Dedup.pin(centroids.agg(array_sort(collect_list(struct(
      col("vec_id").as("centroid_id"), col("embedding").as("ce")))).as("cents")))

  /** `struct(dist2, centroid_id)` of the centroid in the in-scope `cents`
    * array nearest to embedding `e`: one distance per centroid via the
    * native codegen'd [[graft.functions.SquaredL2Distance]] (rounded to 6
    * decimals for cross-engine determinism), then `array_min` under
    * lexicographic struct ordering — exactly
    * `ORDER BY dist2, centroid_id LIMIT 1`. */
  private[llm] def nearest(e: Column): Column =
    array_min(transform(col("cents"), c =>
      struct(round(graft.functions.GraftFunctions.l2Sq(e, c.getField("ce")), 6).as("dist2"),
        c.getField("centroid_id").as("centroid_id"))))

  /** IVF coarse quantization: nearest centroid per vector by (rounded)
    * squared L2 distance, centroid id breaking ties.
    *
    * Map-only: centroids collapse to one broadcast array row and every
    * vector folds over it locally — zero shuffle of the corpus, where the
    * crossJoin + per-vector window alternative shuffles and sorts
    * |corpus|·|centroids| scored rows. At 100 TB the corpus never moves. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding").as("ve"))
      .crossJoin(broadcast(centroidArray(centroids)))
      .select(col("vec_id"), nearest(col("ve")).as("best"))
      .select(col("vec_id"), col("best.centroid_id").as("centroid_id"),
        col("best.dist2").as("dist2"))

  /** IVF search: top-k among candidates sharing the query's centroid.
    *
    * Scale shape: both sides assign map-only (broadcast centroid array),
    * the (small) query set broadcasts into the corpus scan, and the per-
    * query top-k is the bounded-heap [[graft.functions.TopKByScore]]
    * aggregate — the single exchange carries ≤ k rows per query per
    * partition instead of every scored candidate. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, k: Int): DataFrame = {
    val cents = centroidArray(centroids)
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .crossJoin(broadcast(cents))
      .select(col("cid"), col("ce"), nearest(col("ce")).getField("centroid_id").as("centroid_id"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), nearest(col("qe")).getField("centroid_id").as("centroid_id"))
    c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topKByScore(col("cos"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** IVF search probing the `nprobe` NEAREST cells instead of only the
    * query's own (the recall lever documented in SCALE.md): the query side
    * explodes into `nprobe` (qid, centroid) rows — still a broadcast-sized
    * set — while the corpus keeps its single map-only cell assignment, so
    * candidates grow ~linearly in nprobe and the corpus still never
    * shuffles. `nprobe = 1` degenerates to [[ivfTopK]]; `nprobe = nlist`
    * is brute force. Probe ranking uses the same (rounded dist²,
    * centroid id) order as assignment, so results stay deterministic. */
  def ivfTopKProbed(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroidArray(centroids)
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"))
      .crossJoin(broadcast(cents))
      .select(col("cid"), col("ce"), nearest(col("ce")).getField("centroid_id").as("centroid_id"))
    val probes = slice(array_sort(transform(col("cents"), cc =>
      struct(round(graft.functions.GraftFunctions.l2Sq(col("qe"), cc.getField("ce")), 6).as("dist2"),
        cc.getField("centroid_id").as("centroid_id")))), 1, nprobe)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"),
        explode(transform(probes, s => s.getField("centroid_id"))).as("centroid_id"))
    c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topKByScore(col("cos"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Hard-negative mining for contrastive training (the ANCE posture,
    * arXiv:2007.00808: negatives retrieved from the ANN index, not sampled
    * at random): for each anchor, the top-k most-cosine-similar corpus
    * vectors whose `label` DIFFERS from the anchor's — the negatives that
    * actually move a contrastive loss, where [[graft.llm.Sampling]]'s
    * `negativeSamples` picks pseudo-random ones.
    *
    * The candidate gate is the IVF cell ([[ivfTopK]]'s shape): both sides
    * assign map-only against the broadcast centroid array, the anchor set
    * broadcasts into the corpus scan, and the label-mismatch filter rides
    * the same join — so the corpus never shuffles and per-anchor ranking
    * is the bounded-heap [[graft.functions.TopKByScore]] aggregate (≤ k
    * rows per anchor per partition cross the exchange). Restricting
    * negatives to the anchor's own cell is the point, not a shortcut:
    * out-of-cell vectors are far by construction and would rank below the
    * heap anyway. Anchors whose cell holds only same-label vectors emit
    * nothing (no negative exists locally — callers widen via nprobe). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int): DataFrame = {
    val cents = centroidArray(centroids)
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("label").as("clabel"))
      .crossJoin(broadcast(cents))
      .select(col("cid"), col("ce"), col("clabel"),
        nearest(col("ce")).getField("centroid_id").as("centroid_id"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("qlabel"),
        nearest(col("qe")).getField("centroid_id").as("centroid_id"))
    c.join(broadcast(q), Seq("centroid_id"))
      .filter(col("qid") =!= col("cid") && col("clabel") =!= col("qlabel"))
      .select(col("qid"), col("cid"), cosine(col("qe"), col("ce")).as("cos"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore.topKByScore(col("cos"), col("cid"), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("cid"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — the
    * TRAINING step that produces real IVF centroids (the `x_sim_ivf_*`
    * queries take centroids as given; this is where they come from).
    *
    * Deterministic by construction, so a SQL oracle can replay it exactly:
    * init = the k lowest-id vectors, a FIXED iteration count, assignment
    * by (rounded dist², centroid id) argmin — the same contract as
    * [[ivfAssign]] — and recomputed centroids rounded to 6 decimals then
    * cast through float32 (both engines perform the identical IEEE
    * narrowing, and [[graft.functions.SquaredL2Distance]] wants
    * `array<float>` anyway).
    *
    * Scale shape per iteration: assignment is the map-only broadcast-
    * centroid fold (corpus never shuffles); the recompute is one
    * positional explode + (cluster, dim) hash aggregate — dim·n rows into
    * a k·dim-group aggregate, partial-agg bounded. Nothing driver-side at
    * all until the caller collects the k·dim centroid table. A cluster
    * that loses every vector drops out (inner-join recompute) — identical
    * behavior in the oracle. */
  def kmeans(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    // the returned k-row table is pinned (lazy checkpoint): training
    // artifacts are consumed by several downstream branches (assignment,
    // probe ranking, recall's approx side) and an unpinned result would
    // replay all `iters` rounds once per consumer
    var cents = corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster_id"), col("embedding"))
    for (_ <- 1 to iters) {
      // assignment carries the embedding through instead of re-joining the
      // corpus on vec_id afterwards — the old shape shuffled the WHOLE
      // corpus once per iteration just to re-attach a column the map-only
      // assignment already had in hand (guide §2.4: remove shuffles
      // outright). Same values feed the same per-(centroid,pos) averages.
      val assigned = corpus.select(col("embedding").as("ve"))
        .crossJoin(broadcast(centroidArray(
          cents.select(col("cluster_id").as("vec_id"), col("embedding")))))
        .select(nearest(col("ve")).getField("centroid_id").as("centroid_id"),
          col("ve"))
      cents = assigned
        .select(col("centroid_id"), posexplode(col("ve")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(round(avg(col("col")), 6).as("c"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c").cast("float")).as("embedding"))
        .select(col("centroid_id").as("cluster_id"), col("embedding"))
    }
    Dedup.pin(cents)
  }

  /** Recall@k of IVF search against the brute-force ground truth — the
    * first number an ANN user asks for. Per query: |ivfTopK ∩ cosineTopK|/k
    * as an exact fraction (hits is an integer, k a constant, so the
    * division is deterministic across engines).
    *
    * Cost shape: the ground-truth side IS the brute-force scan, so this is
    * a measurement query you run on a sample of queries, not the serving
    * path. Recall here is the nprobe=1 floor (only the query's own cell is
    * searched); searching the p nearest cells multiplies candidates by
    * ~p/nlist and recovers the neighbors that fell across a Voronoi
    * boundary — the recall/nprobe tradeoff documented in SCALE.md. */
  def ivfRecall(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val truth = cosineTopK(queries, corpus, k).select(col("qid"), col("cid"))
    val search =
      if (nprobe <= 1) ivfTopK(queries, corpus, centroids, k)
      else ivfTopKProbed(queries, corpus, centroids, k, nprobe)
    val approx = search.select(col("qid"), col("cid"), lit(1).as("hit"))
    truth.join(approx, Seq("qid", "cid"), "left")
      .groupBy("qid")
      .agg(sum(coalesce(col("hit"), lit(0))).cast("int").as("hits"))
      .select(col("qid"), col("hits"),
        round(col("hits") / lit(k.toDouble), 6).as("recall"))
  }

  /** Sign-LSH bucket id from `nPlanes` deterministic pseudo-random
    * hyperplanes: plane i, dim j has weight ((i·64+j)·2654435761 mod 1000)
    * / 1000 − 0.5 (exact rational — reproducible in SQL). */
  def lshBucket(embedding: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { i =>
      val proj = aggregate(
        zip_with(embedding, sequence(lit(i * dims), lit(i * dims + dims - 1)),
          (x, idx) => x.cast("double") * ((idx * 2654435761L % 1000).cast("double") / 1000 - 0.5)),
        lit(0.0), (acc, v) => acc + v)
      when(round(proj, 6) > 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** Embedding near-dup pairs: bucket by sign-LSH, verify cosine ≥ threshold
    * only within buckets (no all-pairs join). Library surface; since
    * round 12 the REGISTERED embedding near-dup default is
    * [[srpNearDups]] with bandBits sized to the corpus and a `maxBucket`
    * cap — with a small constant `nPlanes` this function's 2^nPlanes
    * buckets make Σ bucket² grow ∝ corpus² at any duplication level
    * (BENCH_SF1_r11 measured the 4-plane registration ×20 at a ×10
    * scale-up), so size nPlanes ≈ log2(corpus) if you use it directly. */
  def embeddingNearDups(corpus: DataFrame, nPlanes: Int, dims: Int,
      threshold: Double): DataFrame = {
    val b = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes, dims).as("bucket"))
      // pinned for both sides of the bucket self-join; see [[Dedup.pin]]
      // for the lifecycle (lazy checkpoint, blocks GC-reclaimed)
      .transform(Dedup.pin)
    val l = b.select(col("bucket"), col("vec_id").as("d1"), col("embedding").as("e1"))
    val r = b.select(col("bucket"), col("vec_id").as("d2"), col("embedding").as("e2"))
    l.join(r, Seq("bucket")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Banded SRP (sign-random-projection) signatures: `bands` band values
    * per vector, each packing `bandBits` hyperplane sign bits, computed in
    * ONE scan-local projection. Two determinism levers vs [[lshBucket]]:
    * the hyperplane weights are ±1 from a pure-integer bit mix
    * (replayable in any engine), and the projections run over
    * round(e·1000) INTEGER quantizations, so the sign of a near-zero dot
    * can never differ between engines' float summation orders.
    *
    * The weight bit is an xorshift-multiply MIX of the plane-dim index,
    * not a raw LCG bit (round-12 fix): bit 20 of the affine sequence
    * a·idx + c is heavily structured across the dim stride — measured
    * inter-plane weight agreement ranged 14/64 to 51/64 (h₂ ≈ −h₁,
    * h₀ ≈ h₈), so nominal bandBits carried only a few EFFECTIVE bits,
    * buckets concentrated ~7× over uniform at any width, and widening
    * bands could not raise recall (the SrpSizingProbe plateau). The mix
    * (h ← a·idx+c mod 2³¹; h ← xor(h, h ≫ 15)·2654435761 mod 2³¹;
    * bit = h ≫ 10 mod 2) measures 31.8/64 mean pairwise agreement
    * (ideal 32, binomial spread) — full-entropy bands.
    *
    * The weight matrix is DATA-INDEPENDENT, so it is evaluated from
    * [[srpWeight]] at plan-build time — the mixing arithmetic never runs
    * per row (the oracle text still spells out the formula, which pins
    * the matrix to the shared integer algebra).
    *
    * Round 13: the whole signature pass is the native codegen'd
    * [[graft.functions.SrpSignatures]] expression (quantize each dim
    * once, then one fused Java triple loop with the weight matrix as a
    * reference object) — the previous formulation, nested
    * `transform`/`aggregate` HOFs over a planes·dims-element ±1 literal
    * with per-element `element_at`, was interpreted per row, re-ran the
    * quantization round inside the innermost loop, and (CodegenFallback)
    * barred its Project from whole-stage codegen; it made the (64, 16)
    * sized tier the slowest query in the suite (74.8 s at sf1h,
    * BENCH_SF1_r12). Results are bit-identical: the quantization
    * replicates Spark's `CAST(round(CAST(x AS DOUBLE) * 1000.0) AS
    * BIGINT)` exactly, BigDecimal-HALF_UP tie window included
    * ([[graft.functions.SrpSignatures.quantize]]); VectorExpressionsSpec
    * asserts equality against the retired HOF formulation, and the
    * DuckDB oracles gate it end-to-end. */
  def srpSignatures(corpus: DataFrame, planes: Int, bandBits: Int,
      dims: Int): DataFrame =
    corpus.select(col("vec_id"),
      posexplode(graft.functions.GraftFunctions.srpSigs(col("embedding"),
        planes, bandBits, dims)).as(Seq("band", "sig")))

  /** The SRP hyperplane weight bit for flat index plane·dims + k — the
    * xorshift-multiply mix documented on [[srpSignatures]], evaluated
    * once at plan build. Public so spec replays and sizing tools share
    * the exact integer algebra; delegates to
    * [[graft.functions.SrpSignatures.weight]], the same matrix the
    * native expression holds. */
  def srpWeight(idx: Long): Boolean =
    graft.functions.SrpSignatures.weight(idx)

  /** Banded SRP-LSH near-dup pairs — the OR-amplified recall upgrade of
    * [[embeddingNearDups]]'s single AND-bucket: a pair is a candidate if
    * it agrees on ANY of the `planes/bandBits` band signatures (for
    * cosine-similar pairs each band agrees with prob ≈ (1−θ/π)^bandBits,
    * and OR across bands amplifies recall), then exact cosine ≥ `tau`
    * verifies within candidates only. Per-band buckets have
    * 2^bandBits × bands keys; candidate volume is Σ bucket²  — the banded
    * LSH bound, no all-pairs join. False positives cost only the verify
    * cosine, never correctness. */
  def srpNearDups(corpus: DataFrame, planes: Int, bandBits: Int,
      dims: Int, tau: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    // maxBucket: same hard bound as Dedup.minHashNearDups — a fixed
    // bandBits means bucket DENSITY (not count) grows with the corpus, so
    // at scale either widen bandBits with log2(n) or cap the hot buckets;
    // buckets over the cap are anti-joined away before the self-join
    // (recall trade; bit-identical below the cap, no plan nodes added at
    // the default).
    val sigAll = srpSignatures(corpus, planes, bandBits, dims)
      .transform(Dedup.pin)
    val sig =
      if (maxBucket == Int.MaxValue) sigAll
      else {
        val hot = sigAll.groupBy("band", "sig")
          .agg(count(lit(1)).as("n")).filter(col("n") > maxBucket)
          .select("band", "sig")
        sigAll.join(hot, Seq("band", "sig"), "left_anti")
      }
    val l = sig.select(col("band"), col("sig"), col("vec_id").as("d1"))
    val r = sig.select(col("band"), col("sig"), col("vec_id").as("d2"))
    // OR across bands: a pair matching 2+ bands counts once. Only the id
    // pair rides the candidate exchange and the distinct hash — the
    // embeddings are re-attached AFTER (round-12: previously both 64-dim
    // arrays were carried through the band join and the distinct,
    // multiplying the shuffle width severalfold at scale for no semantic
    // gain; the oracle always had this reattach shape). The signature
    // frame is pinned, so the reattach scans re-derive only the corpus's
    // own lineage (scan-local at 100 TB), not the projections.
    val cand = l.join(r, Seq("band", "sig")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    val e = corpus.select(col("vec_id"), col("embedding"))
    cand
      .join(e.select(col("vec_id").as("d1"), col("embedding").as("e1")), "d1")
      .join(e.select(col("vec_id").as("d2"), col("embedding").as("e2")), "d2")
      .select(col("d1"), col("d2"), cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** Mechanized SRP tier selection (round 13; a LADDER since round 14 —
    * closes the r13 "the auto tier clamps at 16 bits" residual):
    * bandBits ≈ ceil(log₂ n) rounded up to the next REGISTERED tier
    * width, i.e. clamp(8, 24) in steps of 8, as integer comparisons both
    * engines can compute identically — n > 2^bits ⟹ the current band
    * space is outnumbered by the corpus, escalate:
    *   n ≤ 2⁸ → (32, 8); 2⁸ < n ≤ 2¹⁶ → (64, 16); n > 2¹⁶ → (144, 24).
    * Each rung escalates a full cap-factor (32×) BEFORE its band space
    * saturates (saturation = avg occupancy n/2^bits > maxBucket, i.e.
    * n > 32·2^bits): the 8-bit tier's recall collapses to ~0.10 at sf1h
    * density (n ≈ 25k ≫ 2⁸) while (64, 16) holds 0.96, and the 16-bit
    * space saturates the same way at n > 32·2¹⁶ ≈ 2.1M, where the
    * 24-bit rung holds (SrpSizingProbe at the ×1000-replica density —
    * the r13 verdict's one-decade-up cliff, now dispatched over).
    * Why 144 planes (6 bands), not the 4-band pattern of the lower
    * rungs: per-band match probability FALLS as bands widen (measured
    * ≈ 0.58 per 24-bit band on the clone families vs ≈ 0.7 per 16-bit
    * band), so a 4-band 24-bit tier reads recall 0.89 (measured,
    * (96, 24)) — below the 0.9 posture; two more OR-amplification
    * bands lift it to 1 − (1 − 0.42)⁶ ≈ 0.96 predicted, 0.97
    * measured. Escalating bandBits must escalate the band COUNT with
    * it — that is the rung's shape, not a tuning knob. This is
    * exactly the go/no-go read x_srp_band_density documents ("avg
    * occupancy ≫ cap ⇒ widen bandBits"), turned from prose into the
    * dispatch x_dedup_srp_auto registers with a triple-branch oracle.
    * `n` is the corpus count — one metadata-cheap pass (parquet
    * footers) at plan build. Past 2⁴⁰ vectors (~10¹² — a corpus three
    * decades beyond the 100 TB design point) the 24-bit rung would
    * saturate too; the generator takes arbitrary (planes, bandBits), so
    * the next rung is one list entry, not new machinery. */
  def srpAutoTier(n: Long): (Int, Int) =
    if (n > 65536) (144, 24) else if (n > 256) (64, 16) else (32, 8)

  /** Prototype-distance filtering (the D4 recipe — "D4: Improving LLM
    * Pretraining via Document De-Duplication and Diversification",
    * Tirumala et al. 2023, arXiv:2308.12284): cluster the embedding
    * space, rank each vector by distance to its own prototype (centroid),
    * and drop BOTH tails per cluster — the nearest `dropNear` fraction
    * (template-like redundancy concentrated around the prototype) and the
    * farthest `dropFar` fraction (outliers/noise). Keeps the diverse
    * middle band. Returns (vec_id, centroid_id, dist2) for survivors.
    *
    * Scale shape: training is [[kmeans]] (pinned), assignment the
    * map-only broadcast-centroid fold — the ranking window is the only
    * corpus exchange, partitioned by cluster, so each sort is
    * |clusterᵢ|-bounded (k scaled √n keeps them executor-sized, the same
    * lever as [[semDedupPairs]]). Cut points are `floor(p·n)` INTEGER
    * ranks — both engines compute the identical double product and
    * floor, so membership is exact, not float-fuzzy. */
  def prototypeFilter(corpus: DataFrame, k: Int, iters: Int,
      dropNear: Double, dropFar: Double): DataFrame = {
    val assigned = ivfAssign(corpus,
      kmeans(corpus, k, iters).select(col("cluster_id").as("vec_id"), col("embedding")))
    val byDist = Window.partitionBy("centroid_id")
      .orderBy(col("dist2"), col("vec_id"))
    assigned
      .withColumn("rk", row_number().over(byDist))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("centroid_id")))
      .filter(col("rk") > floor(lit(dropNear) * col("n")) &&
        col("rk") <= col("n") - floor(lit(dropFar) * col("n")))
      .select(col("vec_id"), col("centroid_id"), col("dist2"))
  }

  /** SemDeDup pair finding ("SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then verify
    * cosine ≥ threshold only WITHIN each cluster. Where [[embeddingNearDups]]
    * buckets by fixed random hyperplanes, this learns the partition from
    * the data — the paper's point is that the cluster structure bounds the
    * quadratic pair blowup to Σ|clusterᵢ|² while catching semantic (not
    * just near-verbatim) duplicates.
    *
    * Scale shape: training is [[kmeans]] (pinned); assignment is the
    * map-only broadcast-centroid fold (the corpus never shuffles to get
    * its cluster id); the within-cluster candidate join is keyed on the
    * cluster id — the single corpus-sized exchange, partitioned by
    * cluster. k is the skew lever: at 100 TB you raise k (FAISS-style
    * √n clustering) so every |clusterᵢ|² block stays executor-sized, and
    * a runaway cluster shows up as one skewed join key that AQE's
    * skew-join splitting already handles. Returns (d1, d2, cos), d1 < d2,
    * rounded cos ≥ threshold. */
  def semDedupPairs(corpus: DataFrame, k: Int, iters: Int,
      threshold: Double): DataFrame = {
    val cents = centroidArray(kmeans(corpus, k, iters)
      .select(col("cluster_id").as("vec_id"), col("embedding")))
    // assignment stays lineage (NOT pinned): both join branches replay a
    // map-only fold over the scan — at 100 TB recomputing that beats
    // materializing a corpus-sized checkpoint
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"),
        nearest(col("embedding")).getField("centroid_id").as("centroid_id"))
    val l = assigned.select(col("centroid_id"), col("vec_id").as("d1"),
      col("embedding").as("e1"))
    val r = assigned.select(col("centroid_id"), col("vec_id").as("d2"),
      col("embedding").as("e2"))
    l.join(r, Seq("centroid_id")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The SemDeDup cut: transitive closure of [[semDedupPairs]] via
    * [[Dedup.clusters]] (pointer-jumping min-label propagation), then keep
    * one representative per semantic cluster ([[Dedup.survivors]] — the
    * min-id member; unpaired vectors pass through). The anti-join keys on
    * vec_id only, so vector payloads never move in the collapse. */
  def semDedup(corpus: DataFrame, k: Int, iters: Int,
      threshold: Double): DataFrame =
    Dedup.survivors(corpus, "vec_id",
      Dedup.clusters(semDedupPairs(corpus, k, iters, threshold)))

  /** Maximal-marginal-relevance selection: greedily pick `k` vectors that
    * balance relevance to the query against redundancy with what's already
    * picked — `score = λ·cos(q, c) − μ·max_{s∈selected} cos(c, s)` — the
    * standard diversity-aware re-rank for retrieval results and for
    * coverage-preserving training-data selection (`λ`/`μ` passed
    * separately, NOT `μ = 1−λ` computed here: `1 − 0.7` is not the double
    * `0.3`, and the oracle writes the literal).
    *
    * Scale shape: the CORPUS work is one scan (relevance cosines against
    * the 1-row broadcast query) feeding a bounded-heap top-`poolSize`
    * (TakeOrderedAndProject) — the greedy loop then runs entirely on the
    * KB pool frame: pairwise pool cosines once, then k argmax steps over
    * ≤poolSize rows each (the same bounded-iteration posture as
    * [[graft.llm.Bpe.train]]'s winner selection; `localCheckpoint` keeps
    * step plans flat). The greedy chain is inherently sequential —
    * bounding the pool is what makes MMR distributable at all. Cosines
    * round to 6dp before any compare (engine-stable ranks).
    */
  def mmrSelect(emb: DataFrame, queryId: Long, poolSize: Int, k: Int,
      lam: Double, mu: Double): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val pool = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        cosine(col("embedding"), col("qe")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(poolSize)
      .localCheckpoint()
    val pc = pool.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(pool.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), cosine(col("ea"), col("eb")).as("c"))
      .localCheckpoint()
    var selected = pool
      .select(col("vec_id"), col("rel"),
        round(lit(lam) * col("rel"), 6).as("score"), lit(1).as("step"))
      .orderBy(col("score").desc, col("vec_id")).limit(1)
      .localCheckpoint()
    for (step <- 2 to k) {
      val maxsim = pc.join(selected.select(col("vec_id").as("b")), "b")
        .groupBy(col("a").as("vec_id")).agg(max(col("c")).as("ms"))
      val scored = pool
        .join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(maxsim, "vec_id")
        .select(col("vec_id"), col("rel"),
          round(lit(lam) * col("rel") - lit(mu) * col("ms"), 6).as("score"),
          lit(step).as("step"))
      selected = selected.unionByName(
          scored.orderBy(col("score").desc, col("vec_id")).limit(1))
        .localCheckpoint()
    }
    selected.select(col("step"), col("vec_id"), col("rel"), col("score"))
  }
}
