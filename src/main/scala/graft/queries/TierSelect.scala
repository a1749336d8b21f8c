package graft.queries

/** Round 13 (r12 verdict stretch task): the canary battery's documented
  * go/no-go reads as PURE DECISION FUNCTIONS — "2 minutes of canaries,
  * then commit the right machinery" turned from prose into code a
  * pipeline (or [[CanaryBattery]]) can execute. Every threshold is the
  * one the canary's own scaladoc or the recorded demos already state;
  * provenance is cited per function. Unit-tested on the RECORDED
  * readings of all four regimes (driver sf0.001/sf0.01 = growing
  * vocabulary, sf0.1 + the Heaps fixture base = saturated, sf1h = SRP
  * density saturation, sf10 demo = grid NO-GO) in TierSelectSpec.
  */
object TierSelect {

  /** Cap-pressure diagnosis of the FIXED-width SRP tier from
    * x_srp_band_density rows (per band: bucket count and buckets over
    * the cap). "saturated" = average occupancy n/buckets exceeds the
    * maxBucket cap — the r12 "avg occupancy 98 ≫ cap ⇒ recall 0.10"
    * read; "mild" = some hot buckets (the cap drops a small slice, the
    * recall harness prices it — sf0.1's 5-bucket read); "none" =
    * cap-free identical. The DISPATCH itself is
    * [[graft.llm.Similarity.srpAutoTier]] (count rule); saturation here
    * implies the count rule escalated (n > cap·2^bits ≫ 2^8), asserted
    * by [[CanaryBattery]]. */
  def srpCapPressure(nVectors: Long, nBuckets: Seq[Long],
      bucketsOverCap: Seq[Long], cap: Int = 32): String =
    if (nBuckets.isEmpty || nBuckets.max == 0) "none"
    else if (nVectors.toDouble / nBuckets.max > cap) "saturated"
    else if (bucketsOverCap.sum > 0) "mild"
    else "none"

  /** Vocabulary regime from x_heaps_profile's nested 25/50/100% carve
    * (levels ordered, n_shingles and n_postings per level). The
    * canary's scaladoc read verbatim: "n_shingles ~doubling
    * level-over-level = healthy Heaps growth; n_shingles flat while
    * n_postings doubles = saturated". Measured anchors: driver
    * sf0.001/sf0.01 read ×2.7/×2.9 shingle growth (heaps); sf0.1 and
    * the sf1h base read ×1.11 shingles against ×3.9 postings
    * (saturated). */
  def heapsRegime(nShingles: Seq[Long], nPostings: Seq[Long]): String = {
    require(nShingles.nonEmpty && nShingles.size == nPostings.size)
    // INTEGER comparisons (last >= 2·first), not float ratios, so an
    // oracle SQL can compute the identical decision from the identical
    // counts with no representation slack (x_dedup_ngram_auto dispatches
    // on the SAMPLED variant below since round 14; this full-profile
    // read remains the CanaryBattery/x_heaps_profile diagnosis)
    if (nShingles.last >= 2 * nShingles.head) "heaps"
    else if (nPostings.last >= 2 * nPostings.head) "saturated"
    else "undetermined" // degenerate corpus: neither grew across the carve
  }

  /** SAMPLED vocabulary regime (round 14 — the r13 "canary is a full
    * corpus pass" residual): decide from the 25%→50% prefix pair alone,
    * so the canary shingles only the doc_id-even HALF of the corpus and
    * the 100% level is never computed. Thresholds are 3/2 as INTEGER
    * comparisons (the oracle of x_dedup_ngram_auto recomputes them
    * exactly): one corpus DOUBLING shows shingle growth ×1.75-1.90 in
    * the measured heaps regimes (driver sf0.001/sf0.01, hashed-trigram
    * universe) against ×1.09 in the measured saturated regimes (driver
    * sf0.1, sf1h base, sf10 base — postings ×1.97 there), so 1.5 sits
    * an order-of-magnitude-wide margin from both clusters; the full
    * 4× carve's 2.0 threshold would MISREAD a single doubling (heaps
    * growth per doubling is 2^β with β < 1). Either level absent
    * (degenerate carve — no doc_id % 4 = 0 docs, say) returns
    * "undetermined" exactly as the oracle's NULL-comparison falls to its
    * ELSE branch (ADVICE r13: the engine previously read head/last of
    * whatever levels existed and could diverge from the oracle on such
    * corpora). Why not a FIXED-SIZE (truly sublinear) sample: saturation
    * is a corpus-size-vs-vocabulary property — a fixed 5k-doc sample of
    * the 50k-doc saturated corpus reads the 5k-scale curve, which is
    * still growing (the driver's own sf0.01 slice reads "heaps"), so it
    * answers the wrong question; a constant-fraction carve is the floor
    * for this read, and ½ is the fraction with the widest measured
    * separation. */
  def heapsRegimeSampled(l1: Option[(Long, Long)],
      l2: Option[(Long, Long)]): String = (l1, l2) match {
    case (Some((ns1, np1)), Some((ns2, np2))) =>
      if (2 * ns2 >= 3 * ns1) "heaps"
      else if (2 * np2 >= 3 * np1) "saturated"
      else "undetermined"
    case _ => "undetermined"
  }

  /** Shingle width for the inverted-index dedup family, from the
    * vocabulary regime: the saturated regime's documented mitigation is
    * COARSER SHINGLES (x_dedup_ngram_coarse width 5: ×6.97 where
    * width 3 ran ×17.74 — SCALE.md "two adversarial regimes"); the
    * Heaps regime keeps the width-3 default. */
  def shingleWidth(regime: String): Int =
    if (regime == "saturated") 5 else 3

  /** Viral-duplication read from x_exact_dup_profile: a clique larger
    * than the maxBucket cap means the capped tier will DROP mass (the
    * CoarseShingleSpec 40-clique posture) — the capped pipeline default
    * is then mandatory and its recall cost real; below the cap the
    * capped and uncapped passes are identical. */
  def dupCapBinds(maxCopies: Long, cap: Int = 32): Boolean = maxCopies > cap

  /** Spatial-join regime from x_grid_density: on a BOUNDED cell domain,
    * density (and the per-probe candidate bill) grows with the corpus —
    * x_grid_knn's documented quadratic. Decision on the average
    * per-point candidate count 2·pairs/n against a per-probe budget:
    * 64 separates the measured regimes by an order of magnitude each
    * side (1.9 at sf0.001, 35 at sf0.01 — GO; 360 at sf0.1, 1.8e3 at
    * sf1h, 3.6e4 at the sf10 demo's 27e9-pair NO-GO read — quadratic:
    * re-cell or commit the co-location short-circuit first). Since
    * round 14 this read is WIRED to a registered dispatch —
    * x_grid_knn_auto chooses the formulation via the integer form
    * [[gridRegimeExact]]; this double form serves recorded-reading
    * replays. */
  def gridRegime(nPoints: Long, candidatePairs: Double,
      budgetPerPoint: Int = 64): String =
    if (nPoints > 0 && 2.0 * candidatePairs / nPoints > budgetPerPoint)
      "quadratic"
    else "linear"

  /** [[gridRegime]] in PURE INTEGER form (2·pairs > 64·n — the same
    * inequality cleared of the division) for the x_grid_knn_auto
    * dispatch, where the oracle SQL must compute the IDENTICAL decision
    * with no float-rounding slack near the boundary. Counts up to 2⁵³
    * agree with the double form everywhere; past it only this form is
    * exact. */
  def gridRegimeExact(nPoints: Long, candidatePairs: Long,
      budgetPerPoint: Int = 64): String =
    if (nPoints > 0 && 2 * candidatePairs > budgetPerPoint.toLong * nPoints)
      "quadratic"
    else "linear"

  /** IVF probe width from the MEASURED bounded-probe recall canary (the
    * x_sim_ivf_recall read, round 14): mean recall@k over the probe set
    * below the 0.9 target escalates to the registered nprobe=4 tier
    * (the documented lever — the sweep on this corpus reads 0.833 at
    * nprobe 1-3, 0.933 at 4; SCALE.md / x_sim_ivf_nprobe). INTEGER
    * comparison 10·Σhits ≥ 9·(k·|probes|), identically computable in
    * the x_sim_ivf_auto oracle. An empty probe set escalates (the
    * oracle's NULL comparison falls to its ELSE branch — nothing is
    * returned either way). */
  def ivfNprobe(sumHits: Long, nProbeRows: Long, k: Int = 3): Int =
    if (nProbeRows > 0 && 10 * sumHits >= 9 * k * nProbeRows) 1 else 4
}
