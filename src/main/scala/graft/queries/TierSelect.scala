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
    // INTEGER comparisons (last >= 2·first), not float ratios, so the
    // oracle SQL of x_dedup_ngram_auto computes the identical decision
    // from the identical counts with no representation slack
    if (nShingles.last >= 2 * nShingles.head) "heaps"
    else if (nPostings.last >= 2 * nPostings.head) "saturated"
    else "undetermined" // degenerate corpus: neither grew across the carve
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
    * re-cell or commit the co-location short-circuit first). */
  def gridRegime(nPoints: Long, candidatePairs: Double,
      budgetPerPoint: Int = 64): String =
    if (nPoints > 0 && 2.0 * candidatePairs / nPoints > budgetPerPoint)
      "quadratic"
    else "linear"
}
