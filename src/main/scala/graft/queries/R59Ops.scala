package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-59 batch (round 13): mechanized SRP tier escalation — the last
  * manual step in the embedding near-dup family. Context: the band-density
  * canary (x_srp_band_density) correctly reads "8-bit undersized at sf1h
  * density" and the sized tier (x_dedup_srp_sized) holds 0.96 recall
  * there, but through round 12 nothing WIRED the read to the choice — a
  * 100 TB operator had to know to run the canary and switch (VERDICT r12,
  * "What's wrong" #2). x_dedup_srp_auto closes that: the tier is selected
  * by [[graft.llm.Similarity.srpAutoTier]] — bandBits ≈ ceil(log₂ n)
  * clamped to the two registered tiers, i.e. the single integer
  * comparison n > 2⁸ — computed identically in the engine (two
  * metadata-cheap parquet counts at plan build) and in the oracle (the
  * same two counts in SQL), and the chosen width is part of the OUTPUT
  * (`bandbits`), so the dispatch itself is oracle-gated, not just the
  * winning tier's pairs.
  *
  * Scale shape: identical to the dispatched tier (scan-local native
  * signature pass → capped band join → id-only candidates) plus two
  * O(footer) counts. At 100 TB the count is the same one-pass read any
  * engine needs before sizing an LSH pass; everything downstream is the
  * already-audited capped machinery.
  */
object R59Ops {

  /** The 8-bit tier's capped CTE block with every CTE name suffixed "8"
    * so it can coexist with the 16-bit block inside ONE WITH clause
    * (DuckDB rejects duplicate CTE names). Word-boundary rename over the
    * closed set of CTE names the shared generator emits; the requires
    * fail the build if the generator's names drift. */
  private[queries] val SrpCtesCapped8Renamed: String = {
    // ee0 must precede ee in the alternation (longest-first at 'ee0')
    val names = Seq("ee0", "pert", "ee", "norms", "eq", "proj", "sig",
      "hotsrp", "ksig", "cand", "cdots", "srp")
    val base = R9Ops.srpCappedText(32, 8)
    names.foreach(n => require(base.contains(n + " AS ("),
      s"srpCappedText CTE '$n' moved — update SrpCtesCapped8Renamed"))
    ("""\b(""" + names.mkString("|") + """)\b""").r
      .replaceAllIn(base, m => m.group(1) + "8")
  }

  /** A registered ngram-tier text (both end in the same final-SELECT
    * shape) rewritten as a CTE block ending in `res AS (…)`, with every
    * block-local name suffixed when requested so two tiers coexist in
    * one WITH. The suffix also lands on the in-block shingle column `g`
    * — renamed consistently at its definition and both join sides, so
    * the text stays valid. Surgery on the REGISTERED tier oracles (the
    * SrpCtesCapped8Renamed convention), so the dispatch oracle cannot
    * drift from the tiers it dispatches between. */
  private[queries] def ngramTierCtes(base: String, sfx: String): String = {
    val anchor = "SELECT d1, d2, round"
    val cut = base.lastIndexOf(anchor)
    require(cut > 0 && base.startsWith("WITH "),
      "ngram tier text anchors moved — update ngramTierCtes")
    // plain concatenation, NOT stripMargin: the interpolated tier text
    // contains '||' string-concat operators at line starts, which a
    // stripMargin over the combined string would eat as margin pipes
    val block = base.substring(5, cut).trim + ",\nres AS (\n" +
      base.substring(cut) + ")"
    if (sfx.isEmpty) block
    else """\b(g|sizes|inter|res)\b""".r
      .replaceAllIn(block, m => m.group(1) + sfx)
  }

  /** The dual-width dispatch oracle of x_dedup_ngram_auto: the
    * x_heaps_profile counts (hashed-trigram universe, 25/50/100% carve)
    * decide the width with the SAME integer comparisons as
    * [[TierSelect.heapsRegime]], then both registered tiers' CTE
    * pipelines run, each branch guarded by the decision. */
  private[queries] val NgramAutoSql = {
    val w3 = ngramTierCtes(StarExt.NgramJaccardSql, "")
    val w5 = ngramTierCtes(R56Ops.NgramCoarseSql, "5")
    // the decision CTEs stripMargin'd ALONE; the tier blocks (which
    // contain line-leading '||' concat operators a stripMargin would
    // eat) are concatenated verbatim
    val head =
      s"""WITH ${StarExt.WordShCte},
         |lv AS (SELECT id, sh,
         |  unnest(CASE WHEN id % 4 = 0 THEN [1, 2, 3]
         |    WHEN id % 2 = 0 THEN [2, 3] ELSE [3] END) AS lvl FROM wsh),
         |hp AS (SELECT lvl, CAST(count(DISTINCT sh) AS BIGINT) AS ns,
         |  CAST(count(*) AS BIGINT) AS np FROM lv GROUP BY 1),
         |flag AS (SELECT CASE
         |    WHEN (SELECT ns FROM hp WHERE lvl = 3)
         |      >= 2 * (SELECT ns FROM hp WHERE lvl = 1) THEN 3
         |    WHEN (SELECT np FROM hp WHERE lvl = 3)
         |      >= 2 * (SELECT np FROM hp WHERE lvl = 1) THEN 5
         |    ELSE 3 END AS w),""".stripMargin
    val tail =
      """SELECT CAST(3 AS INTEGER) AS width, d1, d2, jaccard
        |FROM res, flag WHERE flag.w = 3
        |UNION ALL
        |SELECT CAST(5 AS INTEGER) AS width, d1, d2, jaccard
        |FROM res5, flag WHERE flag.w = 5""".stripMargin
    head + "\n" + w3 + ",\n" + w5 + "\n" + tail
  }

  val defs: Seq[QDef] = Seq(

    // AUTO-SIZED SRP-LSH near-dup: the canary's go/no-go read, mechanized.
    // n = |augmented corpus| (base + 1-in-4 clones, the shared fixture);
    // n > 256 (⟺ ceil(log2 n) > 8: the corpus outnumbers the 8-bit band
    // space) escalates to the sized (64, 16) tier, else the (32, 8)
    // default — both with the maxBucket=32 valve. The chosen bandBits is
    // emitted as a column, so the oracle verifies the DISPATCH and the
    // pairs in one hash: its SQL computes the identical integer from the
    // identical counts and unions both tiers' capped CTE pipelines, each
    // guarded by the branch predicate. At the gate scales n = 625/2500
    // → the 16-bit branch runs (the 8-bit branch is exercised by
    // R59OpsSpec on a written small-corpus fixture); at sf1h density the
    // same dispatch keeps recall at 0.96 where the 8-bit default reads
    // ~0.10 — without a human consulting the canary.
    QDef("x_dedup_srp_auto",
      s"""WITH ${R9Ops.srpCappedText(64, 16)},
         |$SrpCtesCapped8Renamed,
         |nv AS (SELECT (SELECT count(*) FROM embeddings)
         |  + (SELECT count(*) FROM embeddings WHERE vec_id % 4 = 1) AS n)
         |SELECT CAST(16 AS INTEGER) AS bandbits, d1, d2, cos
         |FROM srp, nv WHERE cos >= 0.9 AND nv.n > 256
         |UNION ALL
         |SELECT CAST(8 AS INTEGER) AS bandbits, d1, d2, cos
         |FROM srp8, nv WHERE cos >= 0.9 AND nv.n <= 256""".stripMargin) {
      (s, d) =>
      val t = Tables(s, d)
      val n = t.embeddings.count() +
        t.embeddings.filter(col("vec_id") % 4 === 1).count()
      val (planes, bits) = graft.llm.Similarity.srpAutoTier(n)
      graft.llm.Similarity.srpNearDups(R9Ops.srpAugmented(t),
          planes = planes, bandBits = bits, dims = 64, tau = 0.9,
          maxBucket = 32)
        .select(lit(bits).as("bandbits"), col("d1"), col("d2"), col("cos"))
    },

    // AUTO-WIDTH NGRAM DEDUP: the TEXT side of the same mechanization —
    // the x_heaps_profile canary read (one hashed-trigram pass, three
    // released rows, collected at plan build) decides the shingle width
    // via TierSelect.heapsRegime's integer comparisons: vocabulary still
    // growing (n_shingles doubling across the 25/50/100% carve) keeps
    // the width-3 default; saturated vocabulary (postings doubling while
    // shingles stay flat — df tracks the corpus, the inverted index's
    // quadratic window) coarsens to width 5, the documented mitigation
    // (x_dedup_ngram_coarse: ×6.97 where width 3 ran ×17.74). The width
    // is an output column and the oracle recomputes the identical
    // decision, so the dispatch is hash-gated. BOTH branches run at the
    // shipped gates: the driver corpus reads "heaps" at sf0.001/sf0.01
    // (width 3) and "saturated" at sf0.1 (width 5).
    QDef("x_dedup_ngram_auto", NgramAutoSql) { (s, d) =>
      val docs = Tables(s, d).documents
      val sh = graft.llm.Dedup.wordShingleSet(docs, "doc_id", "text")
      def lvls(id: org.apache.spark.sql.Column) =
        when(id % 4 === 0, array(lit(1), lit(2), lit(3)))
          .when(id % 2 === 0, array(lit(2), lit(3)))
          .otherwise(array(lit(3)))
      val hp = sh.select(col("sh"), explode(lvls(col("id"))).as("lvl"))
        .groupBy("lvl")
        .agg(countDistinct(col("sh")).as("ns"), count(lit(1)).as("np"))
        .orderBy("lvl").collect()
      val regime = TierSelect.heapsRegime(
        hp.map(_.getLong(1)).toSeq, hp.map(_.getLong(2)).toSeq)
      val width = TierSelect.shingleWidth(regime)
      graft.llm.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.5, width = width)
        .select(lit(width).as("width"), col("d1"), col("d2"), col("jaccard"))
    })
}
