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
    })
}
