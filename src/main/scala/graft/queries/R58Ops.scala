package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-58 batch (round 12): the embedding-side regime canary the text
  * side has had since R54 (x_band_density). Context: the capped SRP tier
  * is now the REGISTERED embedding near-dup default (x_dedup_srp /
  * x_dedup_embedding), and unlike the text side its cap measurably BINDS
  * at the bench scale — post the round-12 hyperplane fix, the canary
  * reads 5 hot buckets (> 32, max 37) across bands 1 and 3 at sf0.1's
  * 2,500 augmented vectors (none at sf0.01's 625), with
  * x_dedup_srp_recall still at 1.0 at both gate scales; saturation
  * begins at sf1h density, where avg occupancy overwhelms the 8-bit
  * band space. The production posture is bandBits ≈
  * log2(corpus) with the cap as the overload valve — and THIS canary is
  * the one-pass read that says, BEFORE a 100 TB pass commits, whether
  * bandBits is sized (candidate_pairs tracking the corpus ≈ linearly)
  * or undersized (density growing; widen bandBits, or accept the cap
  * cost the recall harness reports). Signature pass + two bounded
  * aggregates; the released frame is 4 rows. */
object R58Ops {

  /** Per-band SRP bucket histogram as ONE portable text — the sig CTE of
    * the shared generator (string surgery with a require anchor, the
    * SrpCtesCapped convention) + the x_band_density aggregate shape. */
  private[queries] val SrpBandDensitySql = {
    val base = R9Ops.srpCteText(32, 8)
    val cut = base.indexOf(",\ncand AS (")
    require(cut > 0, "srpCteText anchors moved — update SrpBandDensitySql")
    s"""WITH ${base.substring(0, cut)},
       |bk AS (SELECT band, s, CAST(count(*) AS BIGINT) AS n
       |  FROM sig GROUP BY 1, 2)
       |SELECT CAST(band AS INT) AS band,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  max(n) AS max_bucket,
       |  sum(CAST(n AS DOUBLE) * (n - 1) / 2) AS candidate_pairs,
       |  CAST(sum(CASE WHEN n > 32 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS buckets_over_32
       |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // SRP BAND-DENSITY CANARY: the exact candidate-pair bill of the
    // banded SRP self-join, per band, BEFORE running it — and the exact
    // mass the maxBucket=32 valve would remove (buckets_over_32). Same
    // augmented corpus and signature computation as x_dedup_srp, so the
    // read applies to the registered pass verbatim. candidate_pairs
    // sums exact half-integers (n(n-1)/2 ≪ 2^53), so the double
    // aggregate is order-insensitive in both engines.
    QDef("x_srp_band_density", SrpBandDensitySql) { (s, d) =>
      val sig = graft.llm.Similarity.srpSignatures(
        R9Ops.srpAugmented(Tables(s, d)), planes = 32, bandBits = 8, dims = 64)
      val bk = sig.groupBy("band", "sig").agg(count(lit(1)).as("n"))
      bk.groupBy("band")
        .agg(count(lit(1)).as("n_buckets"), max("n").as("max_bucket"),
          sum(col("n").cast("double") * (col("n") - 1) / 2)
            .as("candidate_pairs"),
          sum(when(col("n") > 32, 1L).otherwise(0L)).as("buckets_over_32"))
        .orderBy("band")
    },

    // SIZED SRP-LSH: the canary's recommended move as a REGISTERED,
    // oracle-gated tier — 64 planes as 4×16-bit bands (bandBits ≈
    // log2(corpus) at the sf1 scale, 2^16 bucket keys per band) + the
    // same maxBucket=32 valve. Where x_dedup_srp (4×8-bit) saturates at
    // sf1h density (avg bucket occupancy 98 ≫ cap ⇒ recall 0.10), this
    // sizing measures 0.96 recall at the same density (SrpSizingProbe,
    // both scale fixtures) at 2× the per-row projection work (64 vs 32
    // planes) — and since the round-13 native signature expression
    // (graft.functions.SrpSignatures), LOWER end-to-end cost than the
    // 8-bit tier at sf0.1 (0.39 s vs 0.93 s, BENCH_LOCAL_r13: sparser buckets mean
    // far fewer candidate pairs, and the projection is a fused codegen
    // loop either way). The go/no-go read from x_srp_band_density
    // selects between them per corpus; x_dedup_srp_auto mechanizes that
    // read. Oracle = the shared capped generator at (64, 16).
    QDef("x_dedup_srp_sized",
      s"""WITH ${R9Ops.srpCappedText(64, 16)}
         |SELECT d1, d2, cos FROM srp WHERE cos >= 0.9""".stripMargin) { (s, d) =>
      graft.llm.Similarity.srpNearDups(R9Ops.srpAugmented(Tables(s, d)),
        planes = 64, bandBits = 16, dims = 64, tau = 0.9, maxBucket = 32)
    })
}
