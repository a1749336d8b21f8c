package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** One-off measurement main for the SRP sizing story (round 12): the
  * registered x_dedup_srp runs (planes=32, bandBits=8) + maxBucket=32,
  * and at sf1h density the x_srp_band_density canary reads ~240 of 256
  * buckets per band over the cap — the documented response is to widen
  * bandBits toward log2(corpus). This main MEASURES that response at
  * any (planes, bandBits): same augmented corpus, same bounded probe
  * truth as x_dedup_srp_recall, capped pass, one JSON line with recall
  * and wall-clock. Not a registered QDef — parameters are runtime
  * arguments, so there is no single oracle text; the registered recall
  * harness stays the per-corpus standing number.
  *
  * This probe's first readings CAUGHT the round-12 hyperplane defect:
  * recall plateaued at 0.32-0.38 however wide the bands, which is
  * impossible for independent hyperplanes at clone cosine ≈ 0.99 — the
  * raw-LCG weight family was nearly rank-deficient (see
  * [[graft.llm.Similarity.srpSignatures]]). Post-fix, (64, 16) measures
  * recall 0.96 at sf1h density on BOTH the rotation and the sign-flip
  * (--embhonest) fixtures.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1h sbt "runMain graft.queries.SrpSizingProbe 64 16"
  * or `... SrpSizingProbe auto` (round 13) — the x_dedup_srp_auto
  * dispatch chooses the tier from the corpus count exactly as the
  * registered query does, and the record carries the width it chose:
  * the "≥0.9 recall at sf1h density without a human choosing the tier"
  * evidence row. Round 14: the ladder's third rung — at the
  * ×1000-replica density (2M base vectors; avg 16-bit occupancy ≈ 38 >
  * cap), `auto` picks (144, 24) from the count alone, and the explicit
  * `64 16` run on the same fixture is the saturation contrast row.
  */
object SrpSizingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1h")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val auto = args.headOption.contains("auto")
    val (planes, bandBits) =
      if (auto) {
        val t = Tables(spark, sfDir)
        graft.llm.Similarity.srpAutoTier(t.embeddings.count() +
          t.embeddings.filter(col("vec_id") % 4 === 1).count())
      } else (args.headOption.map(_.toInt).getOrElse(64),
        if (args.length > 1) args(1).toInt else 16)

    // the clone-id offset must clear the corpus id space: the default
    // 10⁶ (every registered oracle's constant) suffices through the
    // ×10 fixtures (ids < 10⁵); the ×1000-replica 16-bit-saturation
    // fixture reaches 10⁷, so the probe escalates to 10⁸ there (the
    // jitter seed uses the ORIGINAL id — clone geometry is unchanged)
    val maxId = Tables(spark, sfDir).embeddings
      .agg(max(col("vec_id"))).first().getLong(0)
    val offset = if (maxId >= 1000000L) 100000000L else 1000000L
    val aug = R9Ops.srpAugmented(Tables(spark, sfDir), offset)
    // the x_dedup_srp_recall probe sub-universe: pinned ≤4000-id sample
    val sub = aug.filter((col("vec_id") % offset) % 20 === 1
      && (col("vec_id") % offset) < 4000)
    val l = sub.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val r = sub.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    val truth = l.join(broadcast(r), col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        graft.llm.Similarity.cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= 0.9).select("d1", "d2")
      .localCheckpoint()

    val t0 = System.nanoTime()
    val found = graft.llm.Similarity.srpNearDups(aug,
        planes = planes, bandBits = bandBits, dims = 64, tau = 0.9,
        maxBucket = 32)
      .join(truth, Seq("d1", "d2"), "left_semi").count()
    val sec = (System.nanoTime() - t0) / 1e9
    val nTrue = truth.count()
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    spark.stop()
    println(s"""{"metric":"srp_sizing","auto":$auto,"planes":$planes,"band_bits":$bandBits,"max_bucket":32,"n_true":$nTrue,"n_found":$found,"recall":${r3(if (nTrue == 0) 0 else found.toDouble / nTrue)},"pass_sec":${r3(sec)},"sf":"$sfDir"}""")
    System.out.flush()
  }
}
