package graft.queries

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round 13 (r12 verdict stretch task): run the regime-canary battery
  * against one or more fixture dirs and emit the MECHANICAL tier
  * selections — the operational "2 minutes of canaries, then commit the
  * right machinery" posture executed end-to-end instead of read by a
  * human. The canaries are the REGISTERED queries (x_heaps_profile,
  * x_exact_dup_profile, x_srp_band_density, x_grid_density — exactly
  * the bodies the oracle gates), the decisions are [[TierSelect]]'s
  * documented thresholds, and the SRP dispatch is
  * [[graft.llm.Similarity.srpAutoTier]], the same count ladder
  * x_dedup_srp_auto registers.
  *
  * Round 14 (r13 verdict task 6): the battery is part of the STANDARD
  * gate — [[graft.Verify]] runs it over the driver fixtures on every
  * full sweep and asserts [[documented]] per-fixture selections (a
  * regression in a decision function or canary query fails the gate,
  * not a demo), and CanaryBatterySpec runs it under `sbt test`.
  *
  * Prints ONE JSON line per dir:
  *   {"metric":"canary_battery","sf":dir,
  *    "heaps":{"regime":…,"shingle_width":…,"shingle_width_sampled":…},
  *    "dup":{"max_copies":…,"cap_binds":…},
  *    "srp":{"n_vectors":…,"dispatch":[planes,bits],"cap_pressure_8bit":…},
  *    "grid":{"n_points":…,"candidate_pairs":…,"regime":…}}
  *
  * Also asserts, per read: (1) the one PROVABLE cross-read implication —
  * SRP density saturation (occupancy > cap over 2⁸ buckets ⇒ n > 32·256)
  * implies the count ladder escalated (bits ≥ 16): a battery run can
  * never report "saturated but not escalated"; (2) the SAMPLED heaps
  * carve (what x_dedup_ngram_auto actually dispatches on since round 14)
  * selects the same width as the full profile.
  *
  * Run: sbt "runMain graft.queries.CanaryBattery /root/testdata/sf0.1 /tmp/sf1h"
  */
object CanaryBattery {

  /** One battery read: every canary selection for a fixture dir. */
  final case class Selections(heapsRegime: String, width: Int,
      widthSampled: Int, maxCopies: Long, capBinds: Boolean, nVec: Long,
      planes: Int, bits: Int, pressure: String, nPts: Long,
      pairs: Double, gridRegime: String) {
    def json(d: String): String =
      s"""{"metric":"canary_battery","sf":"$d","heaps":{"regime":"$heapsRegime","shingle_width":$width,"shingle_width_sampled":$widthSampled},"dup":{"max_copies":$maxCopies,"cap_binds":$capBinds},"srp":{"n_vectors":$nVec,"dispatch":[$planes,$bits],"cap_pressure_8bit":"$pressure"},"grid":{"n_points":$nPts,"candidate_pairs":$pairs,"regime":"$gridRegime"}}"""
  }

  /** Run every canary against `d` and derive the mechanical selections,
    * asserting the cross-read invariants documented above. */
  def read(spark: SparkSession, d: String): Selections = {
    // text vocabulary regime -> shingle width
    val heaps = SparkEntry.queries("x_heaps_profile")(spark, d)
      .orderBy("lvl").collect()
    val regime = TierSelect.heapsRegime(
      heaps.map(_.getAs[Long]("n_shingles")).toSeq,
      heaps.map(_.getAs[Long]("n_postings")).toSeq)
    val width = TierSelect.shingleWidth(regime)
    // the SAMPLED read x_dedup_ngram_auto actually dispatches on
    // (round 14 — half-corpus 25%→50% carve) must agree with the
    // full-profile diagnosis on every measured regime
    val widthSampled = R59Ops.sampledShingleWidth(Tables(spark, d).documents)
    assert(widthSampled == width,
      s"$d: sampled carve chose width $widthSampled but the full " +
        s"profile reads $regime (width $width)")

    // viral duplication -> does the maxBucket cap drop mass?
    val maxCopies = SparkEntry.queries("x_exact_dup_profile")(spark, d)
      .agg(max("copies")).first().getLong(0)
    val capBinds = TierSelect.dupCapBinds(maxCopies)

    // embedding near-dup: count-ladder dispatch + 8-bit cap pressure
    val t = Tables(spark, d)
    val nVec = t.embeddings.count() +
      t.embeddings.filter(col("vec_id") % 4 === 1).count()
    val (planes, bits) = graft.llm.Similarity.srpAutoTier(nVec)
    val srp = SparkEntry.queries("x_srp_band_density")(spark, d)
      .orderBy("band").collect()
    val pressure = TierSelect.srpCapPressure(nVec,
      srp.map(_.getAs[Long]("n_buckets")).toSeq,
      srp.map(_.getAs[Long]("buckets_over_32")).toSeq)
    // the provable implication: saturation at 2^8 buckets needs
    // n > 32*256, which the count ladder escalated long before
    // (round 14: >= 16 — the 24-bit rung also satisfies it)
    assert(pressure != "saturated" || bits >= 16,
      s"$d: density-saturated but dispatch did not escalate (n=$nVec)")

    // spatial join regime
    val grid = SparkEntry.queries("x_grid_density")(spark, d).first()
    val nPts = grid.getAs[Long]("n_points")
    val pairs = grid.getAs[Long]("candidate_pairs")
    Selections(regime, width, widthSampled, maxCopies, capBinds, nVec,
      planes, bits, pressure, nPts, pairs.toDouble,
      TierSelect.gridRegimeExact(nPts, pairs))
  }

  /** The DOCUMENTED per-fixture selections (basename-keyed), the ones
    * every round's records cite: (heaps regime, shingle width, grid
    * regime, SRP bandBits). Asserted by [[graft.Verify]]'s full sweep
    * and by CanaryBatterySpec. */
  val documented: Map[String, (String, Int, String, Int)] = Map(
    "sf0.001" -> (("heaps", 3, "linear", 16)),
    "sf0.01" -> (("heaps", 3, "linear", 16)),
    "sf0.1" -> (("saturated", 5, "quadratic", 16)))

  /** Assert `s` matches [[documented]] for `d` (no-op for fixtures with
    * no documented posture, e.g. ad-hoc sf1/sf10 builds — their lines
    * are still printed/recorded). */
  def assertDocumented(d: String, s: Selections): Unit =
    documented.get(new java.io.File(d).getName).foreach {
      case (reg, w, grid, bits) =>
        assert(s.heapsRegime == reg && s.width == w
          && s.widthSampled == w && s.gridRegime == grid && s.bits == bits,
          s"$d: battery selections drifted from the documented posture " +
            s"($reg/$w/$grid/$bits): ${s.json(d)}")
    }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val lines = dirs.map { d =>
      val s = read(spark, d)
      assertDocumented(d, s)
      s.json(d)
    }
    spark.stop()
    lines.foreach(println)
    System.out.flush()
  }
}
