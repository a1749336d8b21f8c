package graft.queries

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Round 13 (r12 verdict stretch task): run the regime-canary battery
  * against one or more fixture dirs and emit the MECHANICAL tier
  * selections — the operational "2 minutes of canaries, then commit the
  * right machinery" posture executed end-to-end instead of read by a
  * human. The canaries are the REGISTERED queries (x_heaps_profile,
  * x_exact_dup_profile, x_srp_band_density, x_grid_density — exactly
  * the bodies the oracle gates), the decisions are [[TierSelect]]'s
  * documented thresholds, and the SRP dispatch is
  * [[graft.llm.Similarity.srpAutoTier]], the same count rule
  * x_dedup_srp_auto registers.
  *
  * Prints ONE JSON line per dir:
  *   {"metric":"canary_battery","sf":dir,
  *    "heaps":{"regime":…,"shingle_width":…},
  *    "dup":{"max_copies":…,"cap_binds":…},
  *    "srp":{"n_vectors":…,"dispatch":[planes,bits],"cap_pressure_8bit":…},
  *    "grid":{"n_points":…,"candidate_pairs":…,"regime":…}}
  *
  * Also asserts the one PROVABLE cross-read implication: SRP density
  * saturation (occupancy > cap over 2⁸ buckets ⇒ n > 32·256) implies
  * the count dispatch escalated (n > 256) — a battery run can never
  * report "saturated but not escalated".
  *
  * Run: sbt "runMain graft.queries.CanaryBattery /root/testdata/sf0.1 /tmp/sf1h"
  */
object CanaryBattery {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val lines = dirs.map { d =>
      // text vocabulary regime -> shingle width
      val heaps = SparkEntry.queries("x_heaps_profile")(spark, d)
        .orderBy("lvl").collect()
      val regime = TierSelect.heapsRegime(
        heaps.map(_.getAs[Long]("n_shingles")).toSeq,
        heaps.map(_.getAs[Long]("n_postings")).toSeq)
      val width = TierSelect.shingleWidth(regime)

      // viral duplication -> does the maxBucket cap drop mass?
      val maxCopies = SparkEntry.queries("x_exact_dup_profile")(spark, d)
        .agg(max("copies")).first().getLong(0)
      val capBinds = TierSelect.dupCapBinds(maxCopies)

      // embedding near-dup: count dispatch + 8-bit cap-pressure diagnosis
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
      // n > 32*256, which the count rule escalated long before
      assert(pressure != "saturated" || bits == 16,
        s"$d: density-saturated but dispatch did not escalate (n=$nVec)")

      // spatial join regime
      val grid = SparkEntry.queries("x_grid_density")(spark, d).first()
      val nPts = grid.getAs[Long]("n_points")
      val pairs = grid.getAs[Long]("candidate_pairs").toDouble
      val gridRegime = TierSelect.gridRegime(nPts, pairs)

      s"""{"metric":"canary_battery","sf":"$d","heaps":{"regime":"$regime","shingle_width":$width},"dup":{"max_copies":$maxCopies,"cap_binds":$capBinds},"srp":{"n_vectors":$nVec,"dispatch":[$planes,$bits],"cap_pressure_8bit":"$pressure"},"grid":{"n_points":$nPts,"candidate_pairs":$pairs,"regime":"$gridRegime"}}"""
    }
    spark.stop()
    lines.foreach(println)
    System.out.flush()
  }
}
