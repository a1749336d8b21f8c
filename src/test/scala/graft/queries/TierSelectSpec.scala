package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The canary decision functions, pinned on the RECORDED readings of
  * every regime the repo has measured (the numbers cited in
  * TierSelect's scaladoc and BENCH_SF1_r12/r13), plus one live battery
  * pass at sf0.001 through the registered canary queries. */
class TierSelectSpec extends SparkSpec {

  test("heapsRegime: recorded readings — driver sf0.001/sf0.01 grow, " +
      "sf0.1 and the sf1h base are saturated") {
    // (lvl-ordered n_shingles, n_postings) as measured via the oracle SQL
    assert(TierSelect.heapsRegime(
      Seq(6064L, 10622L, 16506L), Seq(7120L, 13891L, 26903L)) === "heaps")
    assert(TierSelect.heapsRegime(
      Seq(5523L, 9964L, 16245L), Seq(6229L, 12635L, 26136L)) === "heaps")
    assert(TierSelect.heapsRegime(
      Seq(24609L, 26893L, 27213L), Seq(66301L, 130592L, 260388L))
      === "saturated")
    assert(TierSelect.heapsRegime(
      Seq(245554L, 268347L, 271547L), Seq(663010L, 1305920L, 2603880L))
      === "saturated")
    // degenerate: nothing grew across the carve
    assert(TierSelect.heapsRegime(Seq(10L, 10L), Seq(10L, 11L))
      === "undetermined")
    assert(TierSelect.shingleWidth("saturated") === 5)
    assert(TierSelect.shingleWidth("heaps") === 3)
  }

  test("heapsRegimeSampled: the 25%→50% doubling separates the measured " +
      "regimes at the 3/2 threshold; missing levels default") {
    // recorded lvl-1/lvl-2 readings (hashed-trigram universe, oracle SQL)
    assert(TierSelect.heapsRegimeSampled(
      Some((6064L, 7120L)), Some((10622L, 13891L))) === "heaps")   // sf0.001 x1.75
    assert(TierSelect.heapsRegimeSampled(
      Some((5523L, 6229L)), Some((9964L, 12635L))) === "heaps")    // sf0.01 x1.80
    assert(TierSelect.heapsRegimeSampled(
      Some((24609L, 66301L)), Some((26893L, 130592L)))
      === "saturated")                                             // sf0.1 x1.09/x1.97
    assert(TierSelect.heapsRegimeSampled(
      Some((245559L, 663010L)), Some((268354L, 1305920L)))
      === "saturated")                                             // sf1h base
    assert(TierSelect.heapsRegimeSampled(
      Some((294659L, 795612L)), Some((322012L, 1567104L)))
      === "saturated")                                             // 12-replica infix build
    // degenerate carves: a missing level (ADVICE r13) or flat counts
    assert(TierSelect.heapsRegimeSampled(None, Some((10L, 10L)))
      === "undetermined")
    assert(TierSelect.heapsRegimeSampled(Some((10L, 10L)), None)
      === "undetermined")
    assert(TierSelect.heapsRegimeSampled(Some((10L, 10L)), Some((12L, 13L)))
      === "undetermined")
    assert(TierSelect.shingleWidth("undetermined") === 3)
  }

  test("srpCapPressure: recorded readings — none at sf0.01, mild at " +
      "sf0.1 (5 hot buckets), saturated at sf1h (occupancy 98 >> cap)") {
    assert(TierSelect.srpCapPressure(625L,
      Seq(204L, 195L, 214L, 214L), Seq(0L, 0L, 0L, 0L)) === "none")
    assert(TierSelect.srpCapPressure(2500L,
      Seq(255L, 253L, 255L, 253L), Seq(0L, 4L, 0L, 1L)) === "mild")
    assert(TierSelect.srpCapPressure(25000L,
      Seq(256L, 256L, 256L, 256L), Seq(243L, 235L, 255L, 242L))
      === "saturated")
  }

  test("gridRegime: recorded readings — linear through sf0.01, " +
      "quadratic from sf0.1 (bounded 360-cell domain)") {
    assert(TierSelect.gridRegime(150L, 277.0) === "linear")        // 1.9/pt
    assert(TierSelect.gridRegime(1500L, 26328.0) === "linear")     // 35/pt
    assert(TierSelect.gridRegime(15000L, 2697753.0) === "quadratic") // 360/pt
    assert(TierSelect.gridRegime(150000L, 2.70409837e8) === "quadratic")
    // the sf10 demo's NO-GO: 27.05e9 pairs
    assert(TierSelect.gridRegime(1500000L, 2.705e10) === "quadratic")
  }

  test("dupCapBinds: the 40-clique binds, the fixture's 2-clique does not") {
    assert(TierSelect.dupCapBinds(2L) === false)
    assert(TierSelect.dupCapBinds(32L) === false)
    assert(TierSelect.dupCapBinds(40L) === true)
  }

  test("live battery at sf0.001: growing vocabulary -> width 3; no cap " +
      "pressure; dup cap free; grid linear; dispatch = sized (n = 625)") {
    val sf = "/root/testdata/sf0.001"
    val heaps = graft.SparkEntry.queries("x_heaps_profile")(spark, sf)
      .orderBy("lvl").collect()
    val regime = TierSelect.heapsRegime(
      heaps.map(_.getAs[Long]("n_shingles")).toSeq,
      heaps.map(_.getAs[Long]("n_postings")).toSeq)
    assert(regime === "heaps")
    assert(TierSelect.shingleWidth(regime) === 3)

    val maxCopies = graft.SparkEntry.queries("x_exact_dup_profile")(spark, sf)
      .agg(max("copies")).first().getLong(0)
    assert(!TierSelect.dupCapBinds(maxCopies))

    val srp = graft.SparkEntry.queries("x_srp_band_density")(spark, sf)
      .orderBy("band").collect()
    assert(TierSelect.srpCapPressure(625L,
      srp.map(_.getAs[Long]("n_buckets")).toSeq,
      srp.map(_.getAs[Long]("buckets_over_32")).toSeq) === "none")
    assert(graft.llm.Similarity.srpAutoTier(625L) === ((64, 16)))

    val grid = graft.SparkEntry.queries("x_grid_density")(spark, sf).first()
    assert(TierSelect.gridRegime(grid.getAs[Long]("n_points"),
      grid.getAs[Long]("candidate_pairs").toDouble) === "linear")
  }
}
