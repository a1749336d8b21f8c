package graft.queries

import graft.SparkSpec

/** Round 14 (r13 verdict task 6): the canary battery as a CI gate — the
  * registered canary queries, the TierSelect decision functions, and the
  * documented per-fixture selections, asserted on every `sbt test` run
  * over all three driver fixtures (the same reads graft.Verify makes on
  * every full sweep). A drift in any canary body or threshold fails
  * here, not in an on-demand demo. */
class CanaryBatterySpec extends SparkSpec {

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
    test(s"battery at $d selects the documented posture") {
      val s = CanaryBattery.read(spark, d)
      CanaryBattery.assertDocumented(d, s)
      // the read itself asserts sampled==full width and the
      // saturation⇒escalation implication; re-state the headline
      // selections explicitly so a drift names the field that moved
      val (reg, w, grid, bits) =
        CanaryBattery.documented(new java.io.File(d).getName)
      assert(s.heapsRegime === reg)
      assert(s.width === w && s.widthSampled === w)
      assert(s.gridRegime === grid)
      assert(s.bits === bits)
    }
  }
}
