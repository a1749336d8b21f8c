package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 14 (r13 verdict task 5): the recorded suite/test count as a
  * MECHANICAL invariant instead of a hand-derived note. Two rounds
  * running, the committed count predated the final commit because the
  * registry-driven portion (StarQueriesSpec emits one smoke test per
  * registered query) moves with every registration. This spec pins the
  * derivation at both ends:
  *
  *   1. StarQueriesSpec's expected test count == 2 fixed + |registry| —
  *      counted by ScalaTest itself, no execution;
  *   2. the committed record (TEST_COUNT.json: {"suites", "tests",
  *      "fixed_tests"}) satisfies tests == fixed_tests + |registry| —
  *      so registering a query WITHOUT re-deriving the record fails CI,
  *      and the recorded number reproduces on a clean checkout by
  *      construction.
  *
  * The record's absolute numbers are re-measured by a cold `sbt test`
  * on the committed tree each round (BENCH_NOTES carries the run).
  */
class TestCountSpec extends AnyFunSuite {

  test("StarQueriesSpec's test count is 2 fixed + one per registered query") {
    val counted = new StarQueriesSpec()
      .expectedTestCount(org.scalatest.Filter.default)
    assert(counted === 2 + SparkEntry.queries.size,
      s"StarQueriesSpec emits $counted tests for " +
        s"${SparkEntry.queries.size} registered queries")
  }

  test("TEST_COUNT.json's recorded total equals fixed_tests + |registry|") {
    val p = java.nio.file.Paths.get("TEST_COUNT.json")
    assert(java.nio.file.Files.exists(p), "TEST_COUNT.json missing")
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    def field(name: String): Long = {
      val m = ("\"" + name + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(txt)
      assert(m.isDefined, s"TEST_COUNT.json lacks $name")
      m.get.group(1).toLong
    }
    val (tests, fixed) = (field("tests"), field("fixed_tests"))
    assert(tests === fixed + SparkEntry.queries.size,
      s"recorded tests=$tests but fixed_tests=$fixed + " +
        s"${SparkEntry.queries.size} registered queries = " +
        s"${fixed + SparkEntry.queries.size} — re-derive the record " +
        "with a cold `sbt test` on the committed tree")
  }
}
