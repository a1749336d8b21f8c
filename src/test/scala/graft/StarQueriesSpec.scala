package graft

/** Smoke: every registered query runs end-to-end at sf0.001 (correctness vs
  * the DuckDB oracle is the driver's Verify gate; this catches runtime
  * breakage inside `sbt test`). */
class StarQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle-declared query name exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      assert(fn(spark, sfDir).count() >= 0)
    }
  }
}
