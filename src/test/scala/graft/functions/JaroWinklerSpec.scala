package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[JaroWinklerUtil]] to DuckDB's `jaro_winkler_similarity` semantics
  * (fuzz-probed 2026-08-14 over 3k random pairs): textbook Winkler with
  * window = max/2−1, boost only above 0.7, prefix ≤ 4, p = 0.1 — and the
  * one DuckDB quirk, empty-side ⇒ 0.0 (including ''/'').
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("known values match DuckDB jaro_winkler_similarity") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("aaapple", "apple") - 0.9142857142857143) < 1e-12)
    // jaro ≤ 0.7 ⇒ no prefix boost despite the shared 4-char prefix
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)
    // window 0 ⇒ adjacent transposition of a 2-char string never matches
    assert(jw("ab", "ba") === 0.0)
    assert(jw("abc", "abc") === 1.0)
  }

  test("non-ASCII matches DuckDB — the kernel walks raw UTF-8 BYTES, " +
      "not UTF-16 code units (values probed against DuckDB 2026-08-14)") {
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
    assert(math.abs(jw("über", "uber") - 0.7833333333333333) < 1e-12)
    assert(math.abs(jw("naïve", "naive") - 0.8577777777777779) < 1e-12)
    assert(math.abs(jw("日本語", "日本") - 0.9333333333333333) < 1e-12)
    assert(math.abs(jw("αβγδ", "αβδγ") - 0.975) < 1e-12)
    assert(math.abs(jw("héllo", "hello") - 0.8400000000000001) < 1e-12)
    // 2-byte chars: byte window is wider than a char window would be,
    // but a 1-char pair still can't transpose — ñ (0xC3B1) vs n diverge
    assert(jw("ñ", "n") === 0.0)
  }

  test("NULL literal through SQL resolves (implicit cast) and returns NULL") {
    val r = spark.sql(
      "SELECT jaro_winkler(NULL, 'x') AS a, jaro_winkler('x', NULL) AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("empty sides score 0.0 — the DuckDB quirk") {
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "") === 0.0) // textbook says 1.0; DuckDB says 0.0
  }

  test("symmetric") {
    for ((a, b) <- Seq(("small ring", "smlal ring"), ("red widget", "red widgte"),
        ("x", "yx"), ("abcde", "bcade")))
      assert(jw(a, b) === jw(b, a))
  }

  test("expression evaluates under codegen and interpreted paths, null-safe") {
    import spark.implicits._
    val df = Seq(("small ring", "smlal ring"), ("blue bolt", "blue bolt"),
        (null, "x"), ("x", null))
      .toDF("a", "b")
      .select(JaroWinklerSim.jaroWinkler(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - jw("small ring", "smlal ring")) < 1e-12)
    assert(rows(1).getDouble(0) === 1.0)
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("SQL surface: registered under both spellings") {
    val r = spark.sql(
      "SELECT jaro_winkler('MARTHA','MARHTA') AS a, " +
        "jaro_winkler_similarity('MARTHA','MARHTA') AS b").head()
    assert(r.getDouble(0) === r.getDouble(1))
  }
}
