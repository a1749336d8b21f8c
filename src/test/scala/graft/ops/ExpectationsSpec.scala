package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private lazy val df = Seq(
    (1L, Some("a@x.com"), 10.0),
    (2L, Some("bad-email"), 150.0), // regex + range violation
    (2L, None, 50.0),               // duplicate id + null email
    (4L, Some("c@y.org"), -5.0)     // range violation
  ).toDF("id", "email", "score")

  private lazy val dim = Seq(1L, 2L, 3L).toDF("ref_id")

  test("each rule counts its own violations; order preserved; passed flags") {
    val res = check(df, Seq(
      NotNull("email"),
      InRange("score", 0.0, 100.0),
      Matches("email", "^[^@]+@[^@]+\\.[a-z]+$"),
      Unique("id"),
      RefIntegrity("id", dim, "ref_id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))

    assert(res.map(_._1).toSeq === Seq("email_not_null", "score_range",
      "email_matches", "id_unique", "id_ref"))
    val m = res.map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("email_not_null") === ((1L, false)))
    // range counts only NON-NULL out-of-range (150.0 and -5.0)
    assert(m("score_range") === ((2L, false)))
    // regex counts only non-null non-matching ("bad-email")
    assert(m("email_matches") === ((1L, false)))
    // one value (2) appears twice -> 1 row beyond the first
    assert(m("id_unique") === ((1L, false)))
    // id=4 dangling -> 1 violation
    assert(m("id_ref") === ((1L, false)))
  }

  test("clean table passes every rule") {
    val clean = Seq((1L, "a@x.com", 10.0), (2L, "b@y.org", 20.0))
      .toDF("id", "email", "score")
    val res = check(clean, Seq(NotNull("email"), InRange("score", 0, 100),
      Unique("id"), RefIntegrity("id", dim, "ref_id")))
    assert(res.filter(!col("passed")).count() === 0L)
    assert(res.agg(sum("violations")).head.getLong(0) === 0L)
  }

  test("null FK values count as referential violations (conservative gate)") {
    val d2 = Seq((Some(1L)), (None), (Some(99L))).toDF("k")
    val res = check(d2, Seq(RefIntegrity("k", dim, "ref_id")))
    assert(res.head.getLong(1) === 2L) // NULL + dangling 99
  }
}
