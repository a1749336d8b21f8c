package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BinnedRank]] — the two-level binned prefix sum behind every exact
  * global/grouped rank in the repo (x_gini, x_ntile_deciles,
  * x_quantile_norm, x_isotonic, x_text_zipf). Pins (a) value equality with
  * the naive single-window form, (b) the plan contract: the data frame is
  * shuffled by (groups, bin) — never into one partition — and the
  * double-referenced input subtree is computed once via exchange reuse.
  */
class BinnedRankSpec extends SparkSpec {

  import spark.implicits._

  private def naiveBelow(rows: Seq[(String, Double, Long)]): Map[(String, Double), (Long, Long)] = {
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val n = rs.map(_._3).sum
      rs.map { case (_, v, _) =>
        (g, v) -> (rs.filter(_._2 < v).map(_._3).sum, n)
      }
    }
  }

  test("below/n equal the naive single-window form (grouped, histogram weights)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 500).map { _ =>
      (s"g${rng.nextInt(3)}", (rng.nextInt(900) + 100) / 10.0, rng.nextInt(5) + 1L)
    }.distinct
    val df = rows.toDF("g", "v", "c")
    val got = BinnedRank.belowAndN(df, Seq("g"),
        floor(col("v") / lit(10)).cast("bigint"), Seq(col("v")), col("c"))
      .select("g", "v", "below", "n").as[(String, Double, Long, Long)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == naiveBelow(rows))
  }

  test("global (no groups) with row ranks: below + 1 == row_number over the full order") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 400).map(i => (i.toLong, rng.nextInt(200) / 2.0))
    val df = rows.toDF("id", "v")
    val got = BinnedRank.belowAndN(df, Seq.empty,
        floor(col("v") / lit(7)).cast("bigint"), Seq(col("v"), col("id")), lit(1L))
      .withColumn("r", col("below") + lit(1L))
    val naive = df.withColumn("r",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(got.select("id", "r").as[(Long, Long)].collect().toMap
      == naive.select("id", "r").as[(Long, Long)].collect().toMap)
    assert(got.select("n").distinct().as[Long].collect().toSeq == Seq(400L))
  }

  test("descending order via negated bin matches row_number DESC") {
    val rows = (1 to 300).map(i => (i.toLong, (i * 37 % 250) / 3.0))
    val df = rows.toDF("id", "v")
    val got = BinnedRank.belowAndN(df, Seq.empty,
        (-floor(col("v") / lit(5))).cast("bigint"),
        Seq(col("v").desc, col("id")), lit(1L))
      .withColumn("r", col("below") + lit(1L))
    val naive = df.withColumn("r",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    assert(got.select("id", "r").as[(Long, Long)].collect().toMap
      == naive.select("id", "r").as[(Long, Long)].collect().toMap)
  }

  test("edge cases: degenerate single-value histogram, and a single-row group") {
    // the whole frame is ONE histogram row (ties pre-aggregated per the
    // contract): below = 0, n = the full weight
    val one = Seq((5.0, 5L)).toDF("v", "c")
    val t = BinnedRank.belowAndN(one, Seq.empty,
        floor(col("v")).cast("bigint"), Seq(col("v")), col("c"))
      .select("below", "n").as[(Long, Long)].collect().toSeq
    assert(t == Seq((0L, 5L)))
    // singleton group next to a multi-row group
    val g = Seq(("g1", 1.0), ("g2", 3.0), ("g2", 7.0)).toDF("g", "v")
    val r = BinnedRank.belowAndN(g, Seq("g"),
        floor(col("v")).cast("bigint"), Seq(col("v")), lit(1L))
      .select("g", "v", "below", "n").as[(String, Double, Long, Long)]
      .collect().map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    assert(r(("g1", 1.0)) == ((0L, 1L)))
    assert(r(("g2", 3.0)) == ((0L, 2L)) && r(("g2", 7.0)) == ((1L, 2L)))
  }

  test("plan contract: data shuffles by (groups, bin), and the twice-referenced " +
      "input computes once (exchange/stage reuse)") {
    val df = graft.SparkEntry.queries("x_gini")(spark, "/root/testdata/sf0.001")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // the within-bin window must be hash-partitioned by (g, __bin)
    assert(s.contains("__bin"))
    assert("hashpartitioning\\(g#\\d+, __bin#\\d+".r.findFirstIn(s).nonEmpty, s)
    // no SinglePartition anywhere in x_gini's final plan
    assert(!s.contains("Exchange SinglePartition"), s)
    // the spend subtree feeds both binPre and the data path; the shuffle
    // must be planned once and reused, not re-scanned
    assert(s.contains("ReusedQueryStage") || s.contains("ReusedExchange"), s)
  }
}
