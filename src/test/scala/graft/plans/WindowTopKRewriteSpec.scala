package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowTopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  // (key, id, score) with duplicate scores to exercise the id tie-break
  val rows = Seq(
    (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 3.0), (1L, 13L, 9.0),
    (2L, 20L, 1.0), (2L, 21L, 2.0),
    (3L, 30L, 7.0))
  val df = rows.toDF("key", "id", "score")

  private def topkWindowed(d: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    d.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(WindowTopKRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrites rank<=k over row_number into the TopKByScore aggregate") {
    val q = topkWindowed(df, 2)
    val plan = withRule(q.queryExecution.executedPlan.toString)
    assert(plan.contains("topk_by_score"), plan)
    assert(!plan.contains("Window ["), plan) // no window exec operator
    assert(!plan.contains("WindowGroupLimit"), plan) // subsumed, incl. its sort
    assert(!plan.contains("Sort "), plan) // heap needs no sort at all
    assert(plan.contains("partial_topk_by_score"), plan) // map-side combine survives
  }

  test("rewritten results equal the window formulation, including tie order and schema") {
    val q = topkWindowed(df, 2)
    val expected = q.collect().map(_.toSeq).toSet // rule off
    val (got, schema) = withRule {
      val r = topkWindowed(df, 2)
      (r.collect().map(_.toSeq).toSet, r.schema)
    }
    assert(got === expected)
    assert(schema.fieldNames.toSeq === Seq("key", "id", "score", "rank"))
    assert(schema("rank").dataType.typeName === "integer")
    // spot-check semantics: key 1 keeps (13, rank 1) then tie 5.0 → smaller id 10
    assert(got.contains(Seq(1L, 13L, 9.0, 1)))
    assert(got.contains(Seq(1L, 10L, 5.0, 2)))
    assert(!got.exists(r => r.head == 1L && r(1) == 11L))
  }

  test("declines nullable scores — the heap drops nulls, a window ranks them") {
    val nullable = Seq((1L, 10L, Some(5.0)), (1L, 11L, None: Option[Double]))
      .toDF("key", "id", "score")
    val plan = withRule(topkWindowed(nullable, 2).queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("topk_by_score"), plan)
  }

  test("declines when the child has a column the aggregate can't reconstruct") {
    val extra = df.withColumn("payload", col("id") * 2)
    val plan = withRule(topkWindowed(extra, 2).queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
  }

  test("declines rank filters that aren't a top-k prefix") {
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
    val q = df.withColumn("rank", row_number().over(w)).filter(col("rank") === 2)
    val plan = withRule(q.queryExecution.executedPlan.toString)
    assert(plan.contains("Window"), plan)
  }
}
