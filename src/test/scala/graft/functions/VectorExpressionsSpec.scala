package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f)),
    (2L, Array(3f, 4f, 0f)),
    (3L, Array(-1f, -1f, 1f))).toDF("vec_id", "embedding")

  test("native CosineSimilarity matches the HOF formulation bit-for-bit") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("native"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (Similarity.norm(col("a.embedding")) * Similarity.norm(col("b.embedding")))).as("hof"))
    pairs.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"pair ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("known values: parallel 1, orthogonal 0, 3-4-5 triangle") {
    val cos = vecs.filter(col("vec_id") === 0).as("a")
      .crossJoin(vecs.as("b"))
      .select(col("b.vec_id"), GraftFunctions.cosineSim(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cos(0L) === 1.0)
    assert(cos(1L) === 0.0)
    assert(cos(2L) === 0.6)
  }

  test("native SquaredL2Distance matches the HOF formulation bit-for-bit") {
    def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        GraftFunctions.l2Sq(col("a.embedding"), col("b.embedding")).as("native"),
        hofL2(col("a.embedding"), col("b.embedding")).as("hof"))
    pairs.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"pair ${r.getLong(0)},${r.getLong(1)}")
    }
    // known value: ‖(1,0,0)−(0,1,0)‖² = 2
    val d = vecs.filter(col("vec_id") === 0).as("a")
      .crossJoin(vecs.filter(col("vec_id") === 1).as("b"))
      .select(GraftFunctions.l2Sq(col("a.embedding"), col("b.embedding"))).first().getDouble(0)
    assert(d === 2.0)
  }

  test("null array propagates to null result") {
    val withNull = Seq((1L, Some(Array(1f, 2f))), (2L, None)).toDF("id", "e")
    val out = withNull.as("a").crossJoin(withNull.as("b"))
      .select(GraftFunctions.cosineSim(col("a.e"), col("b.e"))).collect()
    assert(out.count(_.isNullAt(0)) === 3)
  }

  test("mismatched-length arrays yield null (matching the HOF zip_with semantics)") {
    val mixed = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(1f, 2f))).toDF("id", "e")
    val pairs = mixed.as("a").crossJoin(mixed.as("b"))
      .select(col("a.id"), col("b.id"),
        GraftFunctions.cosineSim(col("a.e"), col("b.e")).as("cos"),
        GraftFunctions.l2Sq(col("a.e"), col("b.e")).as("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(pairs((1L, 2L)) === ((true, true)))  // 3 vs 2 elements -> null
    assert(pairs((2L, 1L)) === ((true, true)))
    assert(pairs((1L, 1L)) === ((false, false))) // equal lengths unaffected
    assert(pairs((2L, 2L)) === ((false, false)))
  }

  test("SQL registration: cosine_sim callable from spark.sql and codegen'd") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vx")
    val r = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, cosine_sim(a.embedding, b.embedding) c
        |FROM vx a JOIN vx b ON a.vec_id = 0 AND b.vec_id = 2""".stripMargin).first()
    assert(r.getDouble(2) === 0.6)
    // over a real (parquet) scan the expression stays inside a
    // WholeStageCodegen span — doGenCode works, no interpreted fallback
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(GraftFunctions.cosineSim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(1)" prefix marks the WholeStageCodegen span in the plan string
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("Fallback"))
  }
}
