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

  // ---- SrpSignatures (round 13: the native plane loop) ----

  /** The RETIRED interpreted-HOF formulation of the banded-SRP signature
    * pass, verbatim as Similarity.srpSignatures built it through round 12
    * (nested transform/aggregate with element_at into the ±1 literal
    * array) — kept here as the equivalence oracle for the native
    * expression. Note it quantizes `round(embedding[k] * 1000)` inline
    * through Spark's own Round (double multiply, BigDecimal HALF_UP), so
    * this comparison covers the native quantize replication too. */
  private def hofSigs(planes: Int, bandBits: Int, dims: Int) = {
    val bands = planes / bandBits
    val w = (0 until planes * dims).map(i =>
      if (Similarity.srpWeight(i.toLong)) 1L else -1L)
    expr(
      s"""transform(sequence(0, ${bands - 1}), b ->
         |  aggregate(sequence(0, ${bandBits - 1}), 0L, (acc, i) ->
         |    acc + IF(
         |      aggregate(sequence(0, ${dims - 1}), 0L, (s, k) ->
         |        s + element_at(${w.mkString("array(", "L,", "L)")},
         |              CAST((b * $bandBits + i) * $dims + k + 1 AS INT))
         |            * CAST(round(embedding[k] * 1000) AS BIGINT)) >= 0,
         |      CAST(shiftleft(1, i) AS BIGINT), 0L)))""".stripMargin)
  }

  test("native SrpSignatures matches the retired HOF formulation " +
      "bit-for-bit at all three registered widths over real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    for ((planes, bandBits) <- Seq((32, 8), (16, 16), (64, 16))) {
      val rows = emb.select(col("vec_id"),
          GraftFunctions.srpSigs(col("embedding"), planes, bandBits, 64)
            .as("native"),
          hofSigs(planes, bandBits, 64).as("hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"vec ${r.getLong(0)} at ($planes, $bandBits)")
      }
    }
  }

  test("SrpSignatures.quantize replicates Spark round-cast semantics on " +
      "the tie window (HALF_UP away from zero, either sign)") {
    // exact decimal ties and near-ties, both signs, plus plain values —
    // compared against Spark's own CAST(round(x, 0) AS BIGINT)
    val doubles = Seq(2.5, -2.5, 0.5, -0.5, 3.5, -3.5, 1234.5, -1234.5,
      2.4999999999, 2.5000000001, -2.4999999999, -2.5000000001,
      0.0, -0.0, 17.0, -17.0, 0.49999999999999994, 7.3, -7.3)
    val viaSpark = doubles.toDF("m")
      .select(col("m"), expr("CAST(round(m, 0) AS BIGINT)").as("q"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    doubles.foreach { m =>
      assert(SrpSignatures.quantize(m) === viaSpark(m), s"m=$m")
    }
  }

  test("SrpSignatures: null array and wrong-width array yield null; " +
      "matching width is unaffected") {
    val mixed = Seq(
      (1L, Some(Array(1f, -2f, 3f, 0.0004f))),
      (2L, Some(Array(1f, -2f))),
      (3L, None)).toDF("id", "embedding")
    val out = mixed
      .select(col("id"),
        GraftFunctions.srpSigs(col("embedding"), 8, 4, 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) === false)
    assert(out(2L) === true)  // 2 elements vs dims=4 -> null, not partial
    assert(out(3L) === true)
  }

  test("SrpSignatures: SQL registration with literal widths; " +
      "non-literal width rejected; codegen'd over a parquet scan") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("embsrp")
    val viaSql = spark.sql(
      "SELECT vec_id, srp_sigs(embedding, 32, 8, 64) AS s FROM embsrp")
    val viaApi = emb.select(col("vec_id"),
      GraftFunctions.srpSigs(col("embedding"), 32, 8, 64).as("s"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    val err = intercept[Exception] {
      spark.sql("SELECT srp_sigs(embedding, CAST(vec_id AS INT), 1, 1) " +
        "FROM embsrp").collect()
    }
    assert(err.getMessage.contains("INT literal")
      || err.getMessage.contains("srp_sigs"))
    // the signature pass must sit inside a WholeStageCodegen span — the
    // entire point of the native expression (the HOF predecessor was
    // CodegenFallback, which barred its Project from codegen)
    val plan = viaApi.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SrpSignatures: bandBits must divide planes; bad widths rejected " +
      "at analysis") {
    val df = Seq((1L, Array(1f, 2f))).toDF("id", "embedding")
    val e = intercept[Exception] {
      df.select(GraftFunctions.srpSigs(col("embedding"), 10, 4, 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("divide")
      || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
