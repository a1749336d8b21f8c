package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — single pass accumulating dot product and both
  * norms, with full whole-stage-codegen support (`doGenCode`).
  *
  * Why a custom Expression (prompt preference order (b)): the composable
  * alternative — `aggregate(zip_with(a, b, ...))` — is a HigherOrderFunction,
  * which Catalyst evaluates INTERPRETED per element (lambda variables block
  * codegen) and traverses the arrays three times (dot, ‖a‖, ‖b‖). This
  * expression emits one fused Java loop inside the stage's generated code.
  * Accumulation order (ascending index, double precision) is identical to
  * the HOF formulation, so results are bit-for-bit equal — asserted in
  * VectorExpressionsSpec and by the DuckDB oracle on x_sim_cosine_topk.
  *
  * Null semantics: null array → null result (BinaryExpression default);
  * MISMATCHED lengths → null (the HOF formulation's zip_with pads with null
  * and the aggregate propagates it — this expression matches that, rather
  * than silently truncating to the shorter array); array elements are
  * assumed non-null (embedding columns).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = (double) $a.getFloat($i);
         |    double $yv = (double) $b.getFloat($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two `array<float>` columns — Σ(aᵢ−bᵢ)²
  * accumulated in double, ascending index, as one fused codegen loop.
  * Same rationale as [[CosineSimilarity]]: the `aggregate(zip_with(...))`
  * composition is interpreted per element; accumulation order is identical,
  * so results are bit-for-bit equal to the HOF formulation (and to the
  * DuckDB oracle's `sum((v.e - c.e) * (v.e - c.e))` over ordinal-joined
  * elements).
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration surface: imperative (`register`) for existing sessions and a
  * `SparkSessionExtensions` hook for `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  /** Dataset-API entry: `cosineSim(col("a"), col("b"))`. */
  def cosineSim(a: Column, b: Column): Column =
    Shim.column(CosineSimilarity(Shim.expression(a), Shim.expression(b)))

  /** Dataset-API entry: `l2Sq(col("a"), col("b"))`. */
  def l2Sq(a: Column, b: Column): Column =
    Shim.column(SquaredL2Distance(Shim.expression(a), Shim.expression(b)))

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  val l2SqDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_sq"),
    new ExpressionInfo(classOf[SquaredL2Distance].getName, "l2_sq"),
    (children: Seq[Expression]) => SquaredL2Distance(children(0), children(1)))

  val minHash16Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash16"),
    new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
    (children: Seq[Expression]) => MinHash16(children.head))

  val simHash32WordsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32_words"),
    new ExpressionInfo(classOf[SimHash32Words].getName, "simhash32_words"),
    (children: Seq[Expression]) => SimHash32Words(children.head))

  val jaroWinklerDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
    (children: Seq[Expression]) => JaroWinklerSim(children(0), children(1)))

  /** DuckDB-spelled alias, so ONE portable SQL text can run verbatim in
    * both engines (the CcSql twin contract — see `x_sql_jaro`). */
  val jaroWinklerAliasDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler_similarity"),
    new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler_similarity"),
    (children: Seq[Expression]) => JaroWinklerSim(children(0), children(1)))

  /** Bloom-filter aggregate over a BIGINT key column (Spark's internal
    * `BloomFilterAggregate`, the engine behind runtime row-level filters —
    * not exposed in the public registry, surfaced here for explicit use).
    * Returns the serialized sketch as binary. */
  def bloomFilterAgg(key: Column, estItems: Long, numBits: Long): Column =
    Shim.column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(Shim.expression(key),
        org.apache.spark.sql.catalyst.expressions.Literal(estItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Probe a driver-materialized bloom sketch (the same scalar-barrier shape
    * Spark's InjectRuntimeFilter uses: build once, broadcast as a constant). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Shim.column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bloom,
        org.apache.spark.sql.types.BinaryType),
      Shim.expression(key)))

  private def allDescriptors = Seq(cosineSimDescriptor, l2SqDescriptor,
    minHash16Descriptor, simHash32WordsDescriptor, jaroWinklerDescriptor,
    jaroWinklerAliasDescriptor)

  /** Register `cosine_sim` / `l2_sq` / `minhash16` / `simhash32_words` in an
    * existing session's function registry (usable from `spark.sql(...)`). */
  def register(spark: SparkSession): Unit =
    allDescriptors.foreach { case (ident, info, builder) =>
      Shim.registerFunction(spark, ident, info, builder)
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimDescriptor)
    ext.injectFunction(GraftFunctions.l2SqDescriptor)
    ext.injectFunction(GraftFunctions.minHash16Descriptor)
    ext.injectFunction(GraftFunctions.simHash32WordsDescriptor)
    ext.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    ext.injectFunction(GraftFunctions.jaroWinklerAliasDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
