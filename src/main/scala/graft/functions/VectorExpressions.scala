package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

/** Banded SRP (sign-random-projection) signatures over an `array<float>`
  * embedding: quantizes each dim to `round(e·1000)` integers (the engine/
  * oracle-shared sign-determinism contract), projects against the ±1
  * hyperplane family, and returns `planes/bandBits` band values, each
  * packing `bandBits` hyperplane sign bits, as `array<bigint>`.
  *
  * Why a custom Expression (prompt preference order (b)): the composable
  * formulation — nested `transform`/`aggregate` with `element_at` into a
  * `planes·dims`-element ±1 literal array — is a HigherOrderFunction tree:
  * evaluated INTERPRETED per element, it re-ran the `round(e·1000)`
  * quantization inside the innermost loop (planes·dims BigDecimal rounds
  * per row — 4096 at the sized tier), and, being CodegenFallback, it
  * barred the hosting Project from whole-stage codegen entirely. That made
  * the sized SRP tier the slowest query in the whole suite (BENCH_SF1_r12:
  * 74.8 s at sf1h, "single-task interpreted-HOF signature pass"). This
  * expression quantizes each dim ONCE and emits one fused Java triple loop
  * inside whole-stage codegen, with the hyperplane weight matrix held as a
  * reference object.
  *
  * Bit-identity contract: the weight matrix is [[SrpSignatures.weight]] —
  * the exact xorshift-multiply mix the HOF literal array was built from
  * and the DuckDB oracle texts spell out; [[SrpSignatures.quantize]]
  * replicates `CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)`
  * exactly (Spark's Round = HALF_UP on `BigDecimal.valueOf`, i.e. on the
  * double's shortest decimal representation — taken verbatim on the tie
  * window); and the per-bit accumulation is the same ascending-k Long sum
  * with `dot >= 0` sign packing. Results are bit-for-bit equal to the HOF
  * formulation (asserted in VectorExpressionsSpec, which keeps the retired
  * HOF text as its oracle) and to DuckDB (all SRP-family gates).
  *
  * Null semantics: null array → null; array length ≠ `dims` → null (the
  * schema contract is fixed-width embeddings; a mismatch is data
  * corruption surfaced as null, not a silent partial projection). Elements
  * are assumed non-null and finite (embedding columns).
  *
  * Scale shape: scan-local (one pass, no exchange), parallelizes by row
  * group; the weight matrix is O(planes·dims) longs shipped once with the
  * generated code, never per row.
  */
case class SrpSignatures(child: Expression, planes: Int, bandBits: Int,
    dims: Int) extends UnaryExpression {

  private def bands: Int = planes / bandBits

  @transient private lazy val weights: Array[Long] =
    Array.tabulate(planes * dims)(idx =>
      if (SrpSignatures.weight(idx.toLong)) 1L else -1L)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (planes <= 0 || bandBits <= 0 || bandBits > 62 || dims <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires planes > 0, 0 < bandBits <= 62, dims > 0")
      else if (planes % bandBits != 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires bandBits ($bandBits) to divide planes ($planes)")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_sigs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dims) null
    else {
      val q = new Array[Long](dims)
      var k = 0
      while (k < dims) {
        q(k) = SrpSignatures.quantize(arr.getFloat(k).toDouble * 1000.0)
        k += 1
      }
      val sigs = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = 0L
        var i = 0
        while (i < bandBits) {
          var s = 0L
          val base = (b * bandBits + i) * dims
          var j = 0
          while (j < dims) {
            s += weights(base + j) * q(j)
            j += 1
          }
          if (s >= 0L) acc |= (1L << i)
          i += 1
        }
        sigs(b) = acc
        b += 1
      }
      new GenericArrayData(sigs)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val w = ctx.addReferenceObj("srpWeights", weights, "long[]")
      val qa = ctx.freshName("qa")
      val sigs = ctx.freshName("sigs")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      s"""
         |if ($arr.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $qa = new long[$dims];
         |  for (int $k = 0; $k < $dims; $k++) {
         |    $qa[$k] = graft.functions.SrpSignatures.quantize(
         |      ((double) $arr.getFloat($k)) * 1000.0);
         |  }
         |  long[] $sigs = new long[$bands];
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $bandBits; $i++) {
         |      long $s = 0L;
         |      int $base = ($b * $bandBits + $i) * $dims;
         |      for (int $k = 0; $k < $dims; $k++) {
         |        $s += $w[$base + $k] * $qa[$k];
         |      }
         |      if ($s >= 0L) $acc |= (1L << $i);
         |    }
         |    $sigs[$b] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpSignatures {

  /** The SRP hyperplane weight bit for flat index plane·dims + k — a
    * xorshift-multiply MIX of the index (h ← a·idx+c mod 2³¹;
    * h ← xor(h, h ≫ 15)·2654435761 mod 2³¹; bit = h ≫ 10 mod 2), the
    * round-12 full-entropy family (raw LCG bit 20 was nearly
    * rank-deficient — see [[graft.llm.Similarity.srpSignatures]]'s
    * history note). Pure integer algebra, replayable in any engine: the
    * DuckDB oracle texts and the spec replays spell out this exact
    * formula. [[graft.llm.Similarity.srpWeight]] delegates here. */
  def weight(idx: Long): Boolean = {
    val h1 = (1103515245L * idx + 12345L) % 2147483648L
    (h1 ^ (h1 / 32768L)) * 2654435761L % 2147483648L / 1024L % 2L == 1L
  }

  /** `CAST(round(m, 0) AS BIGINT)` for a double `m`, replicating Spark's
    * Round semantics exactly: HALF_UP applied to `BigDecimal.valueOf(m)`
    * (the SHORTEST-decimal representation of the double, not its exact
    * binary value). Away from the tie window the two notions agree and a
    * plain `floor(m + 0.5)` (= round-half-away there, for either sign
    * since non-tie) is exact, so the BigDecimal path — a Double.toString
    * per call — only runs when |frac − 0.5| ≤ 1e-9, where the shortest-
    * repr subtlety can actually bite (the window is ~1e-11 wide for the
    * |m| ≤ 10⁵ quantized-embedding range; 1e-9 is a safe cover). NaN/Inf
    * pass through Round and truncate under the cast — can't occur for
    * finite embeddings, kept total so the expression never throws.
    * Called from both the interpreted eval and the generated code (via
    * the companion's static forwarder). */
  def quantize(m: Double): Long = {
    if (java.lang.Double.isNaN(m) || java.lang.Double.isInfinite(m)) m.toLong
    else {
      val f = m - math.floor(m)
      if (math.abs(f - 0.5) > 1e-9) math.floor(m + 0.5).toLong
      else java.math.BigDecimal.valueOf(m)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    }
  }
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

  /** Dataset-API entry: `srpSigs(embedding, planes, bandBits, dims)` over an
    * `array<float>` RAW embedding — quantization (round to int at scale
    * 1000, the HALF_UP tie window included) happens INSIDE the expression,
    * once per dimension ([[SrpSignatures.quantize]]); passing a
    * pre-quantized array is a type error (checkInputDataTypes requires
    * array<float>). */
  def srpSigs(embedding: Column, planes: Int, bandBits: Int, dims: Int): Column =
    Shim.column(SrpSignatures(Shim.expression(embedding), planes, bandBits, dims))

  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)))

  val l2SqDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_sq"),
    new ExpressionInfo(classOf[SquaredL2Distance].getName, "l2_sq"),
    (children: Seq[Expression]) => SquaredL2Distance(children(0), children(1)))

  /** `srp_sigs(embedding, planes, bandBits, dims)` — the three width
    * parameters must be INT literals (they shape the weight matrix at plan
    * build; a non-literal width has no meaning for a data-independent
    * hyperplane family). */
  val srpSigsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_sigs"),
    new ExpressionInfo(classOf[SrpSignatures].getName, "srp_sigs"),
    (children: Seq[Expression]) => {
      def intLit(e: Expression, name: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"srp_sigs: $name must be an INT literal, got $other")
      }
      SrpSignatures(children(0), intLit(children(1), "planes"),
        intLit(children(2), "bandBits"), intLit(children(3), "dims"))
    })

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
    srpSigsDescriptor, minHash16Descriptor, simHash32WordsDescriptor,
    jaroWinklerDescriptor, jaroWinklerAliasDescriptor)

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
    ext.injectFunction(GraftFunctions.srpSigsDescriptor)
    ext.injectFunction(GraftFunctions.minHash16Descriptor)
    ext.injectFunction(GraftFunctions.simHash32WordsDescriptor)
    ext.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    ext.injectFunction(GraftFunctions.jaroWinklerAliasDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
