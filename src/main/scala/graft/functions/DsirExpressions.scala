package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the DSIR feature space (hashed unigram+bigram
  * buckets, arXiv:2302.03169 §3) — replacing the interpreted HOF chain in
  * `TextOps.ngramBuckets` (filter + transform + zip_with + concat per
  * document) and the per-document scoring fold in `Curation.dsirWeights`
  * (`aggregate(buckets, 0L, acc + element_at(lrn, j+1))`, an interpreted
  * lambda + per-element array lookup).
  *
  * Bit-compatibility (pinned by DsirExpressionsSpec against the HOF text):
  * single-space split, EMPTY TOKENS FILTERED, unigram bucket
  * `wordHash(t) % dim`, bigram bucket over CONSECUTIVE FILTERED tokens
  * `((wordHash(a)·1000003 + wordHash(b)) % (2^31−1)) % dim`, bucket list
  * = all unigrams then all bigrams (the `concat(uni, bi)` order), dot =
  * exact BIGINT Σ lrn[bucket].
  */
object DsirUtil {
  private val P = 2147483647L

  private def wordHash(tok: String): Long = {
    val padded = tok + "___"
    (padded.charAt(0).toLong * 65536 + padded.charAt(1).toLong * 256 +
      padded.charAt(2).toLong) + tok.length.toLong * 16777216L
  }

  /** Word hashes of the non-empty tokens of `s`. */
  private def filteredHashes(s: UTF8String): Array[Long] = {
    val toks = s.toString.split(" ", -1)
    val wh = new Array[Long](toks.length)
    var m = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) { wh(m) = wordHash(toks(i)); m += 1 }
      i += 1
    }
    if (m == wh.length) wh else java.util.Arrays.copyOf(wh, m)
  }

  def ngramBuckets(s: UTF8String, dim: Int): ArrayData = {
    val wh = filteredHashes(s)
    val m = wh.length
    val nb = math.max(m - 1, 0)
    val out = new Array[Long](m + nb)
    var i = 0
    while (i < m) { out(i) = wh(i) % dim; i += 1 }
    i = 0
    while (i < nb) {
      out(m + i) = ((wh(i) * 1000003L + wh(i + 1)) % P) % dim
      i += 1
    }
    new GenericArrayData(out)
  }

  def dsirDot(s: UTF8String, lrn: ArrayData, dim: Int): Long = {
    val wh = filteredHashes(s)
    val m = wh.length
    var acc = 0L
    var i = 0
    while (i < m) { acc += lrn.getLong((wh(i) % dim).toInt); i += 1 }
    i = 0
    while (i + 1 < m) {
      acc += lrn.getLong((((wh(i) * 1000003L + wh(i + 1)) % P) % dim).toInt)
      i += 1
    }
    acc
  }
}

/** text → array<bigint> DSIR bucket ids (unigrams then bigrams, one entry
  * per occurrence). */
case class NgramBuckets(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_buckets"
  override def nullSafeEval(input: Any): Any =
    DsirUtil.ngramBuckets(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirUtil.ngramBuckets($c, $dim);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (text, lrn array<bigint>) → Σ lrn[bucket] over the document's DSIR
  * buckets — the per-document importance-weight dot, one fused loop. */
case class DsirDot(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_dot"
  override def nullSafeEval(text: Any, lrn: Any): Any =
    DsirUtil.dsirDot(text.asInstanceOf[UTF8String],
      lrn.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = graft.functions.DsirUtil.dsirDot($t, $l, $dim);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object Dsir {
  def ngramBuckets(text: Column, dim: Int): Column =
    Shim.column(NgramBuckets(Shim.expression(text), dim))
  def dsirDot(text: Column, lrn: Column, dim: Int): Column =
    Shim.column(DsirDot(Shim.expression(text), Shim.expression(lrn), dim))
}
