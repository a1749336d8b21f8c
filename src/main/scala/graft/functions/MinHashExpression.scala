package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel shared by interpreted eval and generated code. */
object MinHashUtil {
  private val P = 2147483647L

  // (a, b) pairs of the 16 universal-hash permutations — MUST stay equal to
  // Dedup.HashAB (the DuckDB oracle derives the same signatures).
  val A: Array[Long] = Array(
    1000003L, 1000033L, 1000211L, 1000231L, 1000249L, 1000253L, 1000273L,
    1000289L, 1000291L, 1000303L, 1000313L, 1000333L, 1000357L, 1000367L,
    1000381L, 1000393L)
  val B: Array[Long] = Array(
    12345L, 54321L, 11111L, 22222L, 33333L, 44444L, 55555L, 66666L,
    10101L, 20202L, 30303L, 40404L, 50505L, 60606L, 70707L, 80808L)

  private def wordHash(tok: String): Long = {
    val padded = tok + "___"
    (padded.charAt(0).toLong * 65536 + padded.charAt(1).toLong * 256 +
      padded.charAt(2).toLong) + tok.length.toLong * 16777216L
  }

  /** All 16 MinHash signatures over the word-trigram hashes of `s`, one
    * pass — trigram construction identical to TextOps.wordTrigramHashes
    * (single-space split keeping empty tokens, Horner-combined 26-bit word
    * hashes mod 2^31−1), min math identical to `min((a·sh + b) % P)`.
    * Duplicate trigrams can't change a min, so no dedup set is kept.
    * Returns null when the document has no trigram (< 3 tokens) — such
    * documents have no signature row in the grouped formulation either. */
  def minhash16(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 3) return null
    val wh = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { wh(i) = wordHash(toks(i)); i += 1 }
    val mins = Array.fill(16)(Long.MaxValue)
    i = 0
    while (i + 2 < toks.length) {
      val h = ((wh(i) * 1000003L + wh(i + 1)) % P * 1000033L + wh(i + 2)) % P
      var k = 0
      while (k < 16) {
        val v = (A(k) * h + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native single-pass MinHash-16 expression: text → `array<bigint>` of the
  * 16 signature minima. The composable alternative — explode the shingle
  * array, `distinct`, then a 16-min `groupBy` — shuffles a ~200×-amplified
  * trigram set twice before the signatures even exist; this is one fused
  * scan-local loop per document, so at 100 TB signature generation costs
  * exactly one corpus read and zero shuffle.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < 3 tokens → null
  override def prettyName: String = "minhash16"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.minhash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MinHashUtil.minhash16($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16 {
  def minHash16(text: Column): Column = Shim.column(MinHash16(Shim.expression(text)))
}
