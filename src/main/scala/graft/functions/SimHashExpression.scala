package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel shared by interpreted eval and generated code. */
object SimHashUtil {
  /** 32-bit SimHash over DISTINCT char-3-gram shingles
    * (hash = c1·2^16 + c2·2^8 + c3): bit j set iff
    * Σ_{distinct shingles}(2·bit_j − 1) > 0. Exactly the semantics of
    * `Dedup.simHash` (grouped) and the DuckDB oracle. */
  def simhash32(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    val w = new Array[Int](32)
    val seen = new java.util.HashSet[Int]()
    var i = 0
    while (i + 2 < n) {
      val h = str.charAt(i) * 65536 + str.charAt(i + 1) * 256 + str.charAt(i + 2)
      if (seen.add(h)) {
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1) == 1) w(j) += 1 else w(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (w(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

object SimHashWordUtil {
  private val P = 2147483647L

  private def wordHash(tok: String): Long = {
    val padded = tok + "___"
    (padded.charAt(0).toLong * 65536 + padded.charAt(1).toLong * 256 +
      padded.charAt(2).toLong) + tok.length.toLong * 16777216L
  }

  /** 32-bit SimHash over DISTINCT word-trigram hashes — the exact
    * construction of TextOps.wordTrigramHashes (Horner-combined wordHash
    * triples mod 2^31-1, single-space split keeping empty tokens). */
  def simhash32w(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val wh = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { wh(i) = wordHash(toks(i)); i += 1 }
    val w = new Array[Int](32)
    val seen = new java.util.HashSet[Long]()
    i = 0
    while (i + 2 < toks.length) {
      val h = ((wh(i) * 1000003L + wh(i + 1)) % P * 1000033L + wh(i + 2)) % P
      if (seen.add(h)) {
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) w(j) += 1 else w(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (w(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** Native single-pass SimHash expression. The composable alternatives both
  * lose badly: explode+groupBy shuffles a ~30×-amplified shingle set, and a
  * struct-accumulator `aggregate` HOF allocates a 32-field struct per array
  * element in interpreted mode (measured 19s at 5k docs vs ~1s here). One
  * fused loop, zero allocation beyond a small dedup set, codegen-friendly.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-trigram-shingled variant (see [[SimHashWordUtil.simhash32w]]). */
case class SimHash32Words(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32w"

  override def nullSafeEval(input: Any): Any =
    SimHashWordUtil.simhash32w(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashWordUtil.simhash32w($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32 {
  def simHash32(text: Column): Column = Shim.column(SimHash32(Shim.expression(text)))
  def simHash32Words(text: Column): Column = Shim.column(SimHash32Words(Shim.expression(text)))
}
