package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel shared by interpreted eval and generated code.
  *
  * Textbook Jaro-Winkler (Winkler 1990), implemented to match DuckDB's
  * `jaro_winkler_similarity` bit-for-bit so the oracle can verify the
  * scores directly (probed 2026-08-14: MARTHA/MARHTA=0.9611…,
  * DIXON/DICKSONX=0.8133…, ab/ba=0.0, boost only when jaro > 0.7,
  * prefix capped at 4, p=0.1):
  *  - match window = max(|a|,|b|)/2 − 1 (floor, min 0)
  *  - transpositions = half the out-of-order matched characters
  *  - jw = jaro + l·0.1·(1 − jaro) iff jaro > 0.7, l = common prefix ≤ 4
  */
object JaroWinklerUtil {
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    // DuckDB scores ANY empty side 0.0 — including ''/'' (fuzz-probed
    // against 3k random pairs; the only divergence from the textbook)
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // out-of-order matched chars, walked in order on both sides
    var transHalves = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transHalves += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val trans = transHalves / 2
    val jaro = (mm / n + mm / m + (mm - trans) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(n, m))
    while (l < maxL && s.charAt(l) == t.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** Native Jaro-Winkler similarity — fuzzy-match scoring for entity
  * resolution. Spark has `levenshtein` but no Jaro-Winkler; a Scala UDF
  * would box both strings and break whole-stage codegen, so this is a
  * proper `BinaryExpression` whose generated code calls the static kernel
  * (same pattern as [[SimHash32]]).
  */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerUtil.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.JaroWinklerUtil.jaroWinkler($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  def jaroWinkler(a: Column, b: Column): Column =
    Shim.column(JaroWinklerSim(Shim.expression(a), Shim.expression(b)))
}
