package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for the word-shingle family — shared by interpreted eval
  * and generated code (the MinHashUtil pattern).
  *
  * These replace the higher-order-function formulations in
  * [[graft.llm.TextOps]] (`slice` + `zip_with` + `concat` chains, plus a
  * separate `array_distinct` pass at most call sites): HOF lambdas do not
  * participate in whole-stage codegen, so each document paid an interpreted
  * pass per zip/transform level plus intermediate array materializations.
  * One fused loop per document produces the identical array.
  *
  * Bit-compatibility contracts (pinned by ShingleExpressionsSpec against the
  * retired HOF text):
  *  - tokens: single-space split KEEPING empty tokens (`split(text," ",-1)`);
  *  - `ngrams`: space-joined width-n token windows, count = max(tokens-n+1, 0)
  *    — exactly `TextOps.wordNgrams` (width 3 ≡ the old `wordTrigrams`);
  *  - `trigramHashes`: Horner chain with the 1000003/1000033 multiplier pair
  *    mod 2^31−1 over 26-bit word hashes — exactly `wordTrigramHashes`
  *    (and MinHashUtil's shingle universe);
  *  - `ngramHashes`: the UNIFORM-1000003 Horner chain of `wordNgramHashes`
  *    (deliberately a distinct universe from the trigram formula);
  *  - `distinct = true` fuses `array_distinct` (first-occurrence order,
  *    byte-equality on strings);
  *  - fewer than n tokens → EMPTY array (the zipped-empty-slices result);
  *    null text → null row (UnaryExpression null propagation).
  */
object ShingleUtil {
  private val P = 2147483647L

  // identical to MinHashUtil.wordHash / TextOps.wordHash (ascii of the first
  // three underscore-padded chars packed + length·2^24)
  private def wordHash(tok: String): Long = {
    val padded = tok + "___"
    (padded.charAt(0).toLong * 65536 + padded.charAt(1).toLong * 256 +
      padded.charAt(2).toLong) + tok.length.toLong * 16777216L
  }

  private val Empty = new GenericArrayData(Array.empty[Any])

  def ngrams(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val cnt = toks.length - (n - 1)
    if (cnt <= 0) return Empty
    val sb = new java.lang.StringBuilder
    if (!distinct) {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k)); k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // LinkedHashSet: first-occurrence order — array_distinct's order
      val seen = new java.util.LinkedHashSet[String](cnt * 2)
      var i = 0
      while (i < cnt) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k)); k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  def trigramHashes(s: UTF8String, distinct: Boolean): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val cnt = toks.length - 2
    if (cnt <= 0) return Empty
    val wh = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { wh(i) = wordHash(toks(i)); i += 1 }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      hs(i) = ((wh(i) * 1000003L + wh(i + 1)) % P * 1000033L + wh(i + 2)) % P
      i += 1
    }
    pack(hs, distinct)
  }

  def ngramHashes(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val cnt = toks.length - (n - 1)
    if (cnt <= 0) return Empty
    val wh = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { wh(i) = wordHash(toks(i)); i += 1 }
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var acc = wh(i)
      var k = 1
      while (k < n) { acc = (acc * 1000003L + wh(i + k)) % P; k += 1 }
      hs(i) = acc
      i += 1
    }
    pack(hs, distinct)
  }

  /** xxhash64 (seed 42 — Spark's xxhash64()) of every `winLen`-char
    * window of `s`, identical to
    * `transform(sequence(0, length(s) - winLen), i -> xxhash64(substring(s, i+1, winLen)))`
    * for inputs with at least `winLen` chars (shorter inputs return an
    * EMPTY array; the HOF form would walk a descending sequence into
    * nonsense windows, but every call site filters `length >= winLen`
    * first). The HOF form re-seeks the code-point boundary from byte 0 on
    * EVERY substring call — O(chars²) per document; this kernel walks the
    * boundaries once and hashes byte ranges in place, O(chars·winLen). */
  def windowHashes(s: UTF8String, winLen: Int): ArrayData = {
    val n = s.numChars()
    val cnt = n - winLen + 1
    if (cnt <= 0) return Empty
    val nb = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val hs = new Array[Long](cnt)
    if (nb == n) { // pure ASCII: byte index == char index
      var i = 0
      while (i < cnt) {
        hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + i, winLen, 42L)
        i += 1
      }
    } else {
      val offs = new Array[Int](n + 1)
      var b = 0
      var c = 0
      while (b < nb) {
        offs(c) = b
        b += UTF8String.numBytesForFirstByte(s.getByte(b))
        c += 1
      }
      offs(n) = nb
      var i = 0
      while (i < cnt) {
        hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + offs(i), offs(i + winLen) - offs(i), 42L)
        i += 1
      }
    }
    new GenericArrayData(hs)
  }

  /** Σ count·ln(count) over the per-character counts of `s`, folded in
    * FIRST-OCCURRENCE order of the distinct characters — bit-identical to
    * `aggregate(transform(array_distinct(split(s,"")), c ->
    * size(filter(chars, x = c)) * ln(..)), ...)`, whose interpreted form
    * is O(len·distinct) per document (one full filter pass per distinct
    * char). One pass counting + one in-order fold, O(len + distinct).
    * Characters are Unicode code points (Java's split("") keeps surrogate
    * pairs whole). */
  def charEntropySum(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.LinkedHashMap[Integer, Array[Long]]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      // StrictMath.log: Catalyst's Log expression is
      // UnaryLogExpression(StrictMath.log, ..) — Math.log differs by ulps
      acc += c * StrictMath.log(c)
    }
    acc
  }

  private def pack(hs: Array[Long], distinct: Boolean): ArrayData =
    if (!distinct) new GenericArrayData(hs)
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long](hs.length * 2)
      var i = 0
      while (i < hs.length) { seen.add(hs(i)); i += 1 }
      val out = new Array[Long](seen.size)
      val it = seen.iterator
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
}

sealed abstract class ShingleExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
}

/** text → array<string> of width-n word shingles (optionally distinct). */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends ShingleExpression {
  require(n >= 2, s"shingle width must be >= 2, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullSafeEval(input: Any): Any =
    ShingleUtil.ngrams(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.ngrams($c, $n, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<bigint> word-trigram hashes (the 1000003/1000033 Broder
  * universe — MinHash16's shingles). */
case class WordTrigramHashes(child: Expression, distinct: Boolean)
    extends ShingleExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_trigram_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleUtil.trigramHashes(input.asInstanceOf[UTF8String], distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.trigramHashes($c, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<bigint> width-n shingle hashes (uniform-1000003 universe). */
case class WordNgramHashes(child: Expression, n: Int, distinct: Boolean)
    extends ShingleExpression {
  require(n >= 2, s"shingle width must be >= 2, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleUtil.ngramHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.ngramHashes($c, $n, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → array<bigint> xxhash64 of every winLen-char window (substring
  * dedup's window pass). */
case class WindowHashes(child: Expression, winLen: Int)
    extends ShingleExpression {
  require(winLen >= 1, s"window length must be >= 1, got $winLen")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"
  override def nullSafeEval(input: Any): Any =
    ShingleUtil.windowHashes(input.asInstanceOf[UTF8String], winLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.windowHashes($c, $winLen);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** text → double: Σ count·ln(count) over per-char counts (charEntropy's
  * heavy fold). */
case class CharEntropySum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "char_entropy_sum"
  override def nullSafeEval(input: Any): Any =
    ShingleUtil.charEntropySum(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.charEntropySum($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  def wordNgrams(text: Column, n: Int, distinct: Boolean = false): Column =
    Shim.column(WordNgrams(Shim.expression(text), n, distinct))
  def wordTrigramHashes(text: Column, distinct: Boolean = false): Column =
    Shim.column(WordTrigramHashes(Shim.expression(text), distinct))
  def wordNgramHashes(text: Column, n: Int, distinct: Boolean = false): Column =
    Shim.column(WordNgramHashes(Shim.expression(text), n, distinct))
  def windowHashes(text: Column, winLen: Int): Column =
    Shim.column(WindowHashes(Shim.expression(text), winLen))
  def charEntropySum(text: Column): Column =
    Shim.column(CharEntropySum(Shim.expression(text)))
}
