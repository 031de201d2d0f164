package graft.functions.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text primitives — semantics identical to the
  * `org.apache.spark.sql.functions` compositions in
  * [[graft.functions.TextFunctions]] (the reference implementations;
  * tests assert equivalence), but evaluated as tight byte-level loops
  * instead of per-element interpreted lambda calls. On the sf0.1
  * bench the higher-order-function formulations dominate the text
  * queries' runtime; these cut the hot ones by ~2-20x.
  */

/** lower + split on StringTokenizer delimiters (" \t\n\r\f") + drop
  * empties == `filter(split(lower(text), "[ \t\n\r\f]+"), _ != '')`.
  * Delimiters are all ASCII, and UTF-8 continuation bytes are >=0x80,
  * so a byte-level scan can never split inside a multibyte char.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.require(child.dataType == StringType, prettyName, "string", child.dataType)

  @inline private def isDelim(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  override def nullSafeEval(input: Any): Any = {
    val lower = input.asInstanceOf[UTF8String].toLowerCase
    val bytes = lower.getBytes
    val out = new ArrayBuffer[UTF8String](16)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || isDelim(bytes(i))) {
        if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Space-joined word n-grams over an array<string>; empty result
  * below n tokens == `TextFunctions.wordNgrams`.
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.requireStringArray(child.dataType, prettyName)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      System.arraycopy(words, i, parts, 0, n)
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint over an array<string>:
  * h = (31*h + 7*numChars(w) + codePoint(w[0])) mod 1e9+7
  * == `TextFunctions.rollingFingerprint`.
  */
case class RollingFingerprintExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.requireStringArray(child.dataType, prettyName)

  private val P = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var h = 0L
    var i = 0
    while (i < m) {
      val w = arr.getUTF8String(i)
      // ascii() semantics: code point of the first character (0 if empty)
      val first =
        if (w.numBytes == 0) 0L
        else {
          val b = w.getByte(0) & 0xff
          if (b < 0x80) b.toLong else w.toString.codePointAt(0).toLong
        }
      h = (h * 31L + (7L * w.numChars() + first)) % P
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Resolve a function's `n` argument from SQL: accepts int/long
  * literals (or any foldable integral expression) with a clear error
  * otherwise, instead of a raw ClassCastException at plan time.
  */
object ExpressionArgs {
  def literalInt(e: Expression, fn: String): Int =
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: the n argument must be a constant, got a non-literal expression")
    else e.eval() match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long    => l.intValue
      case s: java.lang.Short   => s.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: the n argument must be an integer literal, got $other")
    }

  def literalDouble(e: Expression, fn: String): Double =
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: the argument must be a constant, got a non-literal expression")
    else e.eval() match {
      case d: java.lang.Double  => d.doubleValue
      case f: java.lang.Float   => f.doubleValue
      case i: java.lang.Integer => i.doubleValue
      case l: java.lang.Long    => l.doubleValue
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: the argument must be a numeric literal, got $other")
    }
}

/** Shared analysis-time type checks for the SQL-exposed expressions. */
private[expressions] object TextExprChecks {
  def require(ok: Boolean, fn: String, expected: String,
              got: org.apache.spark.sql.types.DataType): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn requires $expected, got ${got.sql}")

  def requireStringArray(dt: org.apache.spark.sql.types.DataType, fn: String): TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"$fn requires array<string>, got ${other.sql}")
    }
}
