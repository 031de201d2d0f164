package graft.functions.expressions

import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing fingerprints of a k-gram array (array<string>) in ONE
  * pass: per-gram hash = first 60 bits of md5(gram bytes) — exactly
  * `conv(substring(md5(g), 1, 15), 16, 10)::long`, read straight off
  * the digest bytes instead of through a 15-char hex string and a
  * base-16 re-parse — then the distinct per-window minima (window
  * `w`) via a monotonic deque: O(m) total, vs the composed
  * formulation's O(m·w) `slice`+`array_min` array allocations and
  * per-element interpreted `transform` lambda calls. First-occurrence
  * order matches `array_distinct(transform(sequence(...), i ->
  * array_min(slice(hs, i, w))))` bit-for-bit (asserted by
  * TextFunctionsSpec and the winnow SQL parity test, which still runs
  * the composed SQL against this native path); documents with fewer
  * than `w` grams yield an empty array, which `explode` then drops —
  * the `size(hs) >= w` guard folded in.
  *
  * One reused MessageDigest per row (Spark's `md5()` allocates a
  * DigestUtils per call) — with the deque this cuts the winnow family
  * ~2-4x on the bench.
  */
case class WinnowFingerprintsExpr(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.requireStringArray(child.dataType, prettyName)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // value of the first 15 hex chars of the digest = the first
      // 60 bits: 7 full bytes then the high nibble of byte 7
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    // monotonic deque of indices: head holds the current window min
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val seen = new java.util.HashSet[Long]()
    val out = new ArrayBuffer[Any](16)
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = hs(deque(head))
        if (seen.add(v)) out += v
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
