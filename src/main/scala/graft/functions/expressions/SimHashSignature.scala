package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint of a token array (array<string>) in ONE pass.
  *
  * Per word: hash = first 60 bits of md5(word) mod 4294967291 (the
  * largest prime below 2^32 — full entropy in every usable bit;
  * identical to `conv(substring(md5(w),1,15),16,10) % 4294967291`, so
  * the DuckDB oracle formulation is unchanged). Per bit j < `bits`:
  * count +1 when hash bit j is set else -1 over all words; the
  * fingerprint sets bit j when the count is positive.
  *
  * Replaces the `bits` separate `aggregate()` higher-order calls per
  * row (each re-walking the token array interpreted, with one boxed
  * lambda call per element) with a primitive double loop and ONE md5
  * per word — the same treatment [[MinHashSignature]] gave the
  * minhash path.
  */
case class SimHashSignature(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 60, "simhash bits must be in [1, 60]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.requireStringArray(child.dataType, prettyName)

  // MessageDigest is stateful and NOT thread-safe; a plan fragment can
  // be evaluated from several executor threads at once, so the digest
  // is per-thread (the same pattern Spark's own stateful expressions
  // use), never shared across threads
  @transient private lazy val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val digest = md5.get()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val d = digest.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex digits = 7 whole bytes + the high nibble of the 8th
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      val h = v % 4294967291L
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
