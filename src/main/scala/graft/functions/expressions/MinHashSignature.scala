package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle set (array<string>) in ONE pass:
  * base hash x = xxhash64(shingle bytes, seed 42) reduced mod `prime`,
  * then sig(j) = min over shingles of (a_j * x + b_j) mod prime, with
  * per-row coefficients (a_j, b_j) drawn from a fixed SplitMix64
  * stream — an independent affine hash per signature row.
  *
  * The affine-per-row family is load-bearing for LSH RECALL, not just
  * speed: an earlier form used double-hashing-style rows
  * ((2j+1)*x + j^2 + 7), whose row values are all monotone in x — one
  * shingle whose base hash lands near zero therefore wins the minimum
  * in EVERY row at once, and a near-dup pair differing by exactly
  * that shingle gets two completely disjoint signatures (observed on
  * the 100x gate: a Jaccard-0.9 pair with zero band collisions,
  * theoretical odds ~1e-23 under min-wise independent rows). With
  * independent (a_j, b_j) the rows decorrelate: P(row match) = J per
  * row regardless of where any single shingle's base hash lands, and
  * the banding guarantee (miss odds (1-J^r)^b) actually holds.
  *
  * Replaces the nested higher-order-function formulation
  * (`transform(sequence(...), i -> array_min(transform(xs, ...)))`),
  * which Catalyst evaluates interpreted per element — numHashes *
  * |shingles| boxed lambda calls per row. This expression runs the
  * double loop in primitive Java: one xxhash64 per shingle, then
  * numHashes fused multiply-mod steps, no allocation besides the
  * output array. (~20x faster on the dedup benchmark.)
  */
case class MinHashSignature(child: Expression, numHashes: Int, prime: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.requireStringArray(child.dataType, prettyName)

  @transient private lazy val (coefA, coefB) =
    MinHashSignature.coefficients(numHashes, prime)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val a = coefA
    val b = coefB
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val x = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      val xm = ((x % prime) + prime) % prime
      var j = 0
      while (j < numHashes) {
        // a_j, xm < prime < 2^30 -> product < 2^60, no overflow
        val h = (a(j) * xm + b(j)) % prime
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Fixed per-row affine coefficients: a_j uniform in [1, prime-1],
    * b_j uniform in [0, prime-1], from a SplitMix64 stream with a
    * constant seed — deterministic across JVMs and sessions (band
    * keys are persisted in LSH indexes; the stream must never move).
    */
  private[expressions] def coefficients(numHashes: Int,
                                        prime: Long): (Array[Long], Array[Long]) = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val a = Array.fill(numHashes)(java.lang.Math.floorMod(next(), prime - 1) + 1L)
    val b = Array.fill(numHashes)(java.lang.Math.floorMod(next(), prime))
    (a, b)
  }
}
