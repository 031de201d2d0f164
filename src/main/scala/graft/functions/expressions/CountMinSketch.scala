package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch hashing, shared by the aggregate and the probe:
  * row j's bucket for 60-bit key hash x is
  * `((2j+1)·(x mod P) + j² + 7) mod P mod w`, with every intermediate
  * fitting a signed 64-bit integer (x mod P < 2³⁰, 2j+1 small), so
  * DuckDB reproduces each bucket — and therefore every counter and
  * every probe — bit-for-bit. The rows of this family are correlated
  * in the tail (a tiny x gives small values in every row) — harmless
  * here, where row correlation only nudges collision RATES and the
  * oracle mirrors the exact buckets; [[MinHashSignature]] had to
  * abandon the shared family because minhash-LSH recall depends on
  * min-wise independent rows (see its scaladoc).
  */
object CmsHash {
  val P = 1000000007L
  // floorMod, not %: the registered SQL functions accept ANY bigint
  // (xxhash64 keys are negative half the time), and a sign-preserving
  // mod produced a negative bucket -> AIOOBE in the executor. For the
  // non-negative 60-bit md5-prefix hashes every committed oracle
  // uses, floorMod == % — no committed value changes.
  def bucket(x: Long, j: Int, w: Int): Int =
    ((((2L * j + 1L) * java.lang.Math.floorMod(x, P) + j.toLong * j + 7L) % P) % w).toInt
}

/** Count-min sketch as the engine's third TypedImperativeAggregate:
  * a d×w long counter grid (flattened row-major) over a stream of
  * 60-bit md5-prefix key hashes. CONSTANT memory (d·w counters)
  * regardless of key cardinality, merge = elementwise add (fully
  * mergeable, so map-side partials ride ObjectHashAggregate's one
  * exchange), and — because the hash family is deterministic — the
  * whole grid is oracle-reproducible in SQL: per row j, bucket b's
  * counter is the sum of counts of all keys hashing to (j, b).
  *
  * Point estimates come from [[CmsProbe]]: min over rows of the
  * key's counter, an upper bound that overcounts only on bucket
  * collisions (error ≤ N·e/w with probability 1−e^−d). The
  * heavy-hitter workflow at 100 TB: ONE pass builds the 8 KB grid,
  * then any key's frequency is a row-local probe of the broadcast
  * sketch — no second corpus scan per question.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(d >= 1 && d <= 16, "cms depth d must be in [1, 16]")
  require(w >= 2, "cms width w must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.require(child.dataType == LongType, prettyName,
      "bigint", child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < d) { buf(j * w + CmsHash.bucket(x, j, w)) += 1L; j += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** Point query against a [[CountMinAgg]] grid: `min over rows j of
  * sketch[j·w + bucket_j(x)]` — row-local, so probing a broadcast
  * sketch costs d array reads per key.
  */
case class CmsProbe(left: Expression, right: Expression, d: Int, w: Int)
    extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  require(d >= 1 && d <= 16, "cms depth d must be in [1, 16]")
  require(w >= 2, "cms width w must be >= 2")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) =>
        TextExprChecks.require(right.dataType == LongType, prettyName,
          "bigint key hash", right.dataType)
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> sketch, got ${other.sql}")
    }

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData]
    val x = key.asInstanceOf[Long]
    var est = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = arr.getLong(j * w + CmsHash.bucket(x, j, w))
      if (c < est) est = c
      j += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsProbe =
    copy(left = newLeft, right = newRight)
}
