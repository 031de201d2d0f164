package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom filter over 60-bit key hashes — the engine's fourth sketch
  * (KMV, histogram, count-min, bloom). Bit positions come from the
  * SAME deterministic affine hash family as the count-min grid
  * ([[CmsHash.bucket]], proven cross-engine), so set membership —
  * including every false positive — is oracle-reproducible in SQL:
  * bit b is set iff SOME inserted key y and hash row j' have
  * `bucket(y, j') = b`, and a probe of x is positive iff ALL its k
  * positions are set.
  *
  * The 100 TB role: a fixed-size (mBits/8 bytes) mergeable summary
  * of the ingested-corpus digest index that BROADCASTS, turning the
  * steady-state incremental-dedup anti join into a row-local probe
  * over the incoming batch — the corpus index is touched only to
  * build (or incrementally extend) the sketch, never re-joined per
  * batch. False positives over-drop at a bounded rate
  * (~(1−e^{−kn/m})^k); exact reconciliation can run offline on the
  * survivors when over-dropping matters.
  */
case class BloomAgg(
    child: Expression,
    k: Int,
    mBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(k >= 1 && k <= 16, "bloom hash count k must be in [1, 16]")
  // upper bound: (a) aggregation buffers are per-group, so an unbounded
  // literal in registered SQL allocates mBits/64 longs per group;
  // (b) CmsHash.bucket reduces mod P (~1e9+7), so mBits > P would leave
  // high bits forever unset. 1<<27 bits = 16 MiB, far below both hazards.
  require(mBits >= 64 && mBits <= (1 << 27) && mBits % 64 == 0,
    "bloom mBits must be a multiple of 64 in [64, 2^27]")

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.require(child.dataType == LongType, prettyName,
      "bigint", child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val b = CmsHash.bucket(x, j, mBits)
        buf(b >>> 6) |= (1L << (b & 63))
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Membership probe against a [[BloomAgg]] bitmap: true iff every
  * one of the key's k bit positions is set. Row-local — probing a
  * broadcast sketch costs k word reads per key.
  */
case class BloomProbe(left: Expression, right: Expression, k: Int, mBits: Int)
    extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  require(k >= 1 && k <= 16, "bloom hash count k must be in [1, 16]")
  // upper bound: (a) aggregation buffers are per-group, so an unbounded
  // literal in registered SQL allocates mBits/64 longs per group;
  // (b) CmsHash.bucket reduces mod P (~1e9+7), so mBits > P would leave
  // high bits forever unset. 1<<27 bits = 16 MiB, far below both hazards.
  require(mBits >= 64 && mBits <= (1 << 27) && mBits % 64 == 0,
    "bloom mBits must be a multiple of 64 in [64, 2^27]")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(LongType, _) =>
        TextExprChecks.require(right.dataType == LongType, prettyName,
          "bigint key hash", right.dataType)
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> bitmap, got ${other.sql}")
    }

  override def nullSafeEval(bitmap: Any, key: Any): Any = {
    val arr = bitmap.asInstanceOf[ArrayData]
    val x = key.asInstanceOf[Long]
    var j = 0
    while (j < k) {
      val b = CmsHash.bucket(x, j, mBits)
      if ((arr.getLong(b >>> 6) & (1L << (b & 63))) == 0L) return false
      j += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}
