package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fixed-grid histogram quantile estimate as a mergeable aggregate —
  * the scale-safe companion to exact `percentile`: the exact form
  * buffers EVERY group value before interpolating, so a hot group's
  * buffer is the group (the orders_ntile wall, in aggregate form);
  * this sketch's state is a CONSTANT `bins + 2` long counters
  * (under/overflow slots included), merged by element-wise addition —
  * the same mergeable-sketch shape as [[KmvDistinctEstimate]], one
  * exchange, map-side partials, no per-group memory growth.
  *
  * Unlike t-digest/GK summaries (whose estimates depend on merge
  * order), a fixed grid is ORDER-INSENSITIVE: bin counts are plain
  * sums, and the estimate is a pure function of them — so the result
  * is bit-stable under repartitioning and reproducible in DuckDB SQL,
  * which is what lets the driver hash-gate it.
  *
  * Estimate: with n values and target rank t = p·n, find the first
  * bin whose cumulative count reaches t and interpolate linearly
  * inside it: lo + (bin-1)·w + w·(t - cum_before)/count_bin (clamped
  * to lo / hi in the under/overflow slots). Accuracy is ±w — choose
  * the grid from domain knowledge (here: prices on a known range).
  */
case class HistQuantile(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int,
    p: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(bins >= 1, "hist_quantile bins must be >= 1")
  require(hi > lo, "hist_quantile needs hi > lo")
  require(p > 0.0 && p < 1.0, "hist_quantile p must be in (0, 1)")

  private val w = (hi - lo) / bins

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.require(child.dataType == DoubleType, prettyName,
      "double", child.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hist_quantile"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // same arithmetic the SQL oracle's CASE runs; values landing on
      // the hi edge via FP round-up fall in the overflow slot on both
      // engines
      val idx =
        if (d < lo) 0
        else if (d >= hi) bins + 1
        else 1 + ((d - lo) / w).toInt
      buf(math.min(idx, bins + 1)) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += buf(i); i += 1 }
    if (n == 0L) null
    else {
      val target = p * n
      var cum = 0L
      var bin = -1
      i = 0
      while (bin < 0 && i < buf.length) {
        cum += buf(i)
        if (cum >= target) bin = i
        i += 1
      }
      if (bin == 0) lo
      else if (bin == bins + 1) hi
      else {
        val cumBefore = cum - buf(bin)
        lo + (bin - 1).toDouble * w + w * ((target - cumBefore) / buf(bin))
      }
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)
}
