package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count estimate as a REAL aggregate
  * function — the custom-UDAF surface of the engine
  * (TypedImperativeAggregate, planned through ObjectHashAggregate
  * with map-side partials).
  *
  * Input: the md5-derived 60-bit hash of the key, as double (same
  * value stream as [[graft.operators.EventsOps.kmvDistinctEvents]]'s
  * window formulation). The buffer keeps the k smallest DISTINCT
  * hashes; eval estimates n ≈ (k-1)/θ with θ = k-th smallest
  * normalized hash, reporting exactly when fewer than k distinct
  * hashes were seen. Deterministic — bit-for-bit the same answer as
  * the window formulation and the DuckDB oracle.
  *
  * Scale: the window formulation pays a distinct exchange plus a
  * window exchange; this aggregate folds dedup into the k-bounded
  * buffer, so the plan is ONE exchange carrying at most k values per
  * (group, map task) — the textbook mergeable-sketch shape.
  */
case class KmvDistinctEstimate(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv k must be >= 2")

  private val maxHash = math.pow(2.0, 60) // hashes are 60-bit md5 prefixes

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprChecks.require(child.dataType == DoubleType, prettyName,
      "double", child.dataType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_est"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def insert(buf: java.util.TreeSet[java.lang.Double], d: Double): Unit = {
    if (buf.size < k) buf.add(d)
    else if (d < buf.last) { if (buf.add(d)) buf.pollLast() }
    // d >= current k-th smallest: can never enter the k-minimum set
  }

  override def update(buf: java.util.TreeSet[java.lang.Double],
                      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
                     other: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val m = buf.size
    if (m < k) m.toLong
    else {
      // same rounding as the SQL round() both engines apply
      val est = (k - 1).toDouble / (buf.last / maxHash)
      new java.math.BigDecimal(est)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble) ; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctEstimate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctEstimate =
    copy(child = newChild)
}
