package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions over `array<float>` embedding columns.
  *
  * These are the hot path of the similarity-search operators: a Scala
  * UDF would box every element (Float => java.lang.Float, array =>
  * WrappedArray) per row; these read primitives straight out of the
  * Tungsten `ArrayData` and participate in whole-stage codegen via
  * `doGenCode`, so the dot-product loop compiles into the generated
  * stage with zero allocation.
  *
  * Accumulation is double-precision, strictly in element order — the
  * DuckDB oracle reproduces the identical IEEE754 operation sequence
  * (`list_sum(list_transform(...))`), which keeps hash-compare exact.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // exposed to arbitrary SQL via GraftExtensions/Catalog, so reject
  // wrong argument types at analysis instead of reinterpreting bits
  // (AbstractDataType is private[sql], hence no ExpectsInputTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
}

/** dot(a, b) = sum_i a(i)*b(i), in double precision. */
case class DotProductFloat(left: Expression, right: Expression)
    extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode + reconstruct in one native pass:
  * for each of `m` subspaces, pick the codebook row minimizing
  * `|c|² − 2·x·c` (the |x|² term is constant across rows and
  * dropped; ties resolve to the LOWEST row index, matching
  * `array_min(struct(d, j))`), then emit the concatenation of the
  * winning rows' subspace slices — the reconstructed vector the
  * quantized screen scores against.
  *
  * Replaces the interpreted nested-`transform` formulation in
  * [[graft.operators.SimilarityOps.annPq]]: m·k subspace dot
  * products per vector ran as per-element Catalyst lambdas (measured
  * 34 s at the 10× sweep); this loop does the identical double
  * arithmetic — same accumulation order, same tie rule, bit-equal
  * results — in one JVM pass per row.
  */
case class PqReconstructFloat(left: Expression, right: Expression,
                              m: Int, sub: Int, k: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m >= 1 && sub >= 1 && k >= 1, "pq dims must be positive")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_reconstruct"

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(inner, _)) if isFloatArray(l) && isFloatArray(inner) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<float>>), got " +
          s"${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(xAny: Any, cbAny: Any): Any = {
    val x = xAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    // validate shapes up front: this is a registered SQL function, so
    // malformed input must fail with a diagnosable error, not an
    // executor ArrayIndexOutOfBounds mid-loop
    require(x.numElements() >= m * sub,
      s"$prettyName: vector has ${x.numElements()} dims, needs >= ${m * sub} (m*sub)")
    require(cb.numElements() >= k,
      s"$prettyName: codebook has ${cb.numElements()} rows, needs >= $k (k) — " +
        "a truncated codebook would silently change encodings")
    val nRows = k
    var r = 0
    while (r < nRows) {
      require(cb.getArray(r).numElements() >= m * sub,
        s"$prettyName: codebook row $r has ${cb.getArray(r).numElements()} dims, needs >= ${m * sub}")
      r += 1
    }
    val out = new Array[Float](m * sub)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < nRows) {
        val c = cb.getArray(j)
        // identical op order to dot(c,c) and dot(x_sub,c): double
        // accumulate in element order, then d = cc - 2.0*xc
        var cc = 0.0
        var xc = 0.0
        var i = 0
        while (i < sub) {
          val ci = c.getFloat(off + i).toDouble
          cc += ci * ci
          xc += x.getFloat(off + i).toDouble * ci
          i += 1
        }
        val d = cc - 2.0 * xc
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      val win = cb.getArray(bestJ)
      var i = 0
      while (i < sub) { out(off + i) = win.getFloat(off + i); i += 1 }
      mi += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The encode half of [[PqReconstructFloat]], factored out so a
  * persisted IVF-PQ layout can store what a real billion-vector index
  * stores: `m` small ints per vector (the code word), not floats.
  * codes(mi) = argmin_j (|c_mi,j|² − 2·x_mi·c_mi,j) with the IDENTICAL
  * loop, accumulation order, and lowest-j tie rule as the fused form,
  * so `PqDecodeFloat(PqEncodeInts(x)) == PqReconstructFloat(x)` bit
  * for bit — the equality SimilaritySpec pins.
  */
case class PqEncodeInts(left: Expression, right: Expression,
                        m: Int, sub: Int, k: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m >= 1 && sub >= 1 && k >= 1, "pq dims must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(inner, _)) if isFloatArray(l) && isFloatArray(inner) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<array<float>>), got " +
          s"${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(xAny: Any, cbAny: Any): Any = {
    val x = xAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    require(x.numElements() >= m * sub,
      s"$prettyName: vector has ${x.numElements()} dims, needs >= ${m * sub} (m*sub)")
    require(cb.numElements() >= k,
      s"$prettyName: codebook has ${cb.numElements()} rows, needs >= $k (k) — " +
        "a truncated codebook would silently change encodings")
    var r = 0
    while (r < k) {
      require(cb.getArray(r).numElements() >= m * sub,
        s"$prettyName: codebook row $r has ${cb.getArray(r).numElements()} dims, needs >= ${m * sub}")
      r += 1
    }
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      var bestJ = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val c = cb.getArray(j)
        var cc = 0.0
        var xc = 0.0
        var i = 0
        while (i < sub) {
          val ci = c.getFloat(off + i).toDouble
          cc += ci * ci
          xc += x.getFloat(off + i).toDouble * ci
          i += 1
        }
        val d = cc - 2.0 * xc
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The decode half: concatenate the coded rows' subspace slices back
  * into a full vector. Pure copy — no arithmetic — so the decoded
  * vector is exactly the slices [[PqEncodeInts]]' winners hold, i.e.
  * exactly what [[PqReconstructFloat]] emits for the same input.
  */
case class PqDecodeFloat(left: Expression, right: Expression,
                         m: Int, sub: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(m >= 1 && sub >= 1, "pq dims must be positive")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isIntArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(inner, _)) if isIntArray(l) && isFloatArray(inner) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<float>>), got " +
          s"${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(codesAny: Any, cbAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    require(codes.numElements() == m,
      s"$prettyName: code word has ${codes.numElements()} entries, needs $m (m)")
    val out = new Array[Float](m * sub)
    var mi = 0
    while (mi < m) {
      val j = codes.getInt(mi)
      require(j >= 0 && j < cb.numElements(),
        s"$prettyName: code $j out of codebook range [0, ${cb.numElements()})")
      val c = cb.getArray(j)
      require(c.numElements() >= (mi + 1) * sub,
        s"$prettyName: codebook row $j has ${c.numElements()} dims, needs >= ${(mi + 1) * sub}")
      val off = mi * sub
      var i = 0
      while (i < sub) { out(off + i) = c.getFloat(off + i); i += 1 }
      mi += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (||a|| * ||b||); 0.0 when either norm is 0. */
case class CosineSimilarityFloat(left: Expression, right: Expression)
    extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
