package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{CosineSimilarityFloat, DotProductFloat, ExpressionArgs, PqReconstructFloat}

/** Column-level API for the native vector expressions.
  *
  * Spark 4 `Column` no longer wraps a Catalyst `Expression` directly,
  * so custom expressions are surfaced through the session's
  * `FunctionRegistry` + `call_function` (both public API).
  * `register` is idempotent and cheap — query builders call it before
  * constructing a plan that uses these columns.
  */
object VectorFunctions {

  val CosineName = "graft_cosine"
  val DotName    = "graft_dot"
  val PqReconstructName = "graft_pq_reconstruct"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      CosineName, exprs => CosineSimilarityFloat(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      DotName, exprs => DotProductFloat(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      PqReconstructName,
      exprs => PqReconstructFloat(exprs(0), exprs(1),
        ExpressionArgs.literalInt(exprs(2), PqReconstructName),
        ExpressionArgs.literalInt(exprs(3), PqReconstructName),
        ExpressionArgs.literalInt(exprs(4), PqReconstructName)),
      "scala_udf")
  }

  /** Cosine similarity of two array<float> columns (double result). */
  def cosine(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** Dot product of two array<float> columns (double result). */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** L2 norm of an array<float> column. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** PQ encode+reconstruct of an array<float> against an
    * array<array<float>> codebook (m subspaces of sub dims, k rows).
    */
  def pqReconstruct(x: Column, cb: Column, m: Int, sub: Int, k: Int): Column =
    call_function(PqReconstructName, x, cb, lit(m), lit(sub), lit(k))
}
