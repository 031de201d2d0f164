package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{ExpressionArgs, KmvDistinctEstimate}

/** Column API over the sketch aggregate(s). `register` is idempotent;
  * operators call it before building plans (the analyzer wraps the
  * returned AggregateFunction in an AggregateExpression).
  */
object SketchFunctions {

  val KmvName = "graft_kmv_est"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      KmvName,
      es => KmvDistinctEstimate(es(0), ExpressionArgs.literalInt(es(1), KmvName)),
      "scala_udf")
  }

  /** KMV distinct-count estimate over a 60-bit hash column (double). */
  def kmvEst(hash: Column, k: Int): Column =
    call_function(KmvName, hash, lit(k))
}
