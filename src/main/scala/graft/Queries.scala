package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** One engine query: the Spark plan builder plus (when the semantics
  * are SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against.
  */
final case class QueryDef(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry wiring [[Tables]] to the operator families.
  * `SparkEntry` exposes exactly this map to the driver.
  *
  * Oracle dialect notes (DuckDB 1.0):
  *  - tokenization mirrors [[graft.functions.TextFunctions.tokens]]
  *    exactly (same regex, same empty-drop, same lower());
  *  - counts are BIGINT on both sides (Spark `size()` is cast);
  *  - double aggregates are rounded identically on both sides;
  *  - vector math reproduces the same IEEE754 op sequence as the
  *    native expressions in [[graft.functions.expressions]].
  */
object Queries
    extends QueriesWordcount with QueriesTextAnalysis with QueriesPipelines with QueriesDedup with QueriesSimilarity with QueriesRelational with QueriesEvents with QueriesMultimodal with QueriesSqlSurface {

  /** The composed registry — the per-family slices concatenated in
    * the original declaration order, so `queries`/`oracleSql` carry
    * the identical entries the single-file registry did. */
  val registry: Seq[(String, QueryDef)] =
    wordcountRegistry ++ textAnalysisRegistry ++ pipelinesRegistry ++ dedupRegistry ++ similarityRegistry ++ relationalRegistry ++ eventsRegistry ++ multimodalRegistry ++ sqlSurfaceRegistry

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.run }.toMap

  lazy val oracleSql: Map[String, String] =
    registry.flatMap { case (k, v) => v.oracle.map(k -> _) }.toMap
}
