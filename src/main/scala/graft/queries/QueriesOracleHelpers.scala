package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Shared oracle-SQL builders of the query registry — now a thin
  * COMPOSITION of the per-family helper traits living next to their
  * registry slices (round-17 follow-through of the registry split):
  * [[OracleHelpersCore]] (tokenizer/vector primitives),
  * [[OracleHelpersSimilarity]], [[OracleHelpersDedup]],
  * [[OracleHelpersText]], [[OracleHelpersRelational]]. Pure string
  * generation throughout; the split is hash-neutral by construction
  * (the composed registry Seq is the same values in the same order,
  * pinned by RegistryCompositionSpec and the standing gates).
  */
private[graft] trait QueriesOracleHelpers
  extends OracleHelpersCore
  with OracleHelpersSimilarity
  with OracleHelpersDedup
  with OracleHelpersText
  with OracleHelpersRelational
