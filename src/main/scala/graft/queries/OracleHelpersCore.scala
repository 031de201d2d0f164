package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

import graft.operators.{SimilarityOps, TextAnalysisOps, GraphOps, EventsOps}

/** Cross-family oracle primitives: the tokenizer/shingle/vector-math
  * SQL every other helper trait builds on. Pure string generation. */
private[graft] trait OracleHelpersCore {


  /** Watermark delay (ms) of the streamed watermark layout — the
    * oracle must apply the same horizon the stream ran with.
    */
  protected val wmDelayMs = graft.streaming.EventStreams.WatermarkDelayMs


  protected val toksSql =
    """list_filter(string_split_regex(lower(text), '[ \t\n\r\f]+'), w -> w <> '')"""


  /** DuckDB: distinct word n-gram shingles of the token list `ws`. */
  protected def shinglesSql(n: Int): String =
    s"list_distinct(list_transform(generate_series(1, len(ws) - ${n - 1}), i -> array_to_string(ws[i:i+${n - 1}], ' ')))"


  /** DuckDB: double-precision cosine between two list<float> exprs —
    * identical op order to CosineSimilarityFloat.doGenCode.
    */
  protected def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }


  protected def l2Sql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))"

}
