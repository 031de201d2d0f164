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
  /** [[cosSql]] with the three dot products UNROLLED to explicit
    * left-to-right 64-term sums (the embeddings tables' fixed dim).
    * Bit-identical to the list_sum(list_transform(...)) form —
    * DuckDB's list_sum accumulates left-to-right, measured equal on
    * every fixture pair set (92,000/92,000) — but ~4x faster per
    * pair because no per-pair list is materialized, which is what
    * makes the NSW graph-build oracles (n x sqrt(n) cosine pairs)
    * runnable at the 100x fixture: 796 s -> ~190 s per assignment
    * leg measured at 200k x 448. ONLY for 64-dim embedding columns;
    * variable-dim surfaces (JL projections) stay on [[cosSql]].
    */
  protected def cos64Sql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      (1 to 64).map(i => s"$x[$i]::DOUBLE * $y[$i]::DOUBLE")
        .mkString("(", " + ", ")")
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  protected def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }


  protected def l2Sql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))"

}
