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

  /** Staging CTE for the disk-bounded NSW build oracles (r18, from
    * the r17 verdict's #3): embeddings pre-projected ONCE to 64
    * scalar DOUBLE columns `d1..d64` plus the staged norm `nrm` =
    * sqrt(Σ dᵢ²). The n×K assignment and n×√n neighbor joins then
    * score via [[cos64ColsSql]] and project only (id, id, score) —
    * three narrow columns through every window sort instead of two
    * 64-float LISTs per row, which is what exhausted >75 GB of
    * DuckDB spill in the r17 100× refresh. The CASE is the loud
    * dimension guard (r17 advice): a non-64-dim embedding raises
    * `error(...)` instead of silently reading NULL past the end of
    * the list and degenerating every score.
    *
    * `name` names the CTE; `source` (ADVICE r18) names the relation
    * read — defaulting to the `embeddings` table, overridable so a
    * future oracle can stage the same narrow form over a different
    * relation (it must expose `vec_id` and a 64-float `embedding`).
    */
  protected def emb64Cte(name: String,
                         source: String = "embeddings"): String = {
    val dcols = (1 to 64).map(i => s"d$i").mkString(", ")
    val proj = (1 to 64).map(i => s"embedding[$i]::DOUBLE AS d$i").mkString(", ")
    val sq = (1 to 64).map(i => s"d$i * d$i").mkString(" + ")
    s"""$name AS MATERIALIZED (SELECT vec_id, $dcols,
       |    CASE WHEN ok THEN sqrt($sq)
       |         ELSE error('embedding dim <> 64 in $name') END AS nrm
       |  FROM (SELECT vec_id, len(embedding) = 64 AS ok, $proj
       |        FROM $source))""".stripMargin
  }

  /** [[cos64Sql]] over two [[emb64Cte]] relations' scalar columns:
    * the same 64 products in the same left-to-right order, divided by
    * the two staged norms. Bit-identical to cos64Sql — projection
    * commutes with arithmetic (`dᵢ = embedding[i]::DOUBLE` is staged,
    * not recomputed differently), and `sqrt(dot(a,a))` is a pure
    * per-vector function, so hoisting it per vector instead of
    * per pair returns the identical double.
    */
  protected def cos64ColsSql(a: String, b: String): String = {
    val dot = (1 to 64).map(i => s"$a.d$i * $b.d$i").mkString("(", " + ", ")")
    s"($dot / ($a.nrm * $b.nrm))"
  }

  protected def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }


  protected def l2Sql(a: String): String =
    s"sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE)))"

}
