package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D cell: maps `(x, y)` on the
  * `2^bits x 2^bits` grid to its distance `d` along the Hilbert
  * curve (the standard xy2d rotation/reflection walk — public
  * algorithm, e.g. Hamilton's compact Hilbert indices and the
  * well-known iterative formulation).
  *
  * Z-order ([[graft.operators.LayoutOps.zValue]]) is a stateless
  * bit-interleave, so it is expressible as a sum of independent
  * shift terms; the Hilbert walk carries a rotation STATE across
  * levels, so it is a genuine loop — exactly the case where a native
  * Catalyst expression with `doGenCode` beats both a UDF (boxing per
  * row) and a chained-Column unroll (the per-level rotation
  * references the previous level's x and y several times, so project
  * collapsing would grow the expression tree exponentially in
  * `bits`). The generated code is the same `bits`-iteration integer
  * loop the interpreted path runs.
  *
  * Why bother next to Z-order: a contiguous Hilbert range is a
  * CONNECTED region (successive cells are always Manhattan-adjacent,
  * which the spec pins), so file envelopes on (x, y) are tighter for
  * the same file count — Z-order's long diagonal jumps periodically
  * stretch an envelope across half the grid.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits out of range: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  /** Coordinates outside `[0, 2^bits)` are wrapped onto the grid by
    * masking to the low `bits` bits (the same masking the layout
    * path applies before calling) — without it, high bits leak into
    * the `s-1-x` reflections and the walk returns values that are
    * not on the curve at all (possibly negative).
    */
  private val mask: Long = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** DuckDB mirror of the same walk: one chained CTE per level
    * carrying `(x, y, d)` — the rotation state that keeps this from
    * being a closed-form term sum. `from` must expose columns
    * `x`, `y`, `d` (d = 0) plus `carry` columns passed through
    * unchanged; the result CTE is named `h$bits`... the LAST round's
    * name is returned so the caller can select from it.
    *
    * Per level with half-width s (integers only, so the hash gate
    * pins the arithmetic cross-engine):
    *   quadrant q = (3*rx) XOR ry  in {0,1,2,3}
    *   d' = d + s*s*q
    *   ry=1 -> (x, y) unchanged
    *   ry=0, rx=0 -> swap:        (y, x)
    *   ry=0, rx=1 -> flip + swap: (s-1-y, s-1-x)
    */
  def sqlRounds(from: String, bits: Int, carry: Seq[String]): (String, String) = {
    val keep = carry.map(c => s", $c").mkString
    val rounds = (1 to bits).map { r =>
      val s = 1L << (bits - r)
      val prev = if (r == 1) from else s"h${r - 1}"
      s"""h$r AS (SELECT
         |  CASE WHEN (y & $s) > 0 THEN x
         |       WHEN (x & $s) > 0 THEN ($s - 1) - y ELSE y END AS x,
         |  CASE WHEN (y & $s) > 0 THEN y
         |       WHEN (x & $s) > 0 THEN ($s - 1) - x ELSE x END AS y,
         |  d + ${s * s} * (CASE WHEN (x & $s) > 0 AND (y & $s) > 0 THEN 2
         |       WHEN (x & $s) > 0 THEN 3
         |       WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d$keep
         |  FROM $prev)""".stripMargin
    }
    (rounds.mkString(",\n"), s"h$bits")
  }
}
