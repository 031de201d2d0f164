package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

/** Z-order layout: interleave arithmetic against a driver-side
  * reference, and the actual SKIPPING claim — the same box query
  * reads strictly fewer rows off the z-ordered layout than off a
  * single-column-sorted one, because parquet row-group envelopes on
  * (cx, cy) are tight in BOTH dimensions only under the z-order.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refZ(a: Long, b: Long): Long =
    (0 until LayoutOps.ZBits).map { i =>
      (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the bit-interleave reference") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (65535L, 65535L), (0x1234L, 0xABCDL), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === cases.map { case (a, b) => refZ(a, b) })
    // interleave of full-width cells fills all 32 low bits
    assert(refZ(65535L, 65535L) === (1L << 32) - 1L)
  }

  test("z-order locality: a contiguous z-range bounds both dimensions") {
    // any aligned z-interval of length 4^k is a 2^k x 2^k tile: check
    // on the 1024-long interval starting at 0 (a 32x32 tile)
    val tile = (0L until 1024L).map { z =>
      var a = 0L; var b = 0L
      (0 until 16).foreach { i =>
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    assert(tile.map(_._1).max < 32 && tile.map(_._2).max < 32)
    assert(tile.distinct.size === 1024)
  }

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("the box scan reads fewer rows from the z-layout than a 1-D sort") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
    val total = li.count()
    val boxFilter =
      col("cx") >= LayoutOps.BoxXLo && col("cx") <= LayoutOps.BoxXHi &&
        col("cy") >= LayoutOps.BoxYLo && col("cy") <= LayoutOps.BoxYHi
    // z-ordered layout (the production fixture)
    val zDir = LayoutOps.zLayoutDir(li, TestSpark.Sf0001)
    val zRead = scannedRows(spark.read.parquet(zDir).where(boxFilter))
    // same content sorted by cx only, same file count
    val linDir = java.nio.file.Files
      .createTempDirectory("graft-zspec-linear").toString
    li.select(
        col("l_partkey").bitwiseAND(lit(LayoutOps.CellMask)).as("cx"),
        col("l_suppkey").bitwiseAND(lit(LayoutOps.CellMask)).as("cy"),
        col("l_quantity"))
      .repartitionByRange(LayoutOps.ZFiles, col("cx"))
      .sortWithinPartitions("cx")
      .write.mode("overwrite").parquet(linDir)
    val linRead = scannedRows(spark.read.parquet(linDir).where(boxFilter))
    // the box is the full x half-range crossed with a narrow y band:
    // the cx-sorted layout cannot prune on cy at all
    assert(zRead < linRead,
      s"z-layout read $zRead rows, cx-sorted read $linRead of $total")
    assert(zRead * 2 <= linRead,
      s"expected >=2x skipping: z=$zRead linear=$linRead total=$total")
    // and both layouts agree with the source of truth
    val expected = li.where(
      col("l_partkey").bitwiseAND(lit(LayoutOps.CellMask))
        .between(LayoutOps.BoxXLo, LayoutOps.BoxXHi) &&
        col("l_suppkey").bitwiseAND(lit(LayoutOps.CellMask))
          .between(LayoutOps.BoxYLo, LayoutOps.BoxYHi)).count()
    assert(spark.read.parquet(zDir).where(boxFilter).count() === expected)
    assert(spark.read.parquet(linDir).where(boxFilter).count() === expected)
  }
}
