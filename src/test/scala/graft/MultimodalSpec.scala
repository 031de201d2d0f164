package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaFeatures, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("decodeStub byte math") {
    val f = MultimodalOps.decodeStub(MediaRecord(7L, "abc".getBytes("UTF-8")))
    assert(f === MediaFeatures(7L, 3L, 97L, (97 + 98 + 99) % 65521, 1L))
    val empty = MultimodalOps.decodeStub(MediaRecord(1L, Array.emptyByteArray))
    assert(empty.first_byte === -1L && empty.n_frames === 0L)
    val big = MultimodalOps.decodeStub(MediaRecord(2L, Array.fill(513)('x'.toByte)))
    assert(big.n_frames === 3L)
  }

  test("pipeline runs over the fixture with stable schema") {
    val out = MultimodalOps.mediaFeatures(Tables.documents(spark, TestSpark.Sf0001))
    assert(out.columns.toSeq ===
      Seq("doc_id", "n_bytes", "first_byte", "checksum", "n_frames"))
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(4) === (r.getLong(1) + 255L) / 256L)
    }
  }
}
