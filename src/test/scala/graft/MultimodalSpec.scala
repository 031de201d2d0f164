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

  test("WavCodec round-trips its own encoder output") {
    import graft.operators.WavCodec
    val payload = "hello wav".getBytes("US-ASCII") // 9 bytes
    val mono = WavCodec.decode(WavCodec.encode(payload, 8000, 1))
    assert(mono.sampleRate === 8000L && mono.nChannels === 1L &&
      mono.bitsPerSample === 16L)
    assert(mono.nFrames === 9L && mono.durationMs === 9L * 1000 / 8000)
    val amps = payload.map(b => math.abs(((b & 0xff) - 128) * 256).toLong)
    assert(mono.peakAmp === amps.max)
    assert(mono.meanAbsAmp === amps.sum / 9)
    // stereo: 9 samples zero-pad to 5 frames × 2ch = 10 samples
    val st = WavCodec.decode(WavCodec.encode(payload, 16000, 2))
    assert(st.nChannels === 2L && st.nFrames === 5L)
    assert(st.meanAbsAmp === amps.sum / 10)
    val empty = WavCodec.decode(WavCodec.encode(Array.emptyByteArray, 8000, 2))
    assert(empty.nFrames === 0L && empty.peakAmp === 0L && empty.meanAbsAmp === 0L)
  }

  test("WavCodec.decode is a general parser, not the encoder's inverse") {
    import graft.operators.WavCodec
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    // hand-built 8-bit mono WAV this repo's encoder can never emit:
    // fmt AFTER an unknown odd-sized chunk, plus a trailing junk chunk
    val samples8 = Array[Int](128, 255, 0, 200) // unsigned, bias 128
    val junk = cc("junk") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd + pad
    val fmt = cc("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(11025) ++
      le32(11025) ++ le16(1) ++ le16(8)
    val data = cc("data") ++ le32(4) ++ samples8.map(_.toByte)
    val tail = cc("xtra") ++ le32(2) ++ Array[Byte](9, 9)
    val body = cc("WAVE") ++ junk ++ fmt ++ data ++ tail
    val wav = cc("RIFF") ++ le32(body.length) ++ body
    val info = WavCodec.decode(wav)
    assert(info.sampleRate === 11025L && info.nChannels === 1L &&
      info.bitsPerSample === 8L)
    assert(info.nFrames === 4L)
    assert(info.peakAmp === 128L) // |0 - 128|
    assert(info.meanAbsAmp === (0L + 127 + 128 + 72) / 4)
    // malformed containers fail loudly, not silently
    intercept[IllegalArgumentException](WavCodec.decode(cc("RIFX") ++ wav.drop(4)))
    intercept[IllegalArgumentException](WavCodec.decode(wav.take(30)))
  }

  test("WavCodec segment decode is consistent with the whole-file decode") {
    import graft.operators.WavCodec
    val payload = ("the quick brown fox " * 20).getBytes("US-ASCII") // 400 bytes
    for (ch <- Seq(1, 2)) {
      val wav = WavCodec.encode(payload, 8000, ch)
      val whole = WavCodec.decode(wav)
      val segs = WavCodec.decodeSegments(wav, 25)
      assert(segs.map(_.nFrames).sum === whole.nFrames)
      assert(segs.map(_.peakAmp).max === whole.peakAmp)
      assert(segs.map(_.segIdx) === segs.indices.map(_.toLong))
      // all but the last window are exactly 25 frames
      assert(segs.dropRight(1).forall(_.nFrames === 25L))
      assert(segs.last.nFrames === whole.nFrames - 25L * (segs.length - 1))
      // per-segment means reassemble to the whole-file sum
      val sumFromSegs = segs.map(s => {
        // mean rounds down, so reconstruct bounds instead of equality
        s.meanAbsAmp * s.nFrames * ch
      }).sum
      val wholeSum = whole.meanAbsAmp * whole.nFrames * ch
      assert(math.abs(sumFromSegs - wholeSum) <= (segs.length + 1L) * 25L * ch)
    }
    assert(WavCodec.decodeSegments(WavCodec.encode(Array.emptyByteArray, 8000, 1), 25).isEmpty)
  }

  test("wavFeatures derives features from parsed container structure") {
    val out = MultimodalOps.wavFeatures(Tables.documents(spark, TestSpark.Sf0001))
    assert(out.columns.toSeq === Seq("doc_id", "sample_rate", "n_channels",
      "bits_per_sample", "n_frames", "duration_ms", "peak_amp", "mean_abs_amp"))
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 8000L + (id % 3) * 4000L, s"doc $id sample_rate")
      assert(r.getLong(2) === 1L + id % 2, s"doc $id n_channels")
      assert(r.getLong(3) === 16L)
      assert(r.getLong(5) === r.getLong(4) * 1000L / r.getLong(1), s"doc $id duration")
    }
  }

  test("decode quarantine splits corrupt containers from decodable ones") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val verdicts = MultimodalOps.wavQuarantine(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val frames = MultimodalOps.wavFeatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(verdicts.nonEmpty)
    verdicts.foreach { case (id, (ok, nf, err)) =>
      if (id % 2 == 1) assert(ok === 0L && nf === -1L && err === "rejected", s"doc $id")
      else assert(ok === 1L && nf === frames(id) && err === "", s"doc $id")
    }
    // both classes occur — a constant verdict means the injection or
    // the catch path went dead
    assert(verdicts.values.map(_._1).toSet === Set(0L, 1L))
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
