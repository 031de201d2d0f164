package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmpCodec, MultimodalOps}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("BmpCodec round-trips its own encoder output at both depths") {
    val payload = "the quick brown fox jumps over the lazy dog".getBytes("US-ASCII") // 43 B
    for (bits <- Seq(8, 24)) {
      val info = BmpCodec.decode(BmpCodec.encode(payload, 17, bits))
      assert(info.width === 17L && info.height === 3L, s"$bits-bit geometry")
      assert(info.bitsPerPixel === bits.toLong)
      assert(info.nPixels === 51L)
      val lumas = payload.map(b => (b & 0xff).toLong)
      assert(info.peakPx === lumas.max)
      assert(info.meanPx === lumas.sum / 51L) // 8 zero pad pixels included
      assert(info.topRowSum === lumas.take(17).sum) // top row == first 17 bytes
    }
    val empty = BmpCodec.decode(BmpCodec.encode(Array.emptyByteArray, 23, 8))
    assert(empty.height === 0L && empty.nPixels === 0L && empty.meanPx === 0L)
  }

  test("BmpCodec.decodePixels returns the grid in top-down reading order") {
    val payload = (0 until 50).map(i => (i * 5 % 251).toByte).toArray
    for (bits <- Seq(8, 24)) {
      val px = BmpCodec.decodePixels(BmpCodec.encode(payload, 17, bits))
      assert(px.width === 17 && px.height === 3)
      val expected = payload.map(_ & 0xff) ++ Array.fill(51 - 50)(0)
      assert(px.lumas.toSeq === expected.toSeq, s"$bits-bit pixel order")
    }
  }

  test("BmpCodec.decode is a general parser, not the encoder's inverse") {
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    // hand-built TOP-DOWN (negative height) 32-bit BMP with a V4
    // header — a layout this repo's encoder can never emit
    val w = 3; val h = 2
    val stride = w * 4 // 32-bit rows are always 4-byte aligned
    val pixOff = 14 + 108
    val rows = Array( // (B,G,R,X) per pixel, rows already top-down
      Array[Int](10, 10, 10, 0, 20, 20, 20, 0, 30, 30, 30, 0),
      Array[Int](40, 40, 40, 0, 50, 50, 50, 0, 60, 60, 60, 0))
    val pix = rows.flatten.map(_.toByte)
    val blob = Array('B'.toByte, 'M'.toByte) ++
      le32(pixOff + stride * h) ++ le32(0) ++ le32(pixOff) ++
      le32(108) ++ le32(w) ++ le32(-h) ++ le16(1) ++ le16(32) ++ le32(0) ++
      le32(stride * h) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      Array.fill(108 - 40)(0.toByte) ++ pix
    val info = BmpCodec.decode(blob)
    assert(info.width === 3L && info.height === 2L && info.bitsPerPixel === 32L)
    assert(info.peakPx === 60L)
    assert(info.meanPx === (10L + 20 + 30 + 40 + 50 + 60) / 6)
    assert(info.topRowSum === 10L + 20 + 30) // negative height => NO flip
    // malformed containers fail loudly, not silently
    val badMagic = blob.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(badMagic))
    intercept[IllegalArgumentException](BmpCodec.decode(blob.take(40)))
    val truncatedPix = blob.take(blob.length - 4) // declared rows overrun
    intercept[IllegalArgumentException](BmpCodec.decode(truncatedPix))
  }

  test("BmpCodec resolves the palette instead of trusting raw indices") {
    // same pixel bytes, but a REVERSED grayscale palette: a decoder
    // that shortcuts palette lookup reports the raw index and diverges
    val enc = BmpCodec.encode(Array[Byte](10, 20, 30), 3, 8)
    val flipped = enc.clone()
    for (i <- 0 until 256) {
      val p = 54 + 4 * i
      val v = (255 - i).toByte
      flipped(p) = v; flipped(p + 1) = v; flipped(p + 2) = v
    }
    assert(BmpCodec.decode(enc).peakPx === 30L)
    assert(BmpCodec.decode(flipped).peakPx === 245L) // 255 - 10
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

  test("imageFeatures derives features from parsed container structure") {
    val out = MultimodalOps.imageFeatures(Tables.documents(spark, TestSpark.Sf0001))
    assert(out.columns.toSeq === Seq("doc_id", "width", "height",
      "bits_per_pixel", "n_pixels", "peak_px", "mean_px", "top_row_sum"))
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === 17L + (id % 4) * 6L, s"doc $id width")
      assert(r.getLong(2) > 0, s"doc $id height")
      assert(r.getLong(3) === (if (id % 2 == 0) 8L else 24L), s"doc $id depth")
      assert(r.getLong(4) === r.getLong(1) * r.getLong(2), s"doc $id pixels")
      assert(r.getLong(5) >= r.getLong(6), s"doc $id peak >= mean")
    }
  }

  test("image quarantine splits corrupt containers from decodable ones") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val verdicts = MultimodalOps.bmpQuarantine(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val pixels = MultimodalOps.imageFeatures(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(verdicts.nonEmpty)
    verdicts.foreach { case (id, (ok, np, err)) =>
      if (id % 3 == 2) assert(ok === 0L && np === -1L && err === "rejected", s"doc $id")
      else assert(ok === 1L && np === pixels(id) && err === "", s"doc $id")
    }
    assert(verdicts.values.map(_._1).toSet === Set(0L, 1L))
  }

  test("resize and band sampling agree with the decoded pixel grid") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val rs = MultimodalOps.resize(docs).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(3) === (r.getLong(1) + 1) / 2, "new_w")
      assert(r.getLong(4) === (r.getLong(2) + 1) / 2, "new_h")
      assert(r.getLong(5) === r.getLong(3) * r.getLong(4), "kept_px = new grid")
    }
    val bands = MultimodalOps.frameSample(docs).collect()
    assert(bands.nonEmpty)
    // only even band indices survive; every band has 1..BandRows rows
    bands.foreach { b =>
      assert(b.getLong(1) % MultimodalOps.BandEvery === 0L)
      assert(b.getLong(2) >= 1L && b.getLong(2) <= MultimodalOps.BandRows.toLong)
    }
  }

  test("AviCodec.decode is a general parser, not the encoder's inverse") {
    import graft.operators.AviCodec
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    // hand-built AVI this repo's encoder can never emit: 24-bit BGR
    // TOP-DOWN frames (negative biHeight, no palette), a '00dc'
    // fourcc, JUNK chunks at two nesting levels, and NO idx1
    val w = 3; val h = 2
    val stride = (w * 3 + 3) & ~3 // 12
    // two top-down rows; luma = channel mean
    val rows = Array(
      Array((10, 20, 30), (40, 50, 60), (70, 80, 90)), // lumas 20 50 80
      Array((5, 5, 5), (200, 100, 0), (255, 255, 255))) // lumas 5 100 255
    val frame = rows.flatMap { r =>
      val px = r.flatMap { case (b, g, rr) => Array(b.toByte, g.toByte, rr.toByte) }
      px ++ Array.fill(stride - w * 3)(0.toByte)
    }
    val avih = cc("avih") ++ le32(56) ++ le32(1000000 / 25) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(1) ++ le32(0) ++ le32(1) ++ le32(stride * h) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("strh") ++ le32(56) ++ cc("vids") ++ cc("DIB ") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(1) ++ le32(stride * h) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = cc("strf") ++ le32(40) ++ le32(40) ++ le32(w) ++ le32(-h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(stride * h) ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(0)
    val junkIn = cc("JUNK") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // odd + pad
    val strlBody = cc("strl") ++ strh ++ junkIn ++ strf
    val strl = cc("LIST") ++ le32(strlBody.length) ++ strlBody
    val hdrlBody = cc("hdrl") ++ avih ++ strl
    val hdrl = cc("LIST") ++ le32(hdrlBody.length) ++ hdrlBody
    val moviBody = cc("movi") ++ cc("00dc") ++ le32(frame.length) ++ frame
    val movi = cc("LIST") ++ le32(moviBody.length) ++ moviBody
    val junkTop = cc("JUNK") ++ le32(5) ++ Array[Byte](9, 9, 9, 9, 9, 0)
    val body = cc("AVI ") ++ junkTop ++ hdrl ++ movi
    val avi = cc("RIFF") ++ le32(body.length) ++ body
    val v = AviCodec.decode(avi)
    assert(v.width === 3 && v.height === 2 && v.fps === 25)
    assert(v.frames.length === 1)
    assert(v.frames(0).toSeq === Seq(20, 50, 80, 5, 100, 255))
    // malformed containers fail loudly, not silently
    intercept[IllegalArgumentException](AviCodec.decode(cc("RIFX") ++ avi.drop(4)))
    intercept[IllegalArgumentException](AviCodec.decode(avi.take(40)))
  }

  test("AVI quarantine splits corrupt containers from decodable ones") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val rs = MultimodalOps.aviQuarantine(docs).collect()
    assert(rs.nonEmpty)
    val textLen = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).length).toMap
    rs.foreach { r =>
      val id = r.getLong(0)
      // empty text → frameless container, nothing to corrupt
      val hasFrames = textLen(id) > 0
      if (id % 5 == 3 && hasFrames) {
        assert(r.getLong(1) === 0L && r.getLong(2) === -1L &&
          r.getString(3) === "rejected")
      } else {
        assert(r.getLong(1) === 1L && r.getLong(2) >= 0L && r.getString(3) === "")
      }
    }
  }
}
