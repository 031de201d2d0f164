package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.PngCodec

/** Property suite for the PNG codec: encode→decode must recover
  * geometry and luma stats predicted in closed form from the payload
  * for arbitrary sizes (including empty), widths, and both colour
  * types — every ≥5-row case exercising the full filter suite
  * (None/Sub/Up/Average/Paeth), zlib round trip, the split-IDAT
  * concatenation, and per-chunk CRC validation; plus the corruption
  * properties the quarantine contract rests on.
  */
object PngCodecProperties extends Properties("graft.pngcodec") {

  private val payload: Gen[Array[Byte]] =
    Gen.choose(0, 600).flatMap(n => Gen.listOfN(n, Gen.choose(0, 255)))
      .map(_.map(_.toByte).toArray)
  private val width = Gen.choose(1, 40)
  private val colour = Gen.oneOf(0, 2)

  private def lumas(p: Array[Byte]): Seq[Long] = p.map(b => (b & 0xff).toLong).toSeq

  property("decode(encode(p)) recovers geometry, colour, pixel count") =
    forAll(payload, width, colour) { (p, w, ct) =>
      val info = PngCodec.decode(PngCodec.encode(p, w, ct))
      val h = (p.length + w - 1) / w
      info.width == w && info.height == h && info.colourType == ct &&
        info.bitDepth == 8 && info.nPixels == w.toLong * h
    }

  property("peak, mean, and top-row sums match the closed form incl. zero pads") =
    forAll(payload, width, colour) { (p, w, ct) =>
      val info = PngCodec.decode(PngCodec.encode(p, w, ct))
      val a = lumas(p)
      val h = (p.length + w - 1) / w
      val n = w.toLong * h
      val expectPeak = if (a.isEmpty) 0L else a.max
      val expectMean = if (n == 0) 0L else a.sum / n
      val expectTop = a.take(w).sum
      info.peakPx == expectPeak && info.meanPx == expectMean &&
        info.topRowSum == expectTop
    }

  property("decodePixels returns the payload in top-down reading order") =
    forAll(payload, width, colour) { (p, w, ct) =>
      val px = PngCodec.decodePixels(PngCodec.encode(p, w, ct))
      val h = (p.length + w - 1) / w
      val expected = lumas(p) ++ Seq.fill(w * h - p.length)(0L)
      px.width == w && px.height == h &&
        px.lumas.map(_.toLong).toSeq == expected
    }

  property("a flipped bit inside an IDAT is rejected (CRC), never decoded") =
    forAll(payload, width, colour, Gen.choose(0, 255)) { (p, w, ct, mask) =>
      val png = PngCodec.encode(p, w, ct)
      val off = PngCodec.firstIdatDataOffset(png)
      png(off) = (png(off) ^ (mask | 1)).toByte // always a real flip
      try { PngCodec.decode(png); false }
      catch { case _: IllegalArgumentException => true }
    }

  property("a truncated file is rejected") =
    forAll(payload, width, colour) { (p, w, ct) =>
      val png = PngCodec.encode(p, w, ct)
      val cut = java.util.Arrays.copyOf(png, png.length - 5)
      try { PngCodec.decode(cut); false }
      catch { case _: IllegalArgumentException => true }
    }

  property("a bad signature is rejected") =
    forAll(payload, width, colour) { (p, w, ct) =>
      val png = PngCodec.encode(p, w, ct)
      png(1) = 'X'.toByte
      try { PngCodec.decode(png); false }
      catch { case _: IllegalArgumentException => true }
    }
}
