package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.BmpCodec

/** Property suite for the BMP container codec: encode→decode must
  * recover geometry and luma stats predicted in closed form from the
  * payload, for arbitrary payload sizes (including empty), widths, and
  * both pixel depths — every case exercising stride padding, the
  * bottom-up row flip, and (at 8-bit) palette indirection.
  */
object BmpCodecProperties extends Properties("graft.bmpcodec") {

  private val payload: Gen[Array[Byte]] =
    Gen.choose(0, 600).flatMap(n => Gen.listOfN(n, Gen.choose(0, 255)))
      .map(_.map(_.toByte).toArray)
  private val width = Gen.choose(1, 40)
  private val depth = Gen.oneOf(8, 24)

  private def lumas(p: Array[Byte]): Seq[Long] = p.map(b => (b & 0xff).toLong).toSeq

  property("decode(encode(p)) recovers geometry and pixel count") =
    forAll(payload, width, depth) { (p, w, bits) =>
      val info = BmpCodec.decode(BmpCodec.encode(p, w, bits))
      val h = (p.length + w - 1) / w
      info.width == w && info.height == h && info.bitsPerPixel == bits &&
        info.nPixels == w.toLong * h
    }

  property("peak, mean, and top-row sums match the closed form incl. zero pads") =
    forAll(payload, width, depth) { (p, w, bits) =>
      val info = BmpCodec.decode(BmpCodec.encode(p, w, bits))
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
    forAll(payload, width, depth) { (p, w, bits) =>
      val px = BmpCodec.decodePixels(BmpCodec.encode(p, w, bits))
      val h = (p.length + w - 1) / w
      val expected = lumas(p) ++ Seq.fill(w * h - p.length)(0L)
      px.width == w && px.height == h &&
        px.lumas.map(_.toLong).toSeq == expected
    }

  property("a flipped magic or truncated container is rejected") =
    forAll(payload, width, depth) { (p, w, bits) =>
      val bmp = BmpCodec.encode(p, w, bits)
      val bad = bmp.clone(); bad(0) = 'X'.toByte
      val rejected =
        try { BmpCodec.decode(bad); false }
        catch { case _: IllegalArgumentException => true }
      val truncated =
        try { BmpCodec.decode(bmp.take(40)); false }
        catch { case _: IllegalArgumentException => true }
      rejected && truncated
    }
}
