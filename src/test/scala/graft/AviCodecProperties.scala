package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.AviCodec

/** Property suite for the AVI container codec: encode→decode must
  * recover geometry, frame timing, frame count, and per-frame lumas
  * predicted in closed form from the payload, for arbitrary payload
  * sizes (including empty → zero frames), geometries and frame rates
  * — every case exercising the nested chunk walk, the odd-strn pad
  * rule, DIB stride padding, the bottom-up row flip, palette
  * indirection, and the idx1 cross-checks.
  */
object AviCodecProperties extends Properties("graft.avicodec") {

  private val payload: Gen[Array[Byte]] =
    Gen.choose(0, 900).flatMap(n => Gen.listOfN(n, Gen.choose(0, 255)))
      .map(_.map(_.toByte).toArray)
  private val width = Gen.choose(1, 24)
  private val height = Gen.choose(1, 12)
  private val fps = Gen.oneOf(10, 15, 20, 24, 25, 30)

  property("decode(encode(p)) recovers geometry, fps, and frame count") =
    forAll(payload, width, height, fps) { (p, w, h, f) =>
      val v = AviCodec.decode(AviCodec.encode(p, w, h, f))
      val nf = (p.length + w * h - 1) / (w * h)
      v.width == w && v.height == h && v.fps == f && v.frames.length == nf
    }

  property("frames carry the payload in top-down reading order incl. zero pads") =
    forAll(payload, width, height, fps) { (p, w, h, f) =>
      val v = AviCodec.decode(AviCodec.encode(p, w, h, f))
      val fb = w * h
      v.frames.zipWithIndex.forall { case (lumas, fi) =>
        lumas.length == fb && lumas.indices.forall { i =>
          val src = fi * fb + i
          lumas(i) == (if (src < p.length) p(src) & 0xff else 0)
        }
      }
    }

  property("an empty payload decodes to a frameless container") =
    forAll(width, height, fps) { (w, h, f) =>
      AviCodec.decode(AviCodec.encode(Array.emptyByteArray, w, h, f))
        .frames.isEmpty
    }

  property("bad RIFF magic, bad form type, and truncation are rejected") =
    forAll(payload, width, height, fps) { (p, w, h, f) =>
      val avi = AviCodec.encode(p, w, h, f)
      def rejects(blob: Array[Byte]): Boolean =
        try { AviCodec.decode(blob); false }
        catch { case _: IllegalArgumentException => true }
      val badMagic = avi.clone(); badMagic(0) = 'X'.toByte
      val badForm = avi.clone(); badForm(8) = 'W'.toByte
      rejects(badMagic) && rejects(badForm) &&
        rejects(avi.take(avi.length - 1)) && rejects(avi.take(11))
    }

  property("a corrupted mid-frame size field is rejected iff frames exist") =
    forAll(payload, width, height, fps) { (p, w, h, f) =>
      val avi = AviCodec.encode(p, w, h, f)
      val bad = AviCodec.corruptMidFrame(avi)
      val outcome =
        try { AviCodec.decode(bad); true }
        catch { case _: IllegalArgumentException => false }
      if (p.isEmpty) outcome else !outcome
    }

  property("a frame-count mismatch between avih and movi is rejected") =
    forAll(payload.suchThat(_.nonEmpty), width, height, fps) { (p, w, h, f) =>
      val avi = AviCodec.encode(p, w, h, f)
      // avih dwTotalFrames lives 16 bytes into the avih body:
      // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + avih hdr(8) + 16
      val off = 12 + 8 + 4 + 8 + 16
      val bad = avi.clone()
      bad(off) = (bad(off) ^ 0x01).toByte
      try { AviCodec.decode(bad); false }
      catch { case _: IllegalArgumentException => true }
    }
}
