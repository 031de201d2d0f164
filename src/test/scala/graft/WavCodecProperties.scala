package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.WavCodec

/** Property-based round-trip checks of the real RIFF/WAVE codec —
  * pure JVM, no Spark jobs. The encoder varies payload, sample rate
  * and channel count; every decoded field must match the closed form
  * the registry oracles compute from the same inputs.
  */
object WavCodecProperties extends Properties("graft.wavcodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val payload: Gen[Array[Byte]] =
    Gen.choose(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
  private val rate: Gen[Int] = Gen.oneOf(8000, 11025, 12000, 16000, 44100)
  private val channels: Gen[Int] = Gen.choose(1, 4)

  private def amps(p: Array[Byte]): Seq[Long] =
    p.toSeq.map(b => math.abs(((b & 0xff) - 128) * 256).toLong)

  property("decode(encode(p)) recovers the fmt contract and frame count") =
    forAll(payload, rate, channels) { (p, sr, ch) =>
      val info = WavCodec.decode(WavCodec.encode(p, sr, ch))
      val nFrames = (p.length + ch - 1) / ch
      info.sampleRate == sr && info.nChannels == ch &&
        info.bitsPerSample == 16 && info.nFrames == nFrames &&
        info.durationMs == nFrames.toLong * 1000 / sr
    }

  property("peak and mean amplitude match the closed form incl. zero pads") =
    forAll(payload, rate, channels) { (p, sr, ch) =>
      val info = WavCodec.decode(WavCodec.encode(p, sr, ch))
      val a = amps(p)
      val nFrames = (p.length + ch - 1) / ch
      val nSamples = nFrames.toLong * ch // incl. final-frame zero pads
      val expectPeak = if (a.isEmpty) 0L else a.max
      val expectMean = if (nSamples == 0) 0L else a.sum / nSamples
      info.peakAmp == expectPeak && info.meanAbsAmp == expectMean
    }

  property("segments partition the frames and reassemble the energy") =
    forAll(payload, rate, channels, Gen.choose(1, 60)) { (p, sr, ch, fps) =>
      val wav = WavCodec.encode(p, sr, ch)
      val whole = WavCodec.decode(wav)
      val segs = WavCodec.decodeSegments(wav, fps)
      val framesOk = segs.map(_.nFrames).sum == whole.nFrames &&
        segs.dropRight(1).forall(_.nFrames == fps)
      val peakOk = (if (segs.isEmpty) 0L else segs.map(_.peakAmp).max) == whole.peakAmp
      val idxOk = segs.map(_.segIdx) == segs.indices.map(_.toLong)
      (segs.isEmpty == (whole.nFrames == 0)) && idxOk && peakOk &&
        (segs.isEmpty || framesOk)
    }

  property("a flipped RIFF magic or truncated container is rejected") =
    forAll(payload, rate, channels) { (p, sr, ch) =>
      val wav = WavCodec.encode(p, sr, ch)
      val bad = wav.clone(); bad(0) = 'X'.toByte
      val rejected =
        try { WavCodec.decode(bad); false }
        catch { case _: IllegalArgumentException => true }
      val truncated =
        try { WavCodec.decode(wav.take(11)); false }
        catch { case _: IllegalArgumentException => true }
      rejected && truncated
    }
}
