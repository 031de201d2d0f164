package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * Both modalities now decode REAL containers: images are round-
  * tripped through [[BmpCodec]] (headered BMP, stride-padded
  * bottom-up rows, palette indirection) and audio through
  * [[WavCodec]] (chunked RIFF/WAVE, LE PCM). Everything around the
  * codecs is the production pipeline shape: binary column in, typed
  * `Dataset` out, per-partition batched processing via
  * `mapPartitions` (the Scala analog of `mapInPandas` batches), and
  * schemas the downstream relational operators can join on.
  *
  * At 100 TB: the binary payloads dominate IO, so every stage
  * projects only (doc_id, blob); feature extraction is map-only (no
  * shuffle until the caller aggregates); corrupt blobs become
  * quarantined ROWS, never failed jobs.
  */
object MultimodalOps {

  /** Typed record entering a decode stage. */
  case class MediaRecord(doc_id: Long, blob: Array[Byte])

  /** Per-doc image-encoding parameters, derived from doc_id so the
    * oracle can predict them while the engine must recover them from
    * the container bytes: widths 17/23/29/35 (row bytes never a
    * multiple of 4 at either depth, so the stride pad rule is always
    * live) and alternating 8-bit-paletted / 24-bit-BGR depth.
    */
  def imgParams(docId: Long): (Int, Int) = {
    val width = 17 + (math.floorMod(docId, 4) * 6).toInt
    val bits = if (math.floorMod(docId, 2) == 0L) 8 else 24
    (width, bits)
  }

  /** Typed features from the REAL image decoder ([[BmpCodec.decode]]). */
  case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      bits_per_pixel: Long,
      n_pixels: Long,
      peak_px: Long,
      mean_px: Long,
      top_row_sum: Long)

  /** The genuine image pipeline stage: each document's bytes become
    * grayscale pixels of a REAL BMP container ([[BmpCodec.encode]] —
    * file + info headers, 8-bit palette or 24-bit BGR, bottom-up
    * stride-padded rows) and the features come from actually PARSING
    * that container ([[BmpCodec.decode]] reads LE header fields,
    * resolves the palette, and walks the pixel grid through the
    * vertical flip). Width and depth vary per doc_id; a decoder that
    * misreads stride, flip, or palette diverges from the oracle,
    * which recomputes every feature from the source text
    * independently. `top_row_sum` pins the flip: the TOP image row is
    * the LAST stored row.
    */
  def imageFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, bits) = imgParams(r.doc_id)
        val info = BmpCodec.decode(BmpCodec.encode(r.blob, w, bits))
        ImageFeatures(r.doc_id, info.width, info.height, info.bitsPerPixel,
          info.nPixels, info.peakPx, info.meanPx, info.topRowSum)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-blob decode verdict for the image quarantine path. */
  case class BmpVerdict(
      doc_id: Long, decoded_ok: Long, n_pixels: Long, err_class: String)

  /** Image-side quarantine contract (sibling of [[wavQuarantine]]):
    * a corrupt container must become a quarantined ROW, never a
    * failed JOB. Corruption is injected deterministically (doc_id % 3
    * == 2 gets its 'BM' magic flipped) and the decode is wrapped:
    * parse failures emit `(decoded_ok = 0, err_class = rejected)`;
    * successes carry the parsed pixel count. Map-only.
    */
  def bmpQuarantine(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, bits) = imgParams(r.doc_id)
        val bmp = BmpCodec.encode(r.blob, w, bits)
        if (math.floorMod(r.doc_id, 3) == 2L) bmp(0) = 'X'.toByte // injected corruption
        try {
          val info = BmpCodec.decode(bmp)
          BmpVerdict(r.doc_id, 1L, info.nPixels, "")
        } catch {
          case _: IllegalArgumentException =>
            BmpVerdict(r.doc_id, 0L, -1L, "rejected")
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Typed features from the REAL decoder ([[WavCodec.decode]]). */
  case class WavFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_channels: Long,
      bits_per_sample: Long,
      n_frames: Long,
      duration_ms: Long,
      peak_amp: Long,
      mean_abs_amp: Long)

  /** The genuine-format pipeline stage: each document's bytes are
    * packed into a REAL RIFF/WAVE container ([[WavCodec.encode]] —
    * fmt chunk, odd-sized LIST chunk, PCM16 data) and the features
    * come from actually PARSING that container ([[WavCodec.decode]]
    * walks the chunk table and reads LE header fields + samples), not
    * from byte arithmetic on the input. Sample rate and channel count
    * vary per doc_id, so a decoder that misreads any header field or
    * mis-skips the odd LIST chunk diverges from the oracle, which
    * recomputes every feature from the source text independently.
    *
    * Same scale shape as [[mediaFeatures]]: map-only over (doc_id,
    * blob) rows, no shuffle until the caller aggregates.
    */
  def wavFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val sampleRate = (8000L + (r.doc_id % 3) * 4000L).toInt
        val channels = (1L + (r.doc_id % 2)).toInt
        val info = WavCodec.decode(WavCodec.encode(r.blob, sampleRate, channels))
        WavFeatures(r.doc_id, info.sampleRate, info.nChannels,
          info.bitsPerSample, info.nFrames, info.durationMs,
          info.peakAmp, info.meanAbsAmp)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Frames per analysis window for [[wavSegments]] — shared with the
    * generated oracle so the two sides cannot disagree.
    */
  val WavSegFrames = 25

  /** Typed per-segment features from [[WavCodec.decodeSegments]]. */
  case class WavSegmentRow(
      doc_id: Long, seg_idx: Long, n_frames: Long,
      peak_amp: Long, mean_abs_amp: Long)

  /** Segment-level audio analysis — the energy-windowing / VAD shape:
    * one blob row fans out to one row per [[WavSegFrames]]-frame
    * window, each with peak and mean |amplitude| decoded from the
    * actual PCM bytes of a real container ([[WavCodec]] round trip,
    * like [[wavFeatures]]). Map-only fan-out, no shuffle until the
    * result sort; the oracle recomputes every segment's energy from
    * the source text and the doc_id-derived encoding parameters.
    */
  def wavSegments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val sampleRate = (8000L + (r.doc_id % 3) * 4000L).toInt
        val channels = (1L + (r.doc_id % 2)).toInt
        WavCodec.decodeSegments(
            WavCodec.encode(r.blob, sampleRate, channels), WavSegFrames)
          .map(s => WavSegmentRow(r.doc_id, s.segIdx, s.nFrames,
            s.peakAmp, s.meanAbsAmp))
      })
      .toDF()
      .orderBy("doc_id", "seg_idx")
  }

  /** Per-blob decode verdict for the quarantine path. */
  case class WavVerdict(
      doc_id: Long, decoded_ok: Long, n_frames: Long, err_class: String)

  /** The quarantine contract: a corrupt container must become a
    * quarantined ROW, never a failed JOB — at 100 TB some blobs WILL
    * be truncated or mis-labeled, and one of them must not kill a
    * thousand-executor pipeline. Corruption is injected
    * deterministically (odd doc_ids get their RIFF magic flipped, the
    * fixture stand-in for wire rot) and the decode is wrapped: parse
    * failures emit `(decoded_ok = 0, err_class = rejected)` with no
    * features; successes carry the parsed frame count. Map-only; the
    * ok/quarantine split downstream is a filter, not a second decode.
    */
  def wavQuarantine(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val wav = WavCodec.encode(r.blob,
          (8000L + (r.doc_id % 3) * 4000L).toInt, (1L + (r.doc_id % 2)).toInt)
        if (r.doc_id % 2 == 1) wav(0) = 'X'.toByte // injected corruption
        try {
          val info = WavCodec.decode(wav)
          WavVerdict(r.doc_id, 1L, info.nFrames, "")
        } catch {
          case _: IllegalArgumentException =>
            WavVerdict(r.doc_id, 0L, -1L, "rejected")
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-doc PNG-encoding parameters (doc_id-derived like
    * [[imgParams]], but PNG's own rule so the two image legs never
    * share geometry): widths 19/27/35/43 and alternating greyscale
    * (colour 0) / truecolour (colour 2).
    */
  def pngParams(docId: Long): (Int, Int) = {
    val width = 19 + (math.floorMod(docId, 4) * 8).toInt
    val colour = if (math.floorMod(docId, 2) == 0L) 0 else 2
    (width, colour)
  }

  /** Typed features from the REAL PNG decoder ([[PngCodec.decode]]). */
  case class PngFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      colour_type: Long,
      n_pixels: Long,
      peak_px: Long,
      mean_px: Long,
      top_row_sum: Long)

  /** The COMPRESSED-image pipeline stage: each document's bytes
    * become the pixels of a real PNG ([[PngCodec.encode]] — BE chunk
    * framing, per-chunk CRC-32, per-row filters cycling the full
    * None/Sub/Up/Average/Paeth suite, the zlib stream split across
    * two IDAT chunks) and every feature comes from actually PARSING
    * that container — chunk walk, CRC verification, `Inflater`
    * decompression, byte-wise filter inversion. Width and colour
    * type vary per doc_id; the oracle recomputes every feature from
    * the source text, so a misparse anywhere in that chain — wrong
    * endianness, a filter inverted against the wrong predecessor, a
    * mis-concatenated IDAT split — reds the hash. `top_row_sum` pins
    * PNG's TOP-DOWN row order (the opposite of BMP's default).
    */
  def pngFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, colour) = pngParams(r.doc_id)
        val info = PngCodec.decode(PngCodec.encode(r.blob, w, colour))
        PngFeatures(r.doc_id, info.width, info.height, info.colourType,
          info.nPixels, info.peakPx, info.meanPx, info.topRowSum)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-blob decode verdict for the PNG quarantine path. */
  case class PngVerdict(
      doc_id: Long, decoded_ok: Long, n_pixels: Long, err_class: String)

  /** PNG quarantine: corruption is injected INSIDE the compressed
    * pixel stream (doc_id % 3 == 2 gets its first IDAT data byte
    * flipped) — invisible to any magic-number check, caught only
    * because the decoder verifies every chunk's CRC-32. The
    * integrity-checking container is exactly where the quarantine
    * contract earns its keep at 100 TB: bit rot inside compressed
    * payloads is the common corruption, and it must become a
    * quarantined ROW, never a failed job or silent garbage pixels.
    */
  def pngQuarantine(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, colour) = pngParams(r.doc_id)
        val png = PngCodec.encode(r.blob, w, colour)
        if (math.floorMod(r.doc_id, 3) == 2L) {
          val off = PngCodec.firstIdatDataOffset(png)
          png(off) = (png(off) ^ 0x5a).toByte // bit rot inside the stream
        }
        try {
          val info = PngCodec.decode(png)
          PngVerdict(r.doc_id, 1L, info.nPixels, "")
        } catch {
          case _: IllegalArgumentException =>
            PngVerdict(r.doc_id, 0L, -1L, "rejected")
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Result of the image resize stage. */
  case class Resized(doc_id: Long, width: Long, height: Long,
                     new_w: Long, new_h: Long, kept_px: Long,
                     resized_checksum: Long)

  /** Image resize over DECODED pixels: the blob is packed into a real
    * BMP ([[imgParams]] geometry), the container is parsed back to a
    * top-down luma grid ([[BmpCodec.decodePixels]] — so stride, flip
    * and palette must all be resolved first), and a nearest-neighbor
    * downsample keeps every `factor`-th row and column. Emits the
    * original and resized geometry plus a checksum of the kept lumas
    * in reading order. Map-only; no shuffle until the result sort.
    */
  def resize(docs: DataFrame, factor: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, bits) = imgParams(r.doc_id)
        val px = BmpCodec.decodePixels(BmpCodec.encode(r.blob, w, bits))
        var cs = 0L
        var kept = 0L
        var row = 0
        while (row < px.height) {
          var c = 0
          while (c < px.width) {
            cs = (cs + px.lumas(row * px.width + c)) % 65521L
            kept += 1
            c += factor
          }
          row += factor
        }
        Resized(r.doc_id, px.width.toLong, px.height.toLong,
          ((px.width + factor - 1) / factor).toLong,
          ((px.height + factor - 1) / factor).toLong, kept, cs)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Rows per analysis band for [[frameSample]] and the sampling
    * stride — shared with the generated oracle.
    */
  val BandRows = 8
  val BandEvery = 2

  /** One sampled row-band of a decoded image. */
  case class BandSample(
      doc_id: Long, band_idx: Long, n_rows: Long, band_sum: Long)

  /** Band sampling — the frame-sampling stage of a visual pipeline,
    * over REAL decoded pixels: the parsed image splits into
    * [[BandRows]]-row horizontal bands (the last may be short), every
    * [[BandEvery]]-th band is kept, and each kept band reports its
    * row count and luma sum. Because bands are defined in TOP-DOWN
    * image order while the container stores rows bottom-up, a decoder
    * that skips the flip scrambles every band. One blob row fans out
    * to its kept-band rows, map-only.
    */
  def frameSample(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val (w, bits) = imgParams(r.doc_id)
        val px = BmpCodec.decodePixels(BmpCodec.encode(r.blob, w, bits))
        val nBands = (px.height + BandRows - 1) / BandRows
        (0 until nBands).filter(_ % BandEvery == 0).map { b =>
          val r0 = b * BandRows
          val r1 = math.min(r0 + BandRows, px.height)
          var sum = 0L
          var i = r0 * px.width
          val end = r1 * px.width
          while (i < end) { sum = (sum + px.lumas(i)) % 65521L; i += 1 }
          BandSample(r.doc_id, b.toLong, (r1 - r0).toLong, sum)
        }
      })
      .toDF()
      .orderBy("doc_id", "band_idx")
  }

  /** Per-doc video-encoding parameters, derived from doc_id so the
    * oracle can predict them while the engine must recover them from
    * the container bytes: frame widths 9/14/19 (mod 4 = 1/2/3, so the
    * DIB stride pad rule is always live), heights 6..15, and frame
    * rates 10/15/20 fps (whose µs-per-frame values include the
    * non-divisible 1000000/15 case, pinning the integer-division
    * timing convention on both sides of the codec).
    */
  def aviParams(docId: Long): (Int, Int, Int) = {
    val width = 9 + (math.floorMod(docId, 3) * 5).toInt
    val height = 6 + (math.floorMod(docId, 4) * 3).toInt
    val fps = 10 + (math.floorMod(docId, 3) * 5).toInt
    (width, height, fps)
  }

  /** Header-level summary from the REAL video decoder. */
  case class AviSummary(
      doc_id: Long, width: Long, height: Long, fps: Long,
      n_frames: Long, total_px: Long)

  /** The genuine VIDEO pipeline stage: each document's bytes split
    * into `width×height` grayscale frames of a REAL AVI container
    * ([[AviCodec.encode]] — nested RIFF lists, avih/strh/strf
    * headers, odd-length strn, bottom-up stride-padded paletted DIB
    * frames, idx1 index) and the summary comes from actually PARSING
    * that container: [[AviCodec.decode]] walks the chunk tree,
    * cross-checks the three frame-count declarations, and recovers
    * geometry + timing from LE header fields. Width, height and fps
    * vary per doc_id; the oracle predicts every field from the source
    * text length alone, so any header-layout or chunk-walk slip reds
    * the row. Map-only; no shuffle until the result sort.
    */
  def aviDecode(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, h, fps) = aviParams(r.doc_id)
        val v = AviCodec.decode(AviCodec.encode(r.blob, w, h, fps))
        AviSummary(r.doc_id, v.width.toLong, v.height.toLong, v.fps.toLong,
          v.frames.length.toLong,
          v.frames.length.toLong * v.width * v.height)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Keep every [[FrameEvery]]-th frame — shared with the oracle. */
  val FrameEvery = 3

  /** One sampled decoded video frame. */
  case class AviFrameStat(
      doc_id: Long, frame_idx: Long, frame_sum: Long, frame_peak: Long)

  /** Frame sampling over REAL decoded video: every [[FrameEvery]]-th
    * frame of the parsed AVI reports its luma sum and peak. The lumas
    * come out of bottom-up stride-padded paletted DIB chunks, so a
    * decoder that skips the flip, the stride, or the palette
    * scrambles every frame statistic. One blob row fans out to its
    * kept-frame rows, map-only — the video analog of the image-band
    * [[frameSample]] and the audio-window [[wavSegments]].
    */
  def aviFrames(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val (w, h, fps) = aviParams(r.doc_id)
        val v = AviCodec.decode(AviCodec.encode(r.blob, w, h, fps))
        v.frames.indices.filter(_ % FrameEvery == 0).map { fi =>
          val lumas = v.frames(fi)
          var sum = 0L
          var peak = 0L
          var i = 0
          while (i < lumas.length) {
            sum = (sum + lumas(i)) % 65521L
            if (lumas(i) > peak) peak = lumas(i).toLong
            i += 1
          }
          AviFrameStat(r.doc_id, fi.toLong, sum, peak)
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Per-blob decode verdict for the video quarantine path. */
  case class AviVerdict(
      doc_id: Long, decoded_ok: Long, n_frames: Long, err_class: String)

  /** Video-side quarantine contract (sibling of [[wavQuarantine]] /
    * [[bmpQuarantine]] / [[pngQuarantine]]): corruption is injected
    * INSIDE the chunk framing — [[AviCodec.corruptMidFrame]] flips
    * the middle frame's size field, invisible to any magic-bytes
    * sniff and caught only by the movi walk's structural checks — and
    * the decode is wrapped so parse failures emit quarantined ROWS,
    * never failed jobs. A frameless container (empty text) has no
    * frame to corrupt and stays decodable, which the oracle predicts.
    */
  def aviQuarantine(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val (w, h, fps) = aviParams(r.doc_id)
        val avi = AviCodec.encode(r.blob, w, h, fps)
        val blob =
          if (math.floorMod(r.doc_id, 5) == 3L) AviCodec.corruptMidFrame(avi)
          else avi
        try {
          val v = AviCodec.decode(blob)
          AviVerdict(r.doc_id, 1L, v.frames.length.toLong, "")
        } catch {
          case _: IllegalArgumentException =>
            AviVerdict(r.doc_id, 0L, -1L, "rejected")
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  // ===== perceptual image dedup (pHash) =====

  /** Integer-DCT scale: coefficients are round(cos(...)·64), so the
    * whole transform is exact long arithmetic on both engines. */
  val PhashDctScale = 64
  /** Per-chunk bit width of the hamming-bucket pairing (8 chunks x 8
    * bits over the 63-bit hash — pigeonhole: any pair within
    * [[PhashMaxHamming]] < 8 differing bits shares at least one
    * intact chunk, so candidate recall is 1 by construction). */
  val PhashChunks = 8
  val PhashMaxHamming = 6
  /** Mega-bucket cap, the [[DedupOps.simhashDup]] discipline: a
    * chunk value shared by a dense identical cluster is exact-dedup's
    * job, not the quadratic pairing's. Never binds at gate SFs
    * (max bucket 19 at sf0.01). */
  val PhashMaxBucket = 1000

  /** 8-point DCT-II basis scaled to integers:
    * `C(k)(n) = round(cos(π·(2n+1)·k/16) · 64)` via StrictMath (exact
    * same table on every JVM). The SQL oracle inlines THIS table as
    * literals, so both engines multiply identical longs.
    */
  lazy val PhashDct: Array[Array[Long]] = Array.tabulate(8, 8)((k, n) =>
    math.round(StrictMath.cos(StrictMath.PI * (2 * n + 1) * k / 16.0)
      * PhashDctScale))

  /** 63-bit perceptual hash of a top-down luma grid: 8×8 block means
    * (integer floor division — cells partition rows/cols by
    * `i = r·8/h`), integer 2-D DCT `T = C·P·Cᵀ`, each AC coefficient
    * hashed as "above the exact median of the 63 AC values" (odd
    * count → the median is an element, no interpolation), DC bit
    * dropped so the hash fits bits 0..62 of a non-negative long.
    * Every step is exact integer arithmetic — the oracle replays it
    * term for term.
    */
  def pHash63(px: Array[Int], w: Int, h: Int): Long = {
    val sums = Array.ofDim[Long](8, 8)
    val cnts = Array.ofDim[Long](8, 8)
    var r = 0
    while (r < h) {
      val i = r * 8 / h
      var c = 0
      while (c < w) {
        sums(i)(c * 8 / w) += px(r * w + c)
        cnts(i)(c * 8 / w) += 1
        c += 1
      }
      r += 1
    }
    val p = Array.tabulate(8, 8)((i, j) => sums(i)(j) / cnts(i)(j))
    val cp = Array.tabulate(8, 8)((u, j) =>
      (0 until 8).map(i => PhashDct(u)(i) * p(i)(j)).sum)
    val t = Array.tabulate(8, 8)((u, v) =>
      (0 until 8).map(j => cp(u)(j) * PhashDct(v)(j)).sum)
    val ac = (for { u <- 0 until 8; v <- 0 until 8; if (u, v) != ((0, 0)) }
      yield t(u)(v)).sorted
    val med = ac(31)
    var hash = 0L
    for { u <- 0 until 8; v <- 0 until 8; if (u, v) != ((0, 0)) }
      if (t(u)(v) > med) hash |= 1L << (u * 8 + v - 1)
    hash
  }

  /** (doc_id, phash) of every image big enough to normalize: the
    * genuine BMP round trip ([[BmpCodec.encode]] → [[BmpCodec
    * .decodePixels]], so stride/flip/palette stay exercised) feeding
    * [[pHash63]], row-local. Documents shorter than 8 grid rows
    * (`len < 7·w + 1`) have empty 8×8 cells and are skipped — the
    * oracle applies the same predicate.
    */
  def imagePhashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val (w, bits) = imgParams(r.doc_id)
        if (r.blob.length < 7 * w + 1) None
        else {
          val px = BmpCodec.decodePixels(BmpCodec.encode(r.blob, w, bits))
          Some((r.doc_id, pHash63(px.lumas, px.width, px.height)))
        }
      })
      .toDF("doc_id", "phash")
  }

  /** Perceptual near-duplicate image pairs — the multimodal member
    * of the dedup family: [[imagePhashes]] fingerprints, the
    * [[DedupOps.simhashDup]] chunk-bucket pairing (8×8-bit chunks,
    * count-window mega-bucket cap riding the join's own shuffle),
    * popcount verify ≤ [[PhashMaxHamming]] BEFORE the pair distinct.
    * Candidate recall is 1 by pigeonhole (6 < 8 chunks); at sf0.01
    * this finds the 3 byte-similar document pairs whose rendered
    * grids stay within 6 of 63 bits.
    */
  def imagePhashDup(docs: DataFrame): DataFrame =
    phashPairs(imagePhashes(docs))

  /** (doc_id, phash) over the COMPRESSED-image leg: the genuine PNG
    * round trip ([[PngCodec.encode]] → [[PngCodec.decodePixels]], so
    * chunk CRCs, the zlib inflate and the per-row filter inversion
    * all stay exercised) feeding the same [[pHash63]]. The decoded
    * grid is the payload bytes top-down (truecolour folds (v,v,v)
    * back to v), so the oracle replays it from the source text with
    * [[pngParams]]' geometry. With `quarantine` set, the PNG
    * quarantine contract composes into the dedup pipeline: the
    * deterministic IDAT bit rot (doc_id % 3 == 2, the
    * [[pngQuarantine]] injection) is applied first and a container
    * the decoder REJECTS is skipped — a row-level quarantine, never
    * a failed job, and never garbage bits in the pair graph.
    */
  def imagePhashesPng(docs: DataFrame,
                      quarantine: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val (w, colour) = pngParams(r.doc_id)
        if (r.blob.length < 7 * w + 1) None
        else {
          val png = PngCodec.encode(r.blob, w, colour)
          if (quarantine && math.floorMod(r.doc_id, 3) == 2L) {
            val off = PngCodec.firstIdatDataOffset(png)
            png(off) = (png(off) ^ 0x5a).toByte
          }
          try {
            val px = PngCodec.decodePixels(png)
            Some((r.doc_id, pHash63(px.lumas, px.width, px.height)))
          } catch {
            case _: IllegalArgumentException => None // quarantined row
          }
        }
      })
      .toDF("doc_id", "phash")
  }

  /** [[imagePhashDup]] over the PNG leg (optionally with the
    * quarantine injection composed in — see [[imagePhashesPng]]). */
  def imagePhashDupPng(docs: DataFrame,
                       quarantine: Boolean = false): DataFrame =
    phashPairs(imagePhashesPng(docs, quarantine))

  /** The shared chunk-bucket pairing over any (doc_id, phash) set —
    * the [[DedupOps.simhashDup]] discipline (8×8-bit chunks,
    * count-window mega-bucket cap riding the join's own shuffle,
    * popcount verify ≤ [[PhashMaxHamming]] BEFORE the pair
    * distinct). */
  private def phashPairs(sigs: DataFrame): DataFrame = {
    val keyed = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until PhashChunks).map { q =>
        concat_ws(":", lit(q).cast("string"),
          shiftright(col("phash"), q * 8)
            .bitwiseAND(lit(255L)).cast("string"))
      }: _*)).as("ck"))
    val bounded = keyed
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("ck"))))
      .where(col("bn") <= PhashMaxBucket)
      .select("doc_id", "phash", "ck")
    bounded.as("a").join(bounded.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
          .cast("long").as("hamming"))
      .where(col("hamming") <= PhashMaxHamming)
      .distinct()
      .orderBy("a_id", "b_id")
  }
}

