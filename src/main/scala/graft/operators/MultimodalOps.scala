package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder — but everything around
  * it is the real pipeline shape: binary column in, typed
  * `Dataset[MediaFeatures]` out, per-partition batched processing via
  * `mapPartitions` (the Scala analog of `mapInPandas` batches), and a
  * schema the downstream relational operators can join on.
  *
  * At 100 TB: the binary payloads dominate IO, so the scan projects
  * only (doc_id, blob); feature extraction is map-only (no shuffle);
  * a real decoder would slot into [[decodeStub]] unchanged.
  */
object MultimodalOps {

  /** Typed record entering the decode stage. */
  case class MediaRecord(doc_id: Long, blob: Array[Byte])

  /** Typed features leaving the decode stage. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Long,
      checksum: Long,
      n_frames: Long)

  /** STUB "decoder": a real implementation would decode image/audio
    * bytes here (libs unavailable in this container). The fake is
    * deterministic pure-byte math so the DuckDB oracle can reproduce
    * it: Adler-style checksum mod 65521, 256-byte "frames".
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.blob.length.toLong
    var checksum = 0L
    var i = 0
    while (i < r.blob.length) {
      checksum = (checksum + (r.blob(i) & 0xff)) % 65521L
      i += 1
    }
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = n,
      first_byte = if (n > 0) (r.blob(0) & 0xff).toLong else -1L,
      checksum = checksum,
      n_frames = (n + 255L) / 256L)
  }

  /** The pipeline: project (doc_id, binary blob) — here the UTF-8
    * bytes of `text` standing in for media bytes — then batch-decode
    * per partition into typed features.
    */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val records: Dataset[MediaRecord] = docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
    records
      .mapPartitions(_.map(decodeStub))
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

  /** Result of the resize stage. */
  case class Resized(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
                     resized_checksum: Long)

  /** Resize stub — nearest-neighbor downsample by `factor`: keep
    * every `factor`-th byte (a real image resize would interpolate
    * decoded pixels here; the map-only shape and the typed in/out
    * schema are the production contract). Emits original size,
    * resized size, and the checksum of the resized bytes.
    */
  def resize(docs: DataFrame, factor: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        var cs = 0L
        var n = 0L
        var i = 0
        while (i < r.blob.length) {
          cs = (cs + (r.blob(i) & 0xff)) % 65521L
          n += 1
          i += factor
        }
        Resized(r.doc_id, r.blob.length.toLong, n, cs)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** One sampled frame of a media blob. */
  case class FrameSample(
      doc_id: Long, frame_idx: Long, frame_len: Long, frame_checksum: Long)

  /** Frame sampling — the video-ish stage of the pipeline: the blob
    * splits into 256-byte "frames", every `every`-th frame is kept,
    * and per-frame features come out typed. A real decoder would
    * replace the byte-window arithmetic with actual frame extraction
    * (and a resize would be one more map over the frame bytes); the
    * fan-out shape (one blob row → sampled frame rows, map-only, no
    * shuffle until the caller aggregates) is the production shape.
    */
  def frameSample(docs: DataFrame, every: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val nFrames = ((r.blob.length + 255) / 256)
        (0 until nFrames).filter(_ % every == 0).map { f =>
          val start = f * 256
          val end = math.min(start + 256, r.blob.length)
          var cs = 0L
          var i = start
          while (i < end) { cs = (cs + (r.blob(i) & 0xff)) % 65521L; i += 1 }
          FrameSample(r.doc_id, f.toLong, (end - start).toLong, cs)
        }
      })
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }
}
