package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.functions.VectorFunctions
import graft.operators._

/** Registry slice: multimodal codec seams. */
private[graft] trait QueriesMultimodal extends QueriesOracleHelpers {

  /** The shared pHash-pair oracle: the integer-DCT pHash replayed
    * from the source text (8x8 block means -> T = C·P·Cᵀ with the
    * StrictMath-derived integer basis inlined as literals ->
    * above-median AC bits) over a doc_id-derived geometry, then the
    * simhash chunk-bucket pairing (8x8-bit chunks, pigeonhole recall
    * 1 at hamming <= PhashMaxHamming) with the popcount verify ahead
    * of the pair distinct. `wExpr` is the per-doc width (BMP and PNG
    * legs differ); `docFilter` drops rows the engine's quarantine
    * rejects (AND-prefixed).
    */
  private def phashDupOracle(wExpr: String, docFilter: String): String = {
    val coefRows = (for (k <- 0 until 8; n <- 0 until 8)
      yield s"($k, $n, ${MultimodalOps.PhashDct(k)(n)})").mkString(", ")
    val hm = MultimodalOps.PhashMaxHamming
    val cap = MultimodalOps.PhashMaxBucket
    // BYTE-level pixel replay (r18): the engine renders the UTF-8
    // BYTES of `text` (cast to binary), so the oracle decodes the hex
    // dump of the same bytes — two nibble lookups per pixel — instead
    // of per-CHAR ascii(). On pure-ASCII corpora the two are
    // identical, but the 100x fixture's ©-suffixed copies are
    // multi-byte, where the old char form both diverged from the
    // engine and errored outright on its CAST(text AS BLOB) length.
    s"""WITH prm AS (SELECT doc_id, hex(encode(text)) AS hx, $wExpr AS w,
       |    octet_length(encode(text)) AS len FROM documents),
       |el AS (SELECT doc_id, hx, w, len, (len + w - 1) // w AS h
       |  FROM prm WHERE len >= 7 * w + 1$docFilter),
       |pr AS (SELECT doc_id, w, h, len, hx,
       |    unnest(generate_series(0, h - 1)) AS r FROM el),
       |pc AS (SELECT doc_id, w, h, r, len, hx,
       |    unnest(generate_series(0, w - 1)) AS c FROM pr),
       |cells AS (SELECT doc_id, (r * 8) // h AS i, (c * 8) // w AS j,
       |    CASE WHEN r * w + c < len
       |      THEN (instr('0123456789ABCDEF',
       |             substring(hx, (r * w + c) * 2 + 1, 1)) - 1) * 16
       |         + (instr('0123456789ABCDEF',
       |             substring(hx, (r * w + c) * 2 + 2, 1)) - 1)
       |      ELSE 0 END AS v
       |  FROM pc),
       |cm AS MATERIALIZED (SELECT doc_id, i, j,
       |    CAST(sum(v) AS BIGINT) // count(*) AS p
       |  FROM cells GROUP BY doc_id, i, j),
       |coef AS (SELECT * FROM (VALUES $coefRows) t(k, n, c)),
       |tt AS MATERIALIZED (SELECT m.doc_id, cu.k AS u, cv.k AS v,
       |    CAST(sum(cu.c * cv.c * m.p) AS BIGINT) AS t
       |  FROM cm m JOIN coef cu ON cu.n = m.i JOIN coef cv ON cv.n = m.j
       |  GROUP BY m.doc_id, cu.k, cv.k),
       |md AS (SELECT doc_id, median(t) AS med FROM tt
       |  WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id),
       |hs AS MATERIALIZED (SELECT tt.doc_id,
       |    CAST(sum(CASE WHEN NOT (u = 0 AND v = 0) AND t > med
       |      THEN 1::BIGINT << (u * 8 + v - 1) ELSE 0 END) AS BIGINT) AS ph
       |  FROM tt JOIN md ON tt.doc_id = md.doc_id GROUP BY tt.doc_id),
       |ckd AS MATERIALIZED (SELECT doc_id, ph,
       |    q::VARCHAR || ':' || ((ph >> (q * 8)) & 255)::VARCHAR AS ck
       |  FROM hs, (SELECT unnest(generate_series(0, ${MultimodalOps.PhashChunks - 1})) AS q) qs),
       |bounded AS (SELECT doc_id, ph, ck FROM (
       |    SELECT doc_id, ph, ck, count(*) OVER (PARTITION BY ck) AS bn FROM ckd)
       |  WHERE bn <= $cap),
       |pairs AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |  FROM bounded a JOIN bounded b ON a.ck = b.ck AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.ph, b.ph)) <= $hm)
       |SELECT a_id, b_id, hamming FROM pairs ORDER BY a_id, b_id""".stripMargin
  }

  protected lazy val multimodalRegistry: Seq[(String, QueryDef)] = Seq(

    // ----- multimodal --------------------------------------------------
    // NOTE: the oracles mirror the pixel math with character functions
    // (ascii / per-char codepoint sum), which is equivalent only for
    // ASCII text — verified true for all fixtures; a non-ASCII corpus
    // would need a byte-level oracle.
    //
    // The image stages ride a GENUINE container round trip: text bytes
    // become grayscale pixels of a real BMP (file+info headers, 8-bit
    // palette or 24-bit BGR per doc_id, rows stored BOTTOM-UP and
    // padded to 4-byte stride — widths 17/23/29/35 keep the pad rule
    // always live) and every feature is parsed back out of those bytes
    // by BmpCodec. The oracle predicts the features from the source
    // text and the doc_id-derived geometry, so a decoder that misreads
    // stride, vertical flip, or palette reds the row. Grayscale
    // payload pixels make luma == source byte at both depths.

    // resize: decode the pixel grid, then nearest-neighbor keep of
    // every 2nd row and column (top-down reading order)
    "multimodal_resize" -> QueryDef(
      (s, d) => MultimodalOps.resize(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, len, (len + w - 1) // w AS h FROM p),
             |r AS (SELECT doc_id, w, len, text, unnest(generate_series(0, h - 1, 2)) AS rw
             |      FROM d WHERE h > 0),
             |c AS (SELECT doc_id, len, text, rw, w, unnest(generate_series(0, w - 1, 2)) AS cl
             |      FROM r),
             |v AS (SELECT doc_id, CASE WHEN rw * w + cl < len
             |        THEN ascii(substring(text, rw * w + cl + 1, 1)) ELSE 0 END AS px
             |      FROM c),
             |s AS (SELECT doc_id, count(*) AS kept, sum(px) AS sm FROM v GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             |  CAST((w + 1) // 2 AS BIGINT) AS new_w,
             |  CAST((h + 1) // 2 AS BIGINT) AS new_h,
             |  CAST(coalesce(kept, 0) AS BIGINT) AS kept_px,
             |  CAST(coalesce(sm, 0) % 65521 AS BIGINT) AS resized_checksum
             |FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // band sampling: decode the pixel grid, split into 8-row top-down
    // bands, keep every 2nd band; band sums include zero pad pixels
    "multimodal_frame_sample" -> QueryDef(
      (s, d) => MultimodalOps.frameSample(Tables.documents(s, d)),
      Some {
        val B = MultimodalOps.BandRows
        val E = MultimodalOps.BandEvery
        s"""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
           |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
           |d AS (SELECT doc_id, text, w, len, (len + w - 1) // w AS h FROM p),
           |b AS (SELECT doc_id, w, h, text,
           |    unnest(generate_series(0, (h + $B - 1) // $B - 1)) AS band
           |  FROM d WHERE h > 0),
           |k AS (SELECT doc_id, band, least($B, h - band * $B) AS n_rows,
           |    substring(text, band * $B * w + 1, least($B, h - band * $B) * w) AS chunk
           |  FROM b WHERE band % $E = 0)
           |SELECT doc_id, CAST(band AS BIGINT) AS band_idx,
           |  CAST(n_rows AS BIGINT) AS n_rows,
           |  CAST(coalesce(list_sum(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) % 65521 AS BIGINT) AS band_sum
           |FROM k ORDER BY doc_id, band_idx""".stripMargin
      }),

    // image quarantine: deterministically corrupted containers
    // (doc_id % 3 = 2, flipped 'BM' magic) become quarantined rows,
    // never job failures; the rest decode to their pixel count
    "multimodal_bmp_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.bmpQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN -1
             |    ELSE w * ((len + w - 1) // w) END AS BIGINT) AS n_pixels,
             |  CASE WHEN doc_id % 3 = 2 THEN 'rejected' ELSE '' END AS err_class
             |FROM p ORDER BY doc_id""".stripMargin)),

    // the GENUINE binary decode: text bytes → real RIFF/WAVE container
    // (fmt + odd-sized LIST + PCM16 data chunks) → features parsed
    // back out of the actual bytes by WavCodec.decode's chunk walker.
    // The oracle predicts each feature from the source text and the
    // doc_id-derived encoding parameters, so any header-parse error
    // (LE field order, pad-byte rule, block-align math) reds the row.
    // sample = (byte - 128) * 256; frames zero-pad to a channel
    // multiple; char==byte holds on the ASCII fixture
    "multimodal_wav_decode" -> QueryDef(
      (s, d) => MultimodalOps.wavFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text,
             |    8000 + (doc_id % 3) * 4000 AS sample_rate,
             |    1 + doc_id % 2 AS n_channels,
             |    octet_length(CAST(text AS BLOB)) AS n_bytes
             |  FROM documents),
             |f AS (SELECT doc_id, text, sample_rate, n_channels,
             |    (n_bytes + n_channels - 1) // n_channels AS n_frames
             |  FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''),
             |      c -> abs((ascii(c) - 128) * 256))), 0) AS peak_amp,
             |    coalesce(list_sum(list_transform(string_split(text, ''),
             |      c -> abs((ascii(c) - 128) * 256))), 0) AS sum_abs
             |  FROM f WHERE length(text) > 0)
             |SELECT f.doc_id,
             |  CAST(sample_rate AS BIGINT) AS sample_rate,
             |  CAST(n_channels AS BIGINT) AS n_channels,
             |  CAST(16 AS BIGINT) AS bits_per_sample,
             |  CAST(n_frames AS BIGINT) AS n_frames,
             |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
             |  CAST(coalesce(peak_amp, 0) AS BIGINT) AS peak_amp,
             |  CAST(CASE WHEN n_frames > 0
             |    THEN coalesce(sum_abs, 0) // (n_frames * n_channels)
             |    ELSE 0 END AS BIGINT) AS mean_abs_amp
             |FROM f LEFT JOIN a ON f.doc_id = a.doc_id
             |ORDER BY f.doc_id""".stripMargin)),

    // segment-level decode of the same real WAV containers: per
    // 25-frame window, peak/mean |amplitude| from the parsed PCM.
    // Last window may be short; zero-pad samples (stereo frame
    // alignment) contribute 0 to sum and peak, and the mean divides
    // by frames*channels INCLUDING pads — mirrored exactly below
    "multimodal_wav_segments" -> QueryDef(
      (s, d) => MultimodalOps.wavSegments(Tables.documents(s, d)),
      Some {
        val F = MultimodalOps.WavSegFrames
        s"""WITH p AS (SELECT doc_id, text,
           |    1 + doc_id % 2 AS ch,
           |    octet_length(CAST(text AS BLOB)) AS len
           |  FROM documents),
           |f AS (SELECT doc_id, text, ch, len, (len + ch - 1) // ch AS n_frames
           |  FROM p),
           |s AS (SELECT doc_id, text, ch, n_frames,
           |    unnest(generate_series(0, (n_frames + $F - 1) // $F - 1)) AS seg_idx
           |  FROM f WHERE n_frames > 0),
           |seg AS (SELECT doc_id, seg_idx, ch,
           |    least($F, n_frames - seg_idx * $F) AS seg_frames,
           |    substring(text, seg_idx * $F * ch + 1,
           |              least($F, n_frames - seg_idx * $F) * ch) AS chunk
           |  FROM s),
           |a AS (SELECT doc_id, seg_idx, ch, seg_frames,
           |    list_transform(string_split(chunk, ''),
           |      c -> abs((ascii(c) - 128) * 256)) AS amps
           |  FROM seg)
           |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
           |  CAST(seg_frames AS BIGINT) AS n_frames,
           |  CAST(coalesce(list_max(amps), 0) AS BIGINT) AS peak_amp,
           |  CAST(coalesce(list_sum(amps), 0) // (seg_frames * ch) AS BIGINT)
           |    AS mean_abs_amp
           |FROM a ORDER BY doc_id, seg_idx""".stripMargin
      }),

    // decode quarantine: deterministically corrupted containers (odd
    // doc_ids, flipped RIFF magic) become quarantined rows, never job
    // failures; even doc_ids decode to their frame count (mono: one
    // frame per byte, since corruption hits exactly the stereo docs)
    "multimodal_wav_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.wavQuarantine(Tables.documents(s, d)),
      Some("""SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1
             |    ELSE octet_length(CAST(text AS BLOB)) END AS BIGINT) AS n_frames,
             |  CASE WHEN doc_id % 2 = 1 THEN 'rejected' ELSE '' END AS err_class
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // full-feature image decode: geometry + luma stats parsed out of
    // the real container; top_row_sum pins the bottom-up→top-down flip
    // (the top image row is the LAST stored row)
    // the COMPRESSED-image leg: features decoded through a real PNG
    // round trip (BE chunk framing, CRC-32 per chunk, full filter
    // suite, zlib inflate, split IDATs); the oracle recomputes every
    // feature from the source text and the doc_id-derived geometry
    "multimodal_png_features" -> QueryDef(
      (s, d) => MultimodalOps.pngFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 19 + (doc_id % 4) * 8 AS w,
             |    CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS colour,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, colour, len, (len + w - 1) // w AS h FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS peak,
             |    coalesce(list_sum(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS sm,
             |    coalesce(list_sum(list_transform(string_split(substring(text, 1, w), ''),
             |      c -> ascii(c))), 0) AS toprow
             |  FROM d WHERE len > 0)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(colour AS BIGINT) AS colour_type,
             |  CAST(w * h AS BIGINT) AS n_pixels,
             |  CAST(coalesce(peak, 0) AS BIGINT) AS peak_px,
             |  CAST(CASE WHEN h > 0 THEN coalesce(sm, 0) // (w * h) ELSE 0 END AS BIGINT) AS mean_px,
             |  CAST(coalesce(toprow, 0) AS BIGINT) AS top_row_sum
             |FROM d LEFT JOIN a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // PNG quarantine: the corruption is INSIDE the compressed stream,
    // so only a decoder that verifies chunk CRCs rejects it — magic
    // checks can't see it, and skipping the check would decode
    // garbage pixels instead of quarantining the row
    "multimodal_png_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.pngQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, 19 + (doc_id % 4) * 8 AS w,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents)
             |SELECT doc_id,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN doc_id % 3 = 2 THEN -1
             |       ELSE w * ((len + w - 1) // w) END AS BIGINT) AS n_pixels,
             |  CASE WHEN doc_id % 3 = 2 THEN 'rejected' ELSE '' END AS err_class
             |FROM p ORDER BY doc_id""".stripMargin)),

    // the VIDEO leg of the multimodal seam: text bytes split into
    // w×h grayscale frames of a real AVI container (nested RIFF
    // lists, avih/strh/strf headers, odd-length strn exercising the
    // pad rule, bottom-up stride-padded paletted DIB frames, idx1
    // index with movi-relative offsets) and the summary is parsed
    // back out of those bytes — geometry/timing from LE header
    // fields, frame count cross-checked against three declarations
    "multimodal_avi_decode" -> QueryDef(
      (s, d) => MultimodalOps.aviDecode(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id,
             |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
             |    10 + (doc_id % 3) * 5 AS fps,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |f AS (SELECT doc_id, w, h, fps,
             |    (len + w * h - 1) // (w * h) AS nf FROM p)
             |SELECT doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(fps AS BIGINT) AS fps,
             |  CAST(nf AS BIGINT) AS n_frames,
             |  CAST(nf * w * h AS BIGINT) AS total_px
             |FROM f ORDER BY doc_id""".stripMargin)),

    // video frame sampling over the SAME parsed containers: every
    // 3rd decoded frame reports its luma sum and peak; the lumas
    // come out of bottom-up stride-padded paletted DIB chunks, so a
    // skipped flip/stride/palette scrambles every statistic. The
    // last frame's zero padding is invisible to both sides (adds 0
    // to the sum, never raises the peak)
    "multimodal_avi_frames" -> QueryDef(
      (s, d) => MultimodalOps.aviFrames(Tables.documents(s, d)),
      Some {
        val E = MultimodalOps.FrameEvery
        s"""WITH p AS (SELECT doc_id, text,
           |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
           |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
           |f AS (SELECT doc_id, text, w * h AS fb,
           |    (len + w * h - 1) // (w * h) AS nf FROM p),
           |e AS (SELECT doc_id, fb, text,
           |    unnest(generate_series(0, nf - 1)) AS fi
           |  FROM f WHERE nf > 0),
           |k AS (SELECT doc_id, fi,
           |    substring(text, fi * fb + 1, fb) AS chunk
           |  FROM e WHERE fi % $E = 0)
           |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
           |  CAST(coalesce(list_sum(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) % 65521 AS BIGINT) AS frame_sum,
           |  CAST(coalesce(list_max(list_transform(string_split(chunk, ''),
           |    c -> ascii(c))), 0) AS BIGINT) AS frame_peak
           |FROM k ORDER BY doc_id, frame_idx""".stripMargin
      }),

    // video quarantine: the corruption flips the MIDDLE frame's
    // chunk size field — invisible to magic sniffs, caught only by
    // the movi walk's structural checks (size overruns the list or
    // misses the declared frame size). A frameless container (empty
    // text) has nothing to corrupt and stays decodable
    "multimodal_avi_quarantine" -> QueryDef(
      (s, d) => MultimodalOps.aviQuarantine(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id,
             |    9 + (doc_id % 3) * 5 AS w, 6 + (doc_id % 4) * 3 AS h,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |f AS (SELECT doc_id,
             |    (len + w * h - 1) // (w * h) AS nf FROM p),
             |v AS (SELECT doc_id, nf,
             |    (doc_id % 5 = 3 AND nf > 0) AS corrupt FROM f)
             |SELECT doc_id,
             |  CAST(CASE WHEN corrupt THEN 0 ELSE 1 END AS BIGINT) AS decoded_ok,
             |  CAST(CASE WHEN corrupt THEN -1 ELSE nf END AS BIGINT) AS n_frames,
             |  CASE WHEN corrupt THEN 'rejected' ELSE '' END AS err_class
             |FROM v ORDER BY doc_id""".stripMargin)),

    // perceptual image dedup: integer-DCT pHash over the genuinely
    // decoded BMP grid (8x8 block means -> T = C·P·Cᵀ with the
    // StrictMath-derived integer basis inlined below as literals ->
    // above-median AC bits), then the simhash chunk-bucket pairing
    // (8x8-bit chunks, pigeonhole recall 1 at hamming <= 6) with the
    // popcount verify ahead of the pair distinct
    "image_phash_dup" -> QueryDef(
      (s, d) => MultimodalOps.imagePhashDup(Tables.documents(s, d)),
      Some(phashDupOracle("17 + (doc_id % 4) * 6", "")),
    ),

    // the COMPRESSED-image leg of perceptual dedup: the same integer
    // DCT over genuinely PNG-round-tripped pixels (chunk CRCs, zlib,
    // filter inversion all live) — the decoded grid is the payload
    // bytes top-down under pngParams' geometry, so the oracle is the
    // shared pHash chain at the PNG widths
    "image_phash_dup_png" -> QueryDef(
      (s, d) => MultimodalOps.imagePhashDupPng(Tables.documents(s, d)),
      Some(phashDupOracle("19 + (doc_id % 4) * 8", ""))),

    // quarantine-aware variant: the pngQuarantine bit-rot injection
    // (doc_id % 3 == 2, one flipped byte INSIDE the zlib stream)
    // composed into the dedup pipeline — a rejected container is
    // skipped as a row, never a failed job, and its garbage bits
    // never enter the pair graph; the oracle drops the same
    // deterministic slice
    "image_phash_dup_png_quarantined" -> QueryDef(
      (s, d) => MultimodalOps.imagePhashDupPng(Tables.documents(s, d),
        quarantine = true),
      Some(phashDupOracle("19 + (doc_id % 4) * 8",
        " AND NOT (doc_id % 3 = 2)"))),

    "multimodal_features" -> QueryDef(
      (s, d) => MultimodalOps.imageFeatures(Tables.documents(s, d)),
      Some("""WITH p AS (SELECT doc_id, text, 17 + (doc_id % 4) * 6 AS w,
             |    CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 24 END AS bits,
             |    octet_length(CAST(text AS BLOB)) AS len FROM documents),
             |d AS (SELECT doc_id, text, w, bits, len, (len + w - 1) // w AS h FROM p),
             |a AS (SELECT doc_id,
             |    coalesce(list_max(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS peak,
             |    coalesce(list_sum(list_transform(string_split(text, ''), c -> ascii(c))), 0) AS sm,
             |    coalesce(list_sum(list_transform(string_split(substring(text, 1, w), ''),
             |      c -> ascii(c))), 0) AS toprow
             |  FROM d WHERE len > 0)
             |SELECT d.doc_id,
             |  CAST(w AS BIGINT) AS width,
             |  CAST(h AS BIGINT) AS height,
             |  CAST(bits AS BIGINT) AS bits_per_pixel,
             |  CAST(w * h AS BIGINT) AS n_pixels,
             |  CAST(coalesce(peak, 0) AS BIGINT) AS peak_px,
             |  CAST(CASE WHEN h > 0 THEN coalesce(sm, 0) // (w * h) ELSE 0 END AS BIGINT) AS mean_px,
             |  CAST(coalesce(toprow, 0) AS BIGINT) AS top_row_sum
             |FROM d LEFT JOIN a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),
  )
}
