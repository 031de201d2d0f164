package graft.operators

/** A real BMP (Windows bitmap) codec — the image half of the genuine
  * multimodal decode seam, sibling of [[WavCodec]]. Pure JVM, no image
  * libraries: BMP is a headered container (14-byte file header, then a
  * BITMAPINFOHEADER with LE int32/int16 fields, an optional palette,
  * then pixel rows padded to 4-byte boundaries and stored BOTTOM-UP by
  * default), so a correct parser needs only byte math — but it must get
  * the row stride, the vertical flip, and the palette indirection right
  * or every derived feature diverges.
  *
  * [[decode]] is a general parser, NOT specialized to [[encode]]'s
  * output: it accepts 8-bit paletted, 24-bit BGR and 32-bit BGRX
  * pixels, core (40) and extended V4/V5 (108/124) info headers, and
  * both bottom-up (positive height) and top-down (negative height) row
  * order; the spec feeds it containers this encoder never produces.
  *
  * At 100 TB the decode is map-only over blob rows; the registry
  * queries ([[MultimodalOps.imageFeatures]] / `resize` / `frameSample`)
  * run encode→decode per row so the whole loop — build real container
  * bytes, parse real container bytes — is exercised against a DuckDB
  * oracle that recomputes every feature from the source text
  * independently of any of this byte plumbing.
  */
object BmpCodec {

  /** Everything [[decode]] recovers from the container + pixels.
    * `topRowSum` is the luma sum of the TOP image row — in a bottom-up
    * BMP that is the LAST stored row, so a decoder that forgets the
    * vertical flip reds this field immediately.
    */
  final case class BmpInfo(
      width: Long,
      height: Long,
      bitsPerPixel: Long,
      nPixels: Long,
      peakPx: Long,
      meanPx: Long,
      topRowSum: Long)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Parsed header: geometry, pixel layout, and palette extent. */
  private final case class Header(
      width: Int, absHeight: Int, topDown: Boolean, bits: Int,
      pixOff: Int, paletteOff: Int, paletteEntries: Int) {
    def bytesPerPx: Int = bits / 8
    // rows are padded to 4-byte boundaries — THE classic BMP trap
    def stride: Int = ((width * bytesPerPx) + 3) & ~3
  }

  private def parseHeader(blob: Array[Byte]): Header = {
    require(blob.length >= 54, s"truncated BMP: ${blob.length} bytes")
    require(blob(0) == 'B'.toByte && blob(1) == 'M'.toByte,
      s"bad magic ${blob(0).toChar}${blob(1).toChar}")
    val fileSize = leInt(blob, 2)
    require(fileSize <= blob.length, s"declared size $fileSize overruns blob")
    val pixOff = leInt(blob, 10)
    val infoSize = leInt(blob, 14)
    // core (40) and the V4/V5 extended headers (108/124): the extra
    // fields are color-space metadata a feature decoder may skip
    require(infoSize == 40 || infoSize == 108 || infoSize == 124,
      s"unsupported info header size $infoSize")
    val width = leInt(blob, 18)
    val rawHeight = leInt(blob, 22)
    require(width >= 0, s"negative width $width")
    val topDown = rawHeight < 0
    val absHeight = math.abs(rawHeight)
    val planes = leShort(blob, 26)
    require(planes == 1, s"bad plane count $planes")
    val bits = leShort(blob, 28)
    require(bits == 8 || bits == 24 || bits == 32, s"unsupported depth $bits")
    val compression = leInt(blob, 30)
    require(compression == 0, s"compressed BMP (method $compression) unsupported")
    val clrUsed = leInt(blob, 46)
    val paletteEntries = if (bits == 8) { if (clrUsed == 0) 256 else clrUsed } else 0
    val paletteOff = 14 + infoSize
    require(pixOff >= paletteOff + 4 * paletteEntries,
      s"pixel offset $pixOff overlaps palette")
    val h = Header(width, absHeight, topDown, bits, pixOff, paletteOff, paletteEntries)
    require(pixOff.toLong + h.stride.toLong * absHeight <= blob.length,
      s"pixel array overruns blob (${h.stride} B/row × $absHeight rows @ $pixOff)")
    h
  }

  /** Luma of the pixel at image coordinates (row r top-down, col c):
    * resolves the bottom-up flip, the stride, and — for 8-bit — the
    * palette indirection (mean of the entry's B,G,R). 24/32-bit pixels
    * are (B,G,R[,X]) and luma is the channel mean.
    */
  private def lumaAt(blob: Array[Byte], h: Header, r: Int, c: Int): Int = {
    val storageRow = if (h.topDown) r else h.absHeight - 1 - r
    val off = h.pixOff + storageRow * h.stride + c * h.bytesPerPx
    if (h.bits == 8) {
      val idx = blob(off) & 0xff
      require(idx < h.paletteEntries, s"pixel index $idx outside palette")
      val p = h.paletteOff + 4 * idx // BGRA entry
      ((blob(p) & 0xff) + (blob(p + 1) & 0xff) + (blob(p + 2) & 0xff)) / 3
    } else {
      ((blob(off) & 0xff) + (blob(off + 1) & 0xff) + (blob(off + 2) & 0xff)) / 3
    }
  }

  /** Parse a BMP blob into summary features. Throws
    * `IllegalArgumentException` on a malformed container — at scale the
    * caller wraps this in a quarantine filter rather than letting one
    * corrupt blob kill the job.
    */
  def decode(blob: Array[Byte]): BmpInfo = {
    val h = parseHeader(blob)
    var peak = 0L
    var sum = 0L
    var topRow = 0L
    var r = 0
    while (r < h.absHeight) {
      var c = 0
      while (c < h.width) {
        val v = lumaAt(blob, h, r, c)
        if (v > peak) peak = v
        sum += v
        if (r == 0) topRow += v
        c += 1
      }
      r += 1
    }
    val n = h.width.toLong * h.absHeight
    BmpInfo(h.width, h.absHeight, h.bits, n, peak,
      if (n > 0) sum / n else 0L, topRow)
  }

  /** Decoded pixel grid: geometry plus lumas in TOP-DOWN row-major
    * order (`lumas(r * width + c)`), ready for resize / band walks.
    */
  final case class BmpPixels(width: Int, height: Int, bits: Int, lumas: Array[Int])

  /** Full-grid decode for the pixel-walking stages (resize, band
    * sampling). Same parser as [[decode]]; materializes one int per
    * pixel — per-blob memory, map-only at scale.
    */
  def decodePixels(blob: Array[Byte]): BmpPixels = {
    val h = parseHeader(blob)
    val out = new Array[Int](h.width * h.absHeight)
    var r = 0
    while (r < h.absHeight) {
      var c = 0
      while (c < h.width) {
        out(r * h.width + c) = lumaAt(blob, h, r, c)
        c += 1
      }
      r += 1
    }
    BmpPixels(h.width, h.absHeight, h.bits, out)
  }

  /** Deterministic BMP writer: one grayscale pixel per payload byte in
    * top-down reading order, `height = ceil(len / width)` with the last
    * row zero-padded; rows are written BOTTOM-UP with 4-byte stride
    * padding (the registry picks widths whose row bytes are never a
    * multiple of 4, so every decode must exercise the stride rule).
    * 8-bit output carries a 256-entry grayscale palette (so index ==
    * luma only if the decoder actually reads the palette); 24-bit
    * output writes (v,v,v) BGR triplets. The registry derives width and
    * depth from doc_id, so the oracle can predict every feature while
    * the engine must recover them from the bytes it built.
    */
  def encode(payload: Array[Byte], width: Int, bits: Int): Array[Byte] = {
    require(width >= 1, s"bad width $width")
    require(bits == 8 || bits == 24, s"encoder supports 8/24-bit, got $bits")
    val height = (payload.length + width - 1) / width
    val bytesPerPx = bits / 8
    val stride = ((width * bytesPerPx) + 3) & ~3
    val paletteBytes = if (bits == 8) 256 * 4 else 0
    val pixOff = 14 + 40 + paletteBytes
    val fileSize = pixOff + stride * height

    val out = new Array[Byte](fileSize)
    def putInt(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def putShort(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putInt(2, fileSize); putInt(10, pixOff)
    putInt(14, 40) // BITMAPINFOHEADER
    putInt(18, width); putInt(22, height) // positive => bottom-up
    putShort(26, 1); putShort(28, bits)
    putInt(30, 0) // BI_RGB
    putInt(34, stride * height)
    putInt(38, 2835); putInt(42, 2835) // 72 DPI
    putInt(46, if (bits == 8) 256 else 0); putInt(50, 0)
    if (bits == 8) {
      var i = 0
      while (i < 256) { // grayscale BGRA palette
        val p = 54 + 4 * i
        out(p) = i.toByte; out(p + 1) = i.toByte; out(p + 2) = i.toByte
        i += 1
      }
    }
    var r = 0
    while (r < height) {
      val rowOff = pixOff + (height - 1 - r) * stride // bottom-up
      var c = 0
      while (c < width) {
        val idx = r * width + c
        val v = if (idx < payload.length) payload(idx) else 0.toByte
        if (bits == 8) out(rowOff + c) = v
        else {
          val p = rowOff + c * 3
          out(p) = v; out(p + 1) = v; out(p + 2) = v
        }
        c += 1
      }
      r += 1
    }
    out
  }
}
