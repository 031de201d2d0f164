package graft.operators

/** A real PNG codec — the COMPRESSED-format image leg of the genuine
  * multimodal decode seam ([[BmpCodec]] covers the raw-container
  * case). Pure JVM: DEFLATE via `java.util.zip.{Deflater, Inflater}`
  * and CRC-32 via `java.util.zip.CRC32`, both JDK-standard — no image
  * libraries. PNG (RFC 2083 / ISO 15948) is a chunked container:
  * an 8-byte signature, then length-prefixed chunks (big-endian
  * lengths — the opposite of BMP/WAV, so a codec that assumes one
  * endianness everywhere reds immediately), each carrying a CRC-32
  * over its type + data; pixel data is zlib-compressed scanlines,
  * each prefixed by a per-row FILTER byte (None/Sub/Up/Average/Paeth)
  * that must be inverted byte-by-byte against the previous row.
  *
  * [[decode]] is a general parser, NOT specialized to [[encode]]'s
  * output: it accepts greyscale (colour 0) and truecolour (colour 2)
  * 8-bit images, any per-row filter mix, any number of IDAT chunks
  * (data is a single zlib stream SPLIT arbitrarily across them), and
  * skips ancillary chunks it does not know; every chunk's CRC is
  * verified, so wire rot anywhere in the file is caught, not decoded
  * into garbage. Malformed input throws `IllegalArgumentException`
  * for the quarantine wrapper.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Summary features [[decode]] recovers. `topRowSum` pins row
    * order: PNG scanlines are stored TOP-DOWN (unlike BMP), so the
    * top image row is the FIRST decoded scanline.
    */
  final case class PngInfo(
      width: Long,
      height: Long,
      bitDepth: Long,
      colourType: Long,
      nPixels: Long,
      peakPx: Long,
      meanPx: Long,
      topRowSum: Long)

  /** Decoded grid: lumas in top-down row-major order. */
  final case class PngPixels(width: Int, height: Int, colourType: Int,
                             lumas: Array[Int])

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def crcOf(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  private final case class Header(width: Int, height: Int, bitDepth: Int,
                                  colourType: Int) {
    def channels: Int = if (colourType == 0) 1 else 3
    def rowBytes: Int = width * channels
  }

  /** Walk the chunk table: verify the signature, every chunk's CRC
    * and the IHDR/IEND framing; return the header and the
    * concatenated IDAT payload (one zlib stream however it was
    * split).
    */
  private def parseChunks(blob: Array[Byte]): (Header, Array[Byte]) = {
    require(blob.length >= Signature.length + 12, s"truncated PNG: ${blob.length} bytes")
    var i = 0
    while (i < Signature.length) {
      require(blob(i) == Signature(i), f"bad signature byte $i: 0x${blob(i) & 0xff}%02x")
      i += 1
    }
    var off = Signature.length
    var header: Header = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    var first = true
    while (!sawEnd) {
      require(off + 12 <= blob.length, s"truncated chunk table at $off")
      val len = beInt(blob, off)
      require(len >= 0 && off + 12 + len <= blob.length,
        s"chunk length $len overruns blob at $off")
      val typ = new String(blob, off + 4, 4, "US-ASCII")
      val stored = beInt(blob, off + 8 + len)
      val calc = crcOf(blob, off + 4, 4 + len)
      require(stored == calc,
        f"crc mismatch in $typ: stored 0x$stored%08x != 0x$calc%08x")
      if (first) {
        require(typ == "IHDR", s"first chunk must be IHDR, got $typ")
        first = false
      }
      typ match {
        case "IHDR" =>
          require(header == null, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          val w = beInt(blob, off + 8)
          val h = beInt(blob, off + 12)
          require(w >= 1, s"bad width $w")
          require(h >= 0, s"bad height $h") // 0 tolerated for empty payloads
          val depth = blob(off + 16) & 0xff
          val colour = blob(off + 17) & 0xff
          require(depth == 8, s"unsupported bit depth $depth")
          require(colour == 0 || colour == 2, s"unsupported colour type $colour")
          require((blob(off + 18) & 0xff) == 0, "unsupported compression method")
          require((blob(off + 19) & 0xff) == 0, "unsupported filter method")
          require((blob(off + 20) & 0xff) == 0, "interlaced PNG unsupported")
          header = Header(w, h, depth, colour)
        case "IDAT" =>
          require(header != null, "IDAT before IHDR")
          idat.write(blob, off + 8, len)
        case "IEND" =>
          require(len == 0, s"bad IEND length $len")
          sawEnd = true
        case _ => // ancillary (tEXt etc.): CRC-checked above, content skipped
      }
      off += 12 + len
    }
    require(header != null, "missing IHDR")
    (header, idat.toByteArray)
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var got = 0
    try {
      while (got < expected && !inf.finished()) {
        val n =
          try inf.inflate(out, got, expected - got)
          catch {
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
          }
        require(n > 0 || inf.finished(), "zlib stream stalled (truncated IDAT)")
        got += n
      }
      require(got == expected, s"inflated $got bytes, expected $expected")
      // drain: a spec-conformant stream ends exactly here
      val probe = new Array[Byte](1)
      require(inf.finished() ||
        (try inf.inflate(probe) catch { case _: java.util.zip.DataFormatException => 1 }) == 0,
        "excess pixel data after the last scanline")
    } finally inf.end()
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Invert the per-row filters in place: `filt` holds height rows of
    * (1 filter byte + rowBytes); returns the raw scanline bytes.
    */
  private def unfilter(filt: Array[Byte], h: Header): Array[Byte] = {
    val bpp = h.channels // 8-bit: one byte per channel
    val rb = h.rowBytes
    val out = new Array[Byte](h.height * rb)
    var r = 0
    while (r < h.height) {
      val ft = filt(r * (rb + 1)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $r")
      val src = r * (rb + 1) + 1
      val dst = r * rb
      var i = 0
      while (i < rb) {
        val x = filt(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val b = if (r > 0) out(dst - rb + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) out(dst - rb + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Full-grid decode: chunk walk, CRC checks, zlib inflate, filter
    * inversion, channel fold to lumas (truecolour luma = channel
    * mean, matching [[BmpCodec]]'s convention).
    */
  def decodePixels(blob: Array[Byte]): PngPixels = {
    val (h, idat) = parseChunks(blob)
    val raw = unfilter(inflate(idat, h.height * (h.rowBytes + 1)), h)
    val lumas = new Array[Int](h.width * h.height)
    var px = 0
    if (h.channels == 1) {
      while (px < lumas.length) { lumas(px) = raw(px) & 0xff; px += 1 }
    } else {
      while (px < lumas.length) {
        val o = px * 3
        lumas(px) = ((raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)) / 3
        px += 1
      }
    }
    PngPixels(h.width, h.height, h.colourType, lumas)
  }

  /** Summary-feature decode (the quarantine-wrappable entry). */
  def decode(blob: Array[Byte]): PngInfo = {
    val px = decodePixels(blob)
    var peak = 0L; var sum = 0L; var top = 0L
    var i = 0
    while (i < px.lumas.length) {
      val v = px.lumas(i)
      if (v > peak) peak = v
      sum += v
      if (i < px.width) top += v
      i += 1
    }
    val n = px.width.toLong * px.height // bit depth is pinned to 8 by the parser
    PngInfo(px.width, px.height, 8, px.colourType, n, peak,
      if (n > 0) sum / n else 0L, top)
  }

  /** Deterministic PNG writer: one grayscale luma per payload byte in
    * top-down reading order, `height = ceil(len / width)`, last row
    * zero-padded. Colour 0 writes the byte once per pixel; colour 2
    * writes (v,v,v) truecolour. Every row's filter type cycles
    * `row % 5` — None, Sub, Up, Average, Paeth all appear in any
    * image of ≥ 5 rows, so the decoder's whole filter suite is
    * exercised on every round trip. The compressed stream is split
    * across TWO IDAT chunks (PNG allows any split; a decoder that
    * assumes one chunk per stream breaks), and an ancillary tEXt
    * chunk sits between IHDR and the IDATs for the skip path.
    */
  def encode(payload: Array[Byte], width: Int, colourType: Int): Array[Byte] = {
    require(width >= 1, s"bad width $width")
    require(colourType == 0 || colourType == 2, s"encoder supports colour 0/2, got $colourType")
    val channels = if (colourType == 0) 1 else 3
    val height = (payload.length + width - 1) / width
    val rb = width * channels
    // raw scanlines
    val raw = new Array[Byte](height * rb)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val idx = r * width + c
        val v = if (idx < payload.length) payload(idx) else 0.toByte
        var ch = 0
        while (ch < channels) { raw(r * rb + c * channels + ch) = v; ch += 1 }
        c += 1
      }
      r += 1
    }
    // forward-filter
    val bpp = channels
    val filt = new Array[Byte](height * (rb + 1))
    r = 0
    while (r < height) {
      val ft = r % 5
      filt(r * (rb + 1)) = ft.toByte
      var i = 0
      while (i < rb) {
        val x = raw(r * rb + i) & 0xff
        val a = if (i >= bpp) raw(r * rb + i - bpp) & 0xff else 0
        val b = if (r > 0) raw((r - 1) * rb + i) & 0xff else 0
        val cc = if (r > 0 && i >= bpp) raw((r - 1) * rb + i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, cc)
        }
        filt(r * (rb + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      r += 1
    }
    // deflate
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    defl.setInput(filt)
    defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) {
      val n = defl.deflate(tmp)
      zbuf.write(tmp, 0, n)
    }
    defl.end()
    val z = zbuf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      def be(v: Int): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be(len), 0, 4)
      val td = new Array[Byte](4 + len)
      typ.getBytes("US-ASCII").copyToArray(td, 0)
      data.copyToArray(td, 4)
      out.write(td, 0, td.length)
      out.write(be(crcOf(td, 0, td.length)), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    def putBe(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    putBe(0, width); putBe(4, height)
    ihdr(8) = 8; ihdr(9) = colourType.toByte // depth, colour
    chunk("IHDR", ihdr)
    chunk("tEXt", "Software graft-png-encoder-v1".getBytes("US-ASCII"))
    val split = z.length / 2
    chunk("IDAT", z.slice(0, split))
    chunk("IDAT", z.slice(split, z.length))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Offset of the first IDAT chunk's first DATA byte — the fixture
    * corruption point for the quarantine query (flipping it breaks
    * that chunk's CRC, proving the decoder actually validates CRCs).
    */
  private[graft] def firstIdatDataOffset(blob: Array[Byte]): Int = {
    var off = Signature.length
    while (off + 8 <= blob.length) {
      val len = beInt(blob, off)
      val typ = new String(blob, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") return off + 8
      off += 12 + len
    }
    sys.error("no IDAT chunk")
  }
}
