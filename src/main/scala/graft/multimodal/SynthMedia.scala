package graft.multimodal

/** Deterministic media synthesis for the oracle-verifiable decode
  * query (q_multimodal_decode): payloads are ENCODED from closed-form
  * integer pixel/sample formulas keyed on the row id, decoded back
  * through the REAL codecs ([[Codec]]), and the decoded exact integer
  * aggregates ([[Codec.PixelStats]]/[[Codec.AudioStats]]) are compared
  * against the same formulas evaluated analytically in SQL — an
  * end-to-end encode→container→decode→aggregate proof with a DuckDB
  * oracle, the strongest check a lossless decode path can get. (The
  * reference's multimodal story stops at opaque payload handling; this
  * is the verification discipline applied to it.)
  *
  * The formulas are plain modular arithmetic so they are expressible
  * identically in Spark-side JVM encode and oracle-side SQL:
  *
  *   w(id)  = 8 + (id % 5) * 4          (8..24 px)
  *   h(id)  = 8 + (id % 3) * 4          (8..16 px)
  *   b(x,y) = (id*31 + x*7  + y*13) % 256
  *   g(x,y) = (id*17 + x*11 + y*3 ) % 256
  *   r(x,y) = (id*23 + x*5  + y*19) % 256
  *   ns(id) = 256 + (id % 7) * 64       (256..640 samples)
  *   s(i)   = (id*7919 + i*104729) % 65536 - 32768
  *
  * Modality routes by id % 4: 0 → 24-bit BMP, 1 → 8-bit RGB PNG
  * (deflate + CRC via `java.util.zip`, filter 0 — the decoder handles
  * all five predictors, spec-pinned elsewhere), 2 → 16-bit PCM WAV,
  * 3 → grayscale GIF (256-gray palette, LZW-coded with the literal+
  * periodic-clear emission — a GIF image cannot hold more than 256
  * colors, so the gray ramp keeps the pixel formula exactly
  * representable; gray level = the `b(x,y)` formula, so the decoded
  * channel sums are all equal to Σb). JPEG is deliberately absent:
  * lossy decode has no analytic oracle — its witness is the ImageIO
  * cross-validation in CodecSpec. */
object SynthMedia {

  def widthOf(id: Long): Int = (8 + (id % 5) * 4).toInt
  def heightOf(id: Long): Int = (8 + (id % 3) * 4).toInt
  def nSamplesOf(id: Long): Int = (256 + (id % 7) * 64).toInt

  def blue(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def green(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 3) % 256).toInt
  def red(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 5 + y * 19) % 256).toInt
  def sample(id: Long, i: Int): Int = ((id * 7919 + i * 104729L) % 65536 - 32768).toInt

  /** The (modality, payload) for a row id — id % 4 routes the format. */
  def forId(id: Long): (String, Array[Byte]) = (id % 4) match {
    case 0 => ("bmp", bmpFor(id))
    case 1 => ("png", pngFor(id))
    case 2 => ("wav", wavFor(id))
    case _ => ("gif", gifFor(id))
  }

  private def bmpFor(id: Long): Array[Byte] =
    encodeBmp24(widthOf(id), heightOf(id),
      (x, y) => (blue(id, x, y), green(id, x, y), red(id, x, y)))

  private def pngFor(id: Long): Array[Byte] =
    encodePngRgb(widthOf(id), heightOf(id),
      (x, y) => (red(id, x, y), green(id, x, y), blue(id, x, y)))

  private def wavFor(id: Long): Array[Byte] = {
    val n = nSamplesOf(id)
    val s = new Array[Short](n)
    var i = 0
    while (i < n) { s(i) = sample(id, i).toShort; i += 1 }
    encodeWavPcm16(s, sampleRate = 16000)
  }

  private def gifFor(id: Long): Array[Byte] =
    encodeGifGray(widthOf(id), heightOf(id), (x, y) => blue(id, x, y))

  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Long): Unit = {
    var k = 0
    while (k < 4) { b(i + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
  }

  /** Uncompressed bottom-up 24-bit BMP (BITMAPINFOHEADER, BI_RGB,
    * 4-byte row padding) from a per-pixel (b,g,r) function. */
  def encodeBmp24(w: Int, h: Int, bgr: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size); putLe32(out, 10, 54)
    putLe32(out, 14, 40) // BITMAPINFOHEADER
    putLe32(out, 18, w); putLe32(out, 22, h) // positive height: bottom-up
    putLe16(out, 26, 1); putLe16(out, 28, 24)
    putLe32(out, 30, 0) // BI_RGB
    putLe32(out, 34, rowBytes.toLong * h)
    var y = 0
    while (y < h) {
      // bottom-up: file row 0 is image row h-1
      val base = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val (b, g, r) = bgr(x, y)
        out(base + x * 3) = b.toByte
        out(base + x * 3 + 1) = g.toByte
        out(base + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal 8-bit RGB (color type 2) non-interlaced PNG: IHDR +
    * one IDAT (zlib via `java.util.zip.Deflater`, every scanline
    * filter 0) + IEND, CRC32 per chunk — enough container for the
    * decoder's full inflate+unfilter path to prove itself. */
  def encodePngRgb(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val base = y * (1 + w * 3) + 1 // scanline filter byte 0 already there
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        raw(base + x * 3) = r.toByte
        raw(base + x * 3 + 1) = g.toByte
        raw(base + x * 3 + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = zbuf.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(ctype: String, body: Array[Byte]): Unit = {
      val be = new Array[Byte](4)
      def putBe32(v: Long): Unit = {
        var k = 0
        while (k < 4) { be(k) = ((v >> (8 * (3 - k))) & 0xff).toByte; k += 1 }
        bos.write(be)
      }
      putBe32(body.length)
      val tb = ctype.getBytes("US-ASCII")
      bos.write(tb); bos.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      putBe32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    var k = 0
    while (k < 4) {
      ihdr(k) = ((w >> (8 * (3 - k))) & 0xff).toByte
      ihdr(4 + k) = ((h >> (8 * (3 - k))) & 0xff).toByte
      k += 1
    }
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type RGB
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    bos.toByteArray
  }

  /** Grayscale GIF89a from a per-pixel gray function: full 256-gray
    * global color table so the pixel value IS the palette index, LZW
    * with 8-bit roots emitted as literal codes plus a clear every 254
    * codes (the classic "uncompressed GIF" emission — the code width
    * never leaves 9 bits, and the decoder's dictionary resets before it
    * would force a width change). `interlace` emits rows in the 4-pass
    * order; `transparentIdx` adds a Graphic Control Extension. */
  def encodeGifGray(w: Int, h: Int, gray: (Int, Int) => Int,
                    interlace: Boolean = false,
                    transparentIdx: Int = -1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    bos.write(0x80 | 0x70 | 0x07) // GCT present, 8-bit color res, 256 entries
    bos.write(0); bos.write(0) // background index, aspect
    var p = 0
    while (p < 256) { bos.write(p); bos.write(p); bos.write(p); p += 1 }
    if (transparentIdx >= 0) {
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0x01) // transparency flag
      bos.write(0); bos.write(0) // delay
      bos.write(transparentIdx); bos.write(0)
    }
    bos.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    bos.write(if (interlace) 0x40 else 0)
    bos.write(8) // LZW minimum code size
    // --- LZW literal emission, 9-bit codes, LSB-first
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nAcc; nAcc += 9
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    val clear = 256; val eoi = 257
    putCode(clear)
    var emitted = 0
    val rows: Seq[Int] =
      if (!interlace) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
        case (start, step) => start until h by step }
    for (y <- rows; x <- 0 until w) {
      if (emitted == 254) { putCode(clear); emitted = 0 }
      putCode(gray(x, y) & 0xff)
      emitted += 1
    }
    putCode(eoi)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    // --- sub-block the code stream
    val stream = bits.toByteArray
    var off = 0
    while (off < stream.length) {
      val n = math.min(255, stream.length - off)
      bos.write(n); bos.write(stream, off, n)
      off += n
    }
    bos.write(0) // block terminator
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  /** Minimal mono 16-bit PCM WAV (RIFF + fmt + data, the layout
    * [[AudioMeta.parse]] walks). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36L + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, 1) // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate.toLong * 2)
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) {
      putLe16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }
}
