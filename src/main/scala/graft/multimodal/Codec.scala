package graft.multimodal

/** REAL decoders for the formats that need no codec library —
  * uncompressed 24-bit BMP (raw BGR pixel array, public layout),
  * 16-bit PCM WAV (raw little-endian samples, layout from
  * [[AudioMeta]]), PNG pixels (zlib via `java.util.zip.Inflater` +
  * the five W3C filter predictors), and baseline JPEG pixels (ITU
  * T.81 sequential DCT: Huffman entropy decode, dequant, IDCT, chroma
  * upsampling, YCbCr→RGB). Together with the header parsers they
  * upgrade the multimodal story from "all decode stubbed" to "stub
  * only where an actual patented/complex compressed codec (MP3
  * frames, progressive/arithmetic JPEG) would be required".
  *
  * Each decoder returns the [[DecodeStub.FeatureDim]]-wide feature
  * vector a training-data filter consumes (channel means / energy
  * statistics), deterministically: same bytes, same floats, any JVM —
  * the arithmetic is plain float accumulation in byte order.
  */
object Codec {

  /** Exact integer pixel aggregates — the ORACLE-VERIFIABLE face of a
    * decode: every decoder produces integer samples before any float
    * math, so channel sums in native sample units (`maxVal` = 255 for
    * 8-bit, 65535 for 16-bit, always 255 for palette entries) plus the
    * pixel count determine the float features exactly. Alpha is in the
    * same units (opaque = `maxVal` per pixel). */
  final case class PixelStats(nPixels: Long, maxVal: Int,
                              sumB: Long, sumG: Long, sumR: Long, sumA: Long)

  /** Exact integer sample aggregates for PCM audio: sum of squared raw
    * 16-bit samples, sign-change count between successive same-channel
    * samples, and the peak |sample| (0..32768). */
  final case class AudioStats(nSamples: Long, frames: Long, channels: Int,
                              sumSq: Long, crossings: Long, peakRaw: Int)

  /** Corpus-sanity pixel bound (64 Mpx ≈ 8192x8192): header-declared
    * dimensions drive buffer allocation BEFORE any pixel data is
    * validated, so a 100-byte crafted payload could otherwise demand
    * multi-GB arrays and OOM the executor — an Error, not a
    * filter-don't-fail null. Anything larger filters to the stub. */
  val MaxPixels: Long = 1L << 26

  private[multimodal] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private[multimodal] def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** True iff the payload is an uncompressed 24-bit BMP this decoder
    * handles. */
  def isBmp24(b: Array[Byte]): Boolean =
    b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
      le16(b, 28) == 24 && le32(b, 30) == 0 // BI_RGB, no compression

  /** Mean B, G, R (0-1), mean luminance (Rec. 601), pixel count, and
    * zeros padding to FeatureDim. Handles bottom-up (positive height)
    * and top-down (negative) rows and the 4-byte row padding — feature
    * MEANS are row-order invariant anyway, but bounds are honored
    * per-spec. Returns null if the pixel array is truncated. */
  def decodeBmp24(b: Array[Byte]): Array[Float] = {
    val st = statsBmp24(b)
    if (st == null) return null
    val n = st.nPixels.toDouble
    val mb = (st.sumB / n / 255.0).toFloat
    val mg = (st.sumG / n / 255.0).toFloat
    val mr = (st.sumR / n / 255.0).toFloat
    val luma = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr; f(3) = luma; f(4) = n.toFloat
    f(5) = 1.0f // 24-bit BMP has no alpha: opaque, like the other decoders
    f
  }

  /** [[decodeBmp24]]'s exact integer core: raw channel byte sums —
    * Long accumulation, no float on the path, so the result is an
    * oracle-checkable exact aggregate. */
  def statsBmp24(b: Array[Byte]): PixelStats = {
    if (!isBmp24(b)) return null
    val off = le32(b, 10).toInt
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val h = math.abs(hRaw)
    // MaxPixels also keeps w*3 far from Int overflow (a crafted width of
    // ~0x55555557 would wrap rowBytes tiny and defeat the bounds check)
    if (w <= 0 || h <= 0 || w.toLong * h > Codec.MaxPixels) return null
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowBytes.toLong * h > b.length) return null
    var sb = 0L; var sg = 0L; var sr = 0L
    var y = 0
    while (y < h) {
      var x = 0
      val base = off + y * rowBytes
      while (x < w) {
        sb += u8(b, base + x * 3)
        sg += u8(b, base + x * 3 + 1)
        sr += u8(b, base + x * 3 + 2)
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    PixelStats(n, 255, sb, sg, sr, 255L * n)
  }

  /** True iff the payload is a 16-bit PCM WAV [[decodePcm16]] handles. */
  def isPcm16(b: Array[Byte]): Boolean = {
    val m = AudioMeta.parse(b)
    m != null && m.getInt(2) == 16
  }

  /** Byte offset of the RIFF `data` chunk body, -1 when absent — the
    * ONE chunk walk every PCM consumer shares ([[decodePcm16]],
    * [[AudioHash.energyGridPcm16]]): odd chunk sizes pad to even, the
    * size advances in Long so a ~2 GB declared size cannot wrap Int and
    * loop. */
  private[multimodal] def dataChunkBody(b: Array[Byte]): Int = {
    var i = 12
    var body = -1
    while (body < 0 && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
        body = i + 8
      else {
        val next = i + 8L + size + (size & 1L)
        if (next <= i || next > b.length) i = b.length else i = next.toInt
      }
    }
    body
  }

  /** RMS energy (0-1), zero-crossing rate (fraction of successive
    * same-channel sample pairs changing sign), peak amplitude (0-1),
    * frame count — over the interleaved 16-bit little-endian samples of
    * the `data` chunk. */
  def decodePcm16(b: Array[Byte]): Array[Float] = {
    val st = statsPcm16(b)
    if (st == null) return null
    val f = new Array[Float](DecodeStub.FeatureDim)
    if (st.nSamples > 0) {
      // 32768^2 per unit: sumSq is the raw-sample square sum
      f(0) = math.sqrt(st.sumSq / (st.nSamples * 32768.0 * 32768.0)).toFloat
      f(1) = (st.crossings.toDouble /
        math.max(1L, st.nSamples - st.channels)).toFloat
      f(2) = (st.peakRaw / 32768.0).toFloat
      f(3) = st.frames.toFloat
    }
    f
  }

  /** [[decodePcm16]]'s exact integer core: Long sum of squared raw
    * samples, sign-change count, raw peak — no float on the path. */
  def statsPcm16(b: Array[Byte]): AudioStats = {
    val meta = AudioMeta.parse(b)
    if (meta == null || meta.getInt(2) != 16) return null
    val channels = meta.getInt(0)
    val frames = meta.getLong(3)
    // find the data chunk body again (cheap: header walk is tiny)
    val body = dataChunkBody(b)
    if (body < 0) return null
    // frames = dataBytes / fmt.blockAlign: a malformed WAV declaring
    // block < channels*2 inflates the frame count past the actual
    // sample bytes — reading it would run off the buffer and crash the
    // task. Filter-don't-fail: reject anything whose implied sample
    // range doesn't fit in the bytes present after the data header.
    val nSamples = (frames * channels).toInt
    if (nSamples < 0 || frames * channels * 2 > (b.length - body).toLong) return null
    var sumSq = 0L; var peak = 0; var crossings = 0L
    val prev = new Array[Int](channels)
    var s = 0
    while (s < nSamples) {
      val v = le16(b, body + s * 2).toShort.toInt
      val a = math.abs(v)
      sumSq += v.toLong * v
      if (a > peak) peak = a
      val ch = s % channels
      if (s >= channels && (v < 0) != (prev(ch) < 0)) crossings += 1
      prev(ch) = v
      s += 1
    }
    AudioStats(nSamples.toLong, frames, channels, sumSq, crossings, peak)
  }

  // ---------------------------------------------------------------- PNG

  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** True iff the payload starts with the 8-byte PNG signature. */
  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 + 25 && (0 until 8).forall(i => b(i) == PngSig(i))

  /** PNG pixel decode, library-free: chunk walk (CRC-validated) → zlib
    * inflate of the concatenated IDAT stream (`java.util.zip.Inflater`
    * handles the RFC 1950 wrapper) → per-scanline unfilter with the five
    * PNG filter predictors (None/Sub/Up/Average/Paeth, W3C PNG spec
    * §9 "Filtering") → channel accumulation. Returns the same feature
    * layout as [[decodeBmp24]]: mean B, G, R (0-1), Rec. 601 luma, pixel
    * count, plus mean alpha in slot 5 (1.0 for opaque color types).
    *
    * Coverage: color types 0 (gray, depths 1/2/4/8/16), 2 (RGB 8/16),
    * 3 (palette, depths 1/2/4/8, PLTE required), 4 (gray+alpha 8/16),
    * 6 (RGBA 8/16), both non-interlaced and Adam7-interlaced (each pass
    * is an independently-filtered sub-image; means need no pixel
    * placement). Anything else — truncated stream, bad CRC, inflate
    * error — returns null (filter-don't-fail): the row is filtered,
    * never a task crash. */
  def decodePng(b: Array[Byte]): Array[Float] = {
    val st = statsPng(b)
    if (st == null) return null
    val n = st.nPixels.toDouble
    val scale = st.maxVal.toDouble
    val mr = (st.sumR / scale / n).toFloat
    val mg = (st.sumG / scale / n).toFloat
    val mb = (st.sumB / scale / n).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr
    f(3) = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    f(4) = n.toFloat
    f(5) = (st.sumA / scale / n).toFloat
    f
  }

  /** [[decodePng]]'s exact integer core: Long channel sums in native
    * sample units (`maxVal` = (1<<depth)-1; palette entries and their
    * tRNS alpha are always 8-bit so `maxVal` is 255 for color type 3
    * regardless of index depth). Same coverage and filter-don't-fail
    * contract as the float face. */
  def statsPng(b: Array[Byte]): PixelStats = {
    if (!isPng(b)) return null
    // --- chunk walk: IHDR, PLTE, IDAT*, IEND; CRC32 over type+data
    var w = 0; var h = 0; var depth = 0; var colorType = -1; var interlace = 0
    var plte: Array[Byte] = null
    var trns: Array[Byte] = null // ct3: per-entry alpha; ct0/ct2: color key
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var seenIhdr = false; var seenIend = false
    while (!seenIend && i + 12 <= b.length) {
      val len = be32(b, i).toInt
      if (len < 0 || i + 12L + len > b.length) return null
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + len)
      if (crc.getValue != be32(b, i + 8 + len)) return null
      val ctype = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (len != 13) return null
          w = be32(b, i + 8).toInt; h = be32(b, i + 12).toInt
          depth = u8(b, i + 16); colorType = u8(b, i + 17)
          if (u8(b, i + 18) != 0 || u8(b, i + 19) != 0) return null // compression/filter method
          interlace = u8(b, i + 20)
          seenIhdr = true
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "tRNS" => trns = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => seenIend = true
        case _      => () // ancillary chunks ignored
      }
      i += 12 + len
    }
    if (!seenIhdr || !seenIend || w <= 0 || h <= 0 || interlace > 1) return null
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return null
    }
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(depth)
      case 3 => Set(1, 2, 4, 8)(depth) && plte != null && plte.length % 3 == 0
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return null
    val bitsPerPixel = channels * depth
    // sub-images: the whole frame, or the 7 Adam7 passes — channel MEANS
    // are position-independent, and every pixel lands in exactly one
    // pass, so interlacing only changes the scanline segmentation
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((w, h))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)).map {
        case (x0, y0, dx, dy) =>
          (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
      }.filter(p => p._1 > 0 && p._2 > 0)
    def strideOf(wp: Int): Int = ((wp.toLong * bitsPerPixel + 7) / 8).toInt
    val raw = passes.map { case (wp, hp) => (strideOf(wp) + 1).toLong * hp }.sum
    if (raw > Int.MaxValue - 8 || w.toLong * h > Codec.MaxPixels) return null
    // --- inflate the full filtered image
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val img = new Array[Byte](raw.toInt)
    var got = 0
    try {
      while (got < img.length && !inf.finished()) {
        val n = inf.inflate(img, got, img.length - got)
        // truncated stream, or an FDICT zlib header awaiting a preset
        // dictionary (never valid in PNG): bail, don't spin forever
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got < img.length) return null
    // --- per sub-image: unfilter in place, then accumulate channel sums
    val bpp = math.max(1, bitsPerPixel / 8)
    val maxVal = (1 << math.min(depth, 16)) - 1
    // palette samples and per-entry tRNS alpha are 8-bit regardless of
    // the (index) depth: color type 3 accumulates in 255 units
    val chScale = if (colorType == 3) 255 else maxVal
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var segOff = 0
    for ((wp, hp) <- passes) {
      val stride = strideOf(wp)
      var y = 0
      while (y < hp) {
        val rowOff = segOff + y * (stride + 1)
        val filter = u8(img, rowOff)
        if (filter > 4) return null
        val cur = rowOff + 1
        val prev = cur - stride - 1 // previous row of THIS pass
        var x = 0
        while (x < stride) {
          val a = if (x >= bpp) u8(img, cur + x - bpp) else 0
          val up = if (y > 0) u8(img, prev + x) else 0
          val c = if (y > 0 && x >= bpp) u8(img, prev + x - bpp) else 0
          val recon = filter match {
            case 0 => u8(img, cur + x)
            case 1 => u8(img, cur + x) + a
            case 2 => u8(img, cur + x) + up
            case 3 => u8(img, cur + x) + ((a + up) >> 1)
            case 4 =>
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
              u8(img, cur + x) + pred
          }
          img(cur + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // idx-th sample of row y of this pass, depth-aware
      def samp(row: Int, idx: Int): Int = {
        val base = segOff + row * (stride + 1) + 1
        if (depth == 16) (u8(img, base + idx * 2) << 8) | u8(img, base + idx * 2 + 1)
        else if (depth == 8) u8(img, base + idx)
        else { // 1/2/4-bit packed MSB-first
          val bitPos = idx * depth
          (u8(img, base + (bitPos >> 3)) >> (8 - depth - (bitPos & 7))) & maxVal
        }
      }
      y = 0
      while (y < hp) {
        var x = 0
        while (x < wp) {
          colorType match {
            case 0 =>
              val v = samp(y, x)
              sr += v; sg += v; sb += v
              // tRNS on gray: a 2-byte color key marks the transparent value
              sa += (if (trns != null && trns.length >= 2 &&
                  v == ((u8(trns, 0) << 8) | u8(trns, 1))) 0L else maxVal.toLong)
            case 2 =>
              val r = samp(y, x * 3); val g = samp(y, x * 3 + 1); val b2 = samp(y, x * 3 + 2)
              sr += r; sg += g; sb += b2
              // tRNS on RGB: a 3x2-byte color key
              sa += (if (trns != null && trns.length >= 6 &&
                  r == ((u8(trns, 0) << 8) | u8(trns, 1)) &&
                  g == ((u8(trns, 2) << 8) | u8(trns, 3)) &&
                  b2 == ((u8(trns, 4) << 8) | u8(trns, 5))) 0L else maxVal.toLong)
            case 3 =>
              val idxP = samp(y, x)
              val pi = idxP * 3
              if (pi + 2 >= plte.length) return null
              sr += u8(plte, pi)
              sg += u8(plte, pi + 1)
              sb += u8(plte, pi + 2)
              // tRNS on palette: per-entry alpha, entries past it opaque
              sa += (if (trns != null && idxP < trns.length) u8(trns, idxP).toLong
                     else 255L)
            case 4 =>
              val g = samp(y, x * 2)
              sr += g; sg += g; sb += g
              sa += samp(y, x * 2 + 1)
            case 6 =>
              sr += samp(y, x * 4)
              sg += samp(y, x * 4 + 1)
              sb += samp(y, x * 4 + 2)
              sa += samp(y, x * 4 + 3)
          }
          x += 1
        }
        y += 1
      }
      segOff += (stride + 1) * hp
    }
    PixelStats(w.toLong * h, chScale, sb, sg, sr, sa)
  }

  // --------------------------------------------------------------- JPEG

  private[multimodal] def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  /** True iff the payload starts with the JPEG SOI marker. */
  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length > 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  /** Zig-zag index -> natural (row-major) index, ITU T.81 Figure 5. */
  private[multimodal] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** ct(v)(x) = C(v) * cos((2x+1) v pi / 16) — the 1-D IDCT basis with
    * the normalization folded in (C(0)=1/sqrt2, else 1). */
  private[multimodal] val IdctBasis: Array[Array[Double]] = Array.tabulate(8, 8) { (v, x) =>
    (if (v == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * x + 1) * v * math.Pi / 16.0)
  }

  /** Canonical Huffman table in the T.81 F.2.2.3 decode form. */
  private[multimodal] final class Huff(bits: Array[Int], val huffval: Array[Byte]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k; mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1; l += 1
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment; handles 0xFF00
    * byte stuffing and stops (returns -1) at any real marker. */
  private[multimodal] final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var atMarker = false
    def nextBit(): Int = {
      if (nbits == 0) {
        if (atMarker || pos >= b.length) return -1
        var byte = u8(b, pos); pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { atMarker = true; return -1 }
          val m = u8(b, pos)
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { atMarker = true; pos -= 1; return -1 }
        }
        cur = byte; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = { // n extra bits, MSB first; -1 on starvation
      var v = 0; var i = 0
      while (i < n) { val bit = nextBit(); if (bit < 0) return -1; v = (v << 1) | bit; i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker, skipping any
      * unread padding bits / stuffed bytes / 0xFF fill before it. */
    def syncRestart(expect: Int): Boolean = {
      nbits = 0; atMarker = false
      while (pos + 1 < b.length &&
          !(u8(b, pos) == 0xff && u8(b, pos + 1) != 0x00 && u8(b, pos + 1) != 0xff))
        pos += 1
      if (pos + 1 >= b.length || u8(b, pos + 1) != expect) return false
      pos += 2
      true
    }
  }

  private[multimodal] def huffDecode(r: BitReader, h: Huff): Int = { // T.81 F.16; -1 on error
    var code = r.nextBit()
    if (code < 0) return -1
    var l = 1
    while (code > h.maxcode(l)) {
      l += 1
      if (l > 16) return -1
      val bit = r.nextBit()
      if (bit < 0) return -1
      code = (code << 1) | bit
    }
    val idx = h.valptr(l) + code - h.mincode(l)
    if (idx >= h.huffval.length) return -1
    u8(h.huffval, idx)
  }

  private[multimodal] def extend(v: Int, t: Int): Int = // T.81 F.12 sign extension
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Baseline-sequential JPEG pixel decode, library-free (public ITU
    * T.81): marker walk (DQT/DHT/SOF0-1/DRI/SOS) → canonical-Huffman
    * entropy decode with byte unstuffing and restart markers → dequant
    * (de-zigzagged) → separable double-precision 8x8 IDCT → per-pixel
    * chroma replication upsampling (T.871 box placement) → YCbCr→RGB
    * (JFIF / Rec.601 full-range) with per-pixel clamping. Same feature
    * layout as [[decodeBmp24]]: mean B, G, R (0-1), Rec. 601 luma,
    * pixel count, alpha 1 (JPEG has no alpha).
    *
    * Coverage: 8-bit baseline (SOF0) and extended-sequential Huffman
    * (SOF1), 1 component (grayscale) or 3 components (YCbCr, any
    * sampling factors 1-4 incl. 4:4:4 / 4:2:2 / 4:2:0), restart
    * intervals; progressive (SOF2) dispatches to [[ProgressiveJpeg]]
    * (T.81 Annex G). Arithmetic coding, hierarchical, 12-bit, and CMYK
    * return null (filter-don't-fail), falling back to the dispatch's
    * deterministic stub — the same contract as every other decoder
    * here. */
  def decodeJpeg(b: Array[Byte]): Array[Float] = {
    val px = decodeJpegPixels(b)
    if (px == null) null else jpegFeatures(px)
  }

  /** Decoded JPEG pixel planes (either coding mode) plus the sampling
    * geometry needed to read them — the shared pixel-level product
    * consumed by [[jpegFeatures]] and [[ImageHash]]'s luma grid. */
  private[multimodal] final case class JpegPixels(
      planes: Array[Array[Byte]], planeW: Array[Int],
      cH: Array[Int], cV: Array[Int], hMax: Int, vMax: Int,
      nComp: Int, w: Int, h: Int)

  /** [[decodeJpeg]] up to (but not including) the feature accumulation:
    * full pixel planes. Baseline/extended-sequential here; SOF2 routes
    * to [[ProgressiveJpeg]]. */
  private[multimodal] def decodeJpegPixels(b: Array[Byte]): JpegPixels = {
    if (!isJpeg(b)) return null
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val qtSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0; var nComp = 0
    // per component: id, hSamp, vSamp, quant id, DC tab, AC tab
    var cH: Array[Int] = null; var cV: Array[Int] = null; var cQ: Array[Int] = null
    var cDc: Array[Int] = null; var cAc: Array[Int] = null
    var restartInterval = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 3 >= b.length) return null
      if (u8(b, i) != 0xff) return null
      var m = u8(b, i + 1)
      while (m == 0xff) { i += 1; if (i + 3 >= b.length) return null; m = u8(b, i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val seg = i + 4; val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more (Pq<<4|Tq, 64 or 128 bytes)
            var p = seg
            while (p < segEnd) {
              val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
              if (tq > 3 || pq > 1 || p + 1 + 64 * (pq + 1) > segEnd) return null
              var k = 0
              while (k < 64) {
                qt(tq)(k) = if (pq == 1) be16(b, p + 1 + 2 * k) else u8(b, p + 1 + k)
                k += 1
              }
              qtSeen(tq) = true
              p += 1 + 64 * (pq + 1)
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
              if (tc > 1 || th > 3 || p + 17 > segEnd) return null
              val bits = Array.tabulate(16)(l => u8(b, p + 1 + l))
              val nv = bits.sum
              if (nv > 256 || p + 17 + nv > segEnd) return null
              val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + nv)
              val t = new Huff(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + nv
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (u8(b, seg) != 8) return null // precision
            h = be16(b, seg + 1); w = be16(b, seg + 3)
            nComp = u8(b, seg + 5)
            if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3) ||
                seg + 6 + 3 * nComp > segEnd) return null
            cH = new Array[Int](nComp); cV = new Array[Int](nComp); cQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              cH(c) = u8(b, seg + 7 + 3 * c) >> 4
              cV(c) = u8(b, seg + 7 + 3 * c) & 15
              cQ(c) = u8(b, seg + 8 + 3 * c)
              if (cH(c) < 1 || cH(c) > 4 || cV(c) < 1 || cV(c) > 4 || cQ(c) > 3) return null
              c += 1
            }
          case 0xc2 => // SOF2 progressive: the multi-scan sibling decoder
            return ProgressiveJpeg.decodePixels(b)
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf => return null // non-baseline frame types
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = be16(b, seg)
          case 0xda => // SOS
            if (nComp == 0) return null
            val ns = u8(b, seg)
            if (ns != nComp || seg + 1 + 2 * ns + 3 > segEnd) return null
            cDc = new Array[Int](nComp); cAc = new Array[Int](nComp)
            var c = 0
            while (c < ns) {
              // scan components are taken in frame order (the only layout
              // baseline interleaved encoders emit)
              cDc(c) = u8(b, seg + 2 + 2 * c) >> 4
              cAc(c) = u8(b, seg + 2 + 2 * c) & 15
              if (cDc(c) > 3 || cAc(c) > 3) return null
              c += 1
            }
            sosAt = segEnd
          case 0xd9 => return null // EOI before any scan
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    var c = 0
    while (c < nComp) {
      if (!qtSeen(cQ(c)) || dcTabs(cDc(c)) == null || acTabs(cAc(c)) == null) return null
      c += 1
    }
    // T.81 A.2.3: a single-component scan is NON-interleaved — data
    // units are plain 8x8 blocks in raster order and the frame's
    // sampling factors do not shape the MCU. A grayscale SOF declaring
    // 2x2 would otherwise mis-place every block (and miscount restart
    // intervals, which tick per MCU).
    if (nComp == 1) { cH(0) = 1; cV(0) = 1 }
    val hMax = cH.max; val vMax = cV.max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    if (w.toLong * h > Codec.MaxPixels) return null // corpus-sanity bound
    // component planes sized to whole MCUs (edge blocks decode fully)
    val planeW = Array.tabulate(nComp)(c => mcusX * cH(c) * 8)
    val planeH = Array.tabulate(nComp)(c => mcusY * cV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](planeW(c) * planeH(c)))
    val reader = new BitReader(b, sosAt)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    val tmp = new Array[Double](64)
    var rstCount = 0
    var rstMarker = 0xd0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!reader.syncRestart(rstMarker)) return null
          rstMarker = 0xd0 + ((rstMarker - 0xd0 + 1) & 7)
          java.util.Arrays.fill(pred, 0)
          rstCount = 0
        }
        c = 0
        while (c < nComp) {
          val q = qt(cQ(c)); val dcT = dcTabs(cDc(c)); val acT = acTabs(cAc(c))
          var by = 0
          while (by < cV(c)) {
            var bx = 0
            while (bx < cH(c)) {
              // --- entropy-decode one 8x8 block into coef (zigzag)
              java.util.Arrays.fill(coef, 0)
              val t = huffDecode(reader, dcT)
              if (t < 0 || t > 11) return null
              val diffBits = reader.receive(t)
              if (diffBits < 0) return null
              pred(c) += extend(diffBits, t)
              coef(0) = pred(c)
              var k = 1
              var eob = false
              while (!eob && k < 64) {
                val rs = huffDecode(reader, acT)
                if (rs < 0) return null
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true      // EOB
                } else {
                  k += r
                  if (k > 63) return null
                  val vb = reader.receive(s)
                  if (vb < 0) return null
                  coef(k) = extend(vb, s)
                  k += 1
                }
              }
              dequantIdctToPlane(coef, q, blk, tmp, planes(c), planeW(c),
                (mx * cH(c) + bx) * 8, (my * cV(c) + by) * 8)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    JpegPixels(planes, planeW, cH, cV, hMax, vMax, nComp, w, h)
  }

  /** (r, g, b) of one pixel from decoded planes into `out(0..2)`:
    * replication upsampling (T.871 box placement) + YCbCr→RGB (JFIF
    * full-range) with clamping — the ONE pixel-read path shared by
    * features and the luma grid. Out-param instead of a Tuple3 return:
    * both consumers call this once per pixel (up to MaxPixels times per
    * image), and an unspecialized Tuple3 would box three Doubles per
    * call — pure GC pressure on the corpus decode/hash hot loop. */
  private[multimodal] def jpegRgbAt(px: JpegPixels, x: Int, y: Int,
      out: Array[Double]): Unit = {
    if (px.nComp == 1) {
      val g = u8(px.planes(0), y * px.planeW(0) + x).toDouble
      out(0) = g; out(1) = g; out(2) = g
    } else {
      def sampC(c: Int): Int =
        u8(px.planes(c),
          (y * px.cV(c) / px.vMax) * px.planeW(c) + (x * px.cH(c) / px.hMax))
      val yy = sampC(0).toDouble
      val cb = sampC(1).toDouble - 128.0
      val cr = sampC(2).toDouble - 128.0
      def clamp(v: Double): Double = if (v < 0) 0 else if (v > 255) 255 else v
      out(0) = clamp(yy + 1.402 * cr)
      out(1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
      out(2) = clamp(yy + 1.772 * cb)
    }
  }

  /** Shared JPEG output stage ([[decodeJpeg]] / [[ProgressiveJpeg]]):
    * per-pixel accumulate into the standard feature layout. */
  private[multimodal] def jpegFeatures(px: JpegPixels): Array[Float] = {
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    val rgb = new Array[Double](3)
    var y = 0
    while (y < px.h) {
      var x = 0
      while (x < px.w) {
        jpegRgbAt(px, x, y, rgb)
        sr += rgb(0) / 255.0; sg += rgb(1) / 255.0; sb += rgb(2) / 255.0
        x += 1
      }
      y += 1
    }
    val n = px.w.toDouble * px.h
    val mr = (sr / n).toFloat; val mg = (sg / n).toFloat; val mb = (sb / n).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr
    f(3) = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    f(4) = n.toFloat
    f(5) = 1.0f // JPEG has no alpha channel
    f
  }

  /** Dequantize (zigzag `coef` × `q`), separable double-precision 8x8
    * IDCT, level-shift + clamp into `plane` at (x0,y0) — the shared
    * per-block output stage of both JPEG entropy decoders. `blk`/`tmp`
    * are caller-owned 64-wide scratch. */
  private[multimodal] def dequantIdctToPlane(coef: Array[Int], q: Array[Int],
      blk: Array[Double], tmp: Array[Double],
      plane: Array[Byte], planeW: Int, x0: Int, y0: Int): Unit = {
    java.util.Arrays.fill(blk, 0.0)
    var k = 0
    while (k < 64) { blk(ZigZag(k)) = coef(k).toDouble * q(k); k += 1 }
    // separable IDCT: rows (over v -> x), then columns
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s2 = 0.0
        var v = 0
        while (v < 8) { s2 += blk(u * 8 + v) * IdctBasis(v)(x); v += 1 }
        tmp(u * 8 + x) = 0.5 * s2
        x += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s2 = 0.0
        var u2 = 0
        while (u2 < 8) { s2 += tmp(u2 * 8 + x) * IdctBasis(u2)(y); u2 += 1 }
        val px = (0.5 * s2 + 128.0).round.toInt
        plane((y0 + y) * planeW + x0 + x) =
          (if (px < 0) 0 else if (px > 255) 255 else px).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------------- GIF

  /** True iff the payload starts with a GIF87a/GIF89a signature. */
  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Frame-0 of a decoded GIF: palette indices in raster order plus the
    * (local-or-global) color table and the GCE transparent index (-1 if
    * opaque) — the pixel-level product behind [[decodeGif]] and the
    * GIF luma grid. */
  private[multimodal] final case class GifPixels(
      w: Int, h: Int, idx: Array[Byte], palette: Array[Byte],
      transparentIdx: Int)

  /** GIF frame-0 pixel decode, library-free (public GIF89a spec):
    * logical-screen walk → extensions (Graphic Control gives the
    * transparent index) → first image descriptor → variable-width LZW
    * over the concatenated data sub-blocks (clear/EOI codes, dictionary
    * to 12 bits, the KwKwK case) → optional 4-pass interlace
    * de-permutation. Later frames are ignored (frame 0 is the corpus
    * feature contract). Truncated/corrupt streams, a missing color
    * table, or oversized dimensions → null (filter-don't-fail). */
  private[multimodal] def decodeGifPixels(b: Array[Byte]): GifPixels = {
    if (!isGif(b)) return null
    val packed = u8(b, 10)
    val gctSize = 2 << (packed & 7)
    var i = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      if (i + 3 * gctSize > b.length) return null
      gct = java.util.Arrays.copyOfRange(b, i, i + 3 * gctSize)
      i += 3 * gctSize
    }
    var transparentIdx = -1
    while (true) {
      if (i >= b.length) return null
      u8(b, i) match {
        case 0x3b => return null // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          if (i + 2 > b.length) return null
          val label = u8(b, i + 1)
          i += 2
          // Graphic Control Extension: transparency flag + index
          if (label == 0xf9 && i + 5 <= b.length && u8(b, i) == 4) {
            if ((u8(b, i + 1) & 1) != 0) transparentIdx = u8(b, i + 4)
          }
          var sz = if (i < b.length) u8(b, i) else return null
          while (sz != 0) {
            i += 1 + sz
            if (i >= b.length) return null
            sz = u8(b, i)
          }
          i += 1 // block terminator
        case 0x2c => // image descriptor: frame 0
          if (i + 10 > b.length) return null
          val fw = le16(b, i + 5); val fh = le16(b, i + 7)
          val p2 = u8(b, i + 9)
          i += 10
          if (fw <= 0 || fh <= 0 || fw.toLong * fh > MaxPixels) return null
          var palette = gct
          if ((p2 & 0x80) != 0) {
            val lctSize = 2 << (p2 & 7)
            if (i + 3 * lctSize > b.length) return null
            palette = java.util.Arrays.copyOfRange(b, i, i + 3 * lctSize)
            i += 3 * lctSize
          }
          if (palette == null) return null
          if (i >= b.length) return null
          val minCode = u8(b, i)
          i += 1
          if (minCode < 1 || minCode > 11) return null
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var sz = if (i < b.length) u8(b, i) else return null
          while (sz != 0) {
            if (i + 1 + sz > b.length) return null
            data.write(b, i + 1, sz)
            i += 1 + sz
            if (i >= b.length) return null
            sz = u8(b, i)
          }
          val raster = lzwDecode(data.toByteArray, minCode, fw * fh)
          if (raster == null) return null
          // de-interlace: rows arrive in the 4 GIF passes
          val idx =
            if ((p2 & 0x40) == 0) raster
            else {
              val out = new Array[Byte](fw * fh)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < fh) {
                  System.arraycopy(raster, src * fw, out, y * fw, fw)
                  src += 1; y += step
                }
              }
              out
            }
          // every index must address the palette (strict: corrupt data
          // filters rather than aliasing colors)
          val nPal = palette.length / 3
          var k = 0
          while (k < idx.length) {
            if ((idx(k) & 0xff) >= nPal) return null
            k += 1
          }
          return GifPixels(fw, fh, idx, palette, transparentIdx)
        case _ => return null
      }
    }
    null
  }

  /** GIF-flavored LZW (variable code width, LSB-first bit packing,
    * clear + EOI codes, 12-bit dictionary cap, KwKwK). Returns exactly
    * `npix` indices or null. */
  private def lzwDecode(data: Array[Byte], minCode: Int, npix: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var c = 0
    while (c < clear) { prefix(c) = -1; suffix(c) = c.toByte; c += 1 }
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    var prevCode = -1
    val out = new Array[Byte](npix)
    var op = 0
    var bitPos = 0
    val nBits = data.length * 8
    def readCode(width: Int): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val p = bitPos + k
        if (((data(p >> 3) >> (p & 7)) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }
    def firstChar(code: Int): Byte = {
      var cc = code
      while (prefix(cc) >= 0) cc = prefix(cc)
      suffix(cc)
    }
    while (op < npix) {
      val code = readCode(codeSize)
      if (code < 0 || code == eoi) return null // short of npix
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prevCode = -1
      } else if (prevCode < 0) {
        if (code >= clear) return null
        out(op) = suffix(code); op += 1
        prevCode = code
      } else {
        if (code > dictSize || code == clear || code == eoi) return null
        // expand (KwKwK: code == dictSize borrows prev + its first char)
        var sp = 0
        if (code == dictSize) { stack(sp) = firstChar(prevCode); sp += 1 }
        var cc = if (code == dictSize) prevCode else code
        while (cc >= 0) { stack(sp) = suffix(cc); sp += 1; cc = prefix(cc) }
        if (op + sp > npix) return null
        while (sp > 0) { sp -= 1; out(op) = stack(sp); op += 1 }
        if (dictSize < 4096) {
          prefix(dictSize) = prevCode
          suffix(dictSize) = firstChar(code)
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prevCode = code
      }
    }
    out
  }

  /** [[decodeGif]]'s exact integer core: palette-resolved Long channel
    * sums (255 units), alpha 0 for the GCE-transparent index. */
  def statsGif(b: Array[Byte]): PixelStats = {
    val px = decodeGifPixels(b)
    if (px == null) return null
    var sb = 0L; var sg = 0L; var sr = 0L; var sa = 0L
    var k = 0
    while (k < px.idx.length) {
      val pi = (px.idx(k) & 0xff) * 3
      sr += u8(px.palette, pi)
      sg += u8(px.palette, pi + 1)
      sb += u8(px.palette, pi + 2)
      sa += (if ((px.idx(k) & 0xff) == px.transparentIdx) 0L else 255L)
      k += 1
    }
    PixelStats(px.idx.length.toLong, 255, sb, sg, sr, sa)
  }

  /** GIF frame-0 features (same layout as [[decodePng]]): mean B, G, R,
    * Rec. 601 luma, pixel count, mean alpha. */
  def decodeGif(b: Array[Byte]): Array[Float] = {
    val st = statsGif(b)
    if (st == null) return null
    val n = st.nPixels.toDouble
    val mr = (st.sumR / 255.0 / n).toFloat
    val mg = (st.sumG / 255.0 / n).toFloat
    val mb = (st.sumB / 255.0 / n).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr
    f(3) = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    f(4) = n.toFloat
    f(5) = (st.sumA / 255.0 / n).toFloat
    f
  }

  /** Dispatch: real decoder where the format permits one, the
    * deterministic stub otherwise — the upgrade path a new codec drops
    * into. */
  def decodeAny(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return new Array[Float](DecodeStub.FeatureDim)
    if (isBmp24(payload)) {
      val f = decodeBmp24(payload)
      if (f != null) return f
    }
    if (isGif(payload)) {
      val f = decodeGif(payload)
      if (f != null) return f
    }
    if (isPng(payload)) {
      val f = decodePng(payload)
      if (f != null) return f
    }
    if (isJpeg(payload)) {
      val f = decodeJpeg(payload)
      if (f != null) return f
    }
    if (isPcm16(payload)) {
      val f = decodePcm16(payload)
      if (f != null) return f
    }
    DecodeStub.decodeStub(payload)
  }
}
