package graft.multimodal

/** REAL decoders for the formats that need no codec library —
  * uncompressed 24-bit BMP (raw BGR pixel array, public layout),
  * 16-bit PCM WAV (raw little-endian samples, layout from
  * [[AudioMeta]]), and PNG pixels (zlib via `java.util.zip.Inflater` +
  * the five W3C filter predictors). Together with the header parsers
  * they upgrade the multimodal story from "all decode stubbed" to
  * "stub only where an actual patented/complex compressed codec
  * (JPEG pixels, MP3 frames) would be required".
  *
  * Each decoder returns the [[DecodeStub.FeatureDim]]-wide feature
  * vector a training-data filter consumes (channel means / energy
  * statistics), deterministically: same bytes, same floats, any JVM —
  * the arithmetic is plain float accumulation in byte order.
  */
object Codec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
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
    if (!isBmp24(b)) return null
    val off = le32(b, 10).toInt
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0) return null
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowBytes.toLong * h > b.length) return null
    var sb = 0.0; var sg = 0.0; var sr = 0.0
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
    val n = w.toDouble * h
    val mb = (sb / n / 255.0).toFloat
    val mg = (sg / n / 255.0).toFloat
    val mr = (sr / n / 255.0).toFloat
    val luma = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr; f(3) = luma; f(4) = n.toFloat
    f
  }

  /** True iff the payload is a 16-bit PCM WAV [[decodePcm16]] handles. */
  def isPcm16(b: Array[Byte]): Boolean = {
    val m = AudioMeta.parse(b)
    m != null && m.getInt(2) == 16
  }

  /** RMS energy (0-1), zero-crossing rate (fraction of successive
    * same-channel sample pairs changing sign), peak amplitude (0-1),
    * frame count — over the interleaved 16-bit little-endian samples of
    * the `data` chunk. */
  def decodePcm16(b: Array[Byte]): Array[Float] = {
    val meta = AudioMeta.parse(b)
    if (meta == null || meta.getInt(2) != 16) return null
    val channels = meta.getInt(0)
    val frames = meta.getLong(3)
    // find the data chunk body again (cheap: header walk is tiny)
    var i = 12
    var body = -1
    while (body < 0 && i + 8 <= b.length) {
      val size = le32(b, i + 4).toInt
      if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a')
        body = i + 8
      else i += 8 + size + (size & 1)
    }
    if (body < 0) return null
    // frames = dataBytes / fmt.blockAlign: a malformed WAV declaring
    // block < channels*2 inflates the frame count past the actual
    // sample bytes — reading it would run off the buffer and crash the
    // task. Filter-don't-fail: reject anything whose implied sample
    // range doesn't fit in the bytes present after the data header.
    val nSamples = (frames * channels).toInt
    if (nSamples < 0 || frames * channels * 2 > (b.length - body).toLong) return null
    var sumSq = 0.0; var peak = 0.0; var crossings = 0L
    val prev = new Array[Int](channels)
    var s = 0
    while (s < nSamples) {
      val v = le16(b, body + s * 2).toShort.toInt
      val a = math.abs(v / 32768.0)
      sumSq += (v / 32768.0) * (v / 32768.0)
      if (a > peak) peak = a
      val ch = s % channels
      if (s >= channels && (v < 0) != (prev(ch) < 0)) crossings += 1
      prev(ch) = v
      s += 1
    }
    val f = new Array[Float](DecodeStub.FeatureDim)
    if (nSamples > 0) {
      f(0) = math.sqrt(sumSq / nSamples).toFloat
      f(1) = (crossings.toDouble / math.max(1, nSamples - channels)).toFloat
      f(2) = peak.toFloat
      f(3) = frames.toFloat
    }
    f
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
    if (raw > Int.MaxValue - 8 || w.toLong * h > Int.MaxValue) return null
    // --- inflate the full filtered image
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val img = new Array[Byte](raw.toInt)
    var got = 0
    try {
      while (got < img.length && !inf.finished()) {
        val n = inf.inflate(img, got, img.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got < img.length) return null
    // --- per sub-image: unfilter in place, then accumulate channel sums
    val bpp = math.max(1, bitsPerPixel / 8)
    val maxVal = (1 << math.min(depth, 16)) - 1
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sa = 0.0
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
              val g = v.toDouble / maxVal
              sr += g; sg += g; sb += g
              // tRNS on gray: a 2-byte color key marks the transparent value
              sa += (if (trns != null && trns.length >= 2 &&
                  v == ((u8(trns, 0) << 8) | u8(trns, 1))) 0.0 else 1.0)
            case 2 =>
              val r = samp(y, x * 3); val g = samp(y, x * 3 + 1); val b2 = samp(y, x * 3 + 2)
              sr += r.toDouble / maxVal
              sg += g.toDouble / maxVal
              sb += b2.toDouble / maxVal
              // tRNS on RGB: a 3x2-byte color key
              sa += (if (trns != null && trns.length >= 6 &&
                  r == ((u8(trns, 0) << 8) | u8(trns, 1)) &&
                  g == ((u8(trns, 2) << 8) | u8(trns, 3)) &&
                  b2 == ((u8(trns, 4) << 8) | u8(trns, 5))) 0.0 else 1.0)
            case 3 =>
              val idxP = samp(y, x)
              val pi = idxP * 3
              if (pi + 2 >= plte.length) return null
              sr += u8(plte, pi) / 255.0
              sg += u8(plte, pi + 1) / 255.0
              sb += u8(plte, pi + 2) / 255.0
              // tRNS on palette: per-entry alpha, entries past it opaque
              sa += (if (trns != null && idxP < trns.length) u8(trns, idxP) / 255.0
                     else 1.0)
            case 4 =>
              val g = samp(y, x * 2).toDouble / maxVal
              sr += g; sg += g; sb += g
              sa += samp(y, x * 2 + 1).toDouble / maxVal
            case 6 =>
              sr += samp(y, x * 4).toDouble / maxVal
              sg += samp(y, x * 4 + 1).toDouble / maxVal
              sb += samp(y, x * 4 + 2).toDouble / maxVal
              sa += samp(y, x * 4 + 3).toDouble / maxVal
          }
          x += 1
        }
        y += 1
      }
      segOff += (stride + 1) * hp
    }
    val n = w.toDouble * h
    val mr = (sr / n).toFloat; val mg = (sg / n).toFloat; val mb = (sb / n).toFloat
    val f = new Array[Float](DecodeStub.FeatureDim)
    f(0) = mb; f(1) = mg; f(2) = mr
    f(3) = (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat
    f(4) = n.toFloat
    f(5) = (sa / n).toFloat
    f
  }

  /** Dispatch: real decoder where the format permits one, the
    * deterministic stub otherwise — the upgrade path a new codec drops
    * into. */
  def decodeAny(payload: Array[Byte]): Array[Float] = {
    if (isBmp24(payload)) {
      val f = decodeBmp24(payload)
      if (f != null) return f
    }
    if (isPng(payload)) {
      val f = decodePng(payload)
      if (f != null) return f
    }
    if (isPcm16(payload)) {
      val f = decodePcm16(payload)
      if (f != null) return f
    }
    DecodeStub.decodeStub(payload)
  }
}
