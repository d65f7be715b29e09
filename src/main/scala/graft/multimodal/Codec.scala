package graft.multimodal

/** REAL decoders for the container formats that need no codec library —
  * uncompressed 24-bit BMP (raw BGR pixel array, public layout) and
  * 16-bit PCM WAV (raw little-endian samples, layout from
  * [[AudioMeta]]). Together with the header parsers they upgrade the
  * multimodal story from "all decode stubbed" to "stub only where an
  * actual compressed codec (JPEG/PNG pixels, MP3) would be required".
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

  /** Dispatch: real decoder where the format permits one, the
    * deterministic stub otherwise — the upgrade path a new codec drops
    * into. */
  def decodeAny(payload: Array[Byte]): Array[Float] = {
    if (isBmp24(payload)) {
      val f = decodeBmp24(payload)
      if (f != null) return f
    }
    if (isPcm16(payload)) {
      val f = decodePcm16(payload)
      if (f != null) return f
    }
    DecodeStub.decodeStub(payload)
  }
}
