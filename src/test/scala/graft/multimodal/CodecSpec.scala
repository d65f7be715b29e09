package graft.multimodal

import graft.SparkSpec

class CodecSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal 24-bit BMP: 54-byte header + padded BGR rows, bottom-up. */
  private def bmp(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val h = pixels.length; val w = pixels.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val total = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    // bottom-up: last pixel row first
    for (y <- (h - 1) to 0 by -1) {
      val row = new Array[Byte](rowBytes)
      for (x <- 0 until w) {
        val (r, g, bl) = pixels(y)(x)
        row(x * 3) = bl.toByte; row(x * 3 + 1) = g.toByte; row(x * 3 + 2) = r.toByte
      }
      b.put(row)
    }
    b.array()
  }

  private def wav16(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes).putInt(dataLen)
    samples.foreach(b.putShort)
    b.array()
  }

  test("BMP decode: exact channel means from known pixels") {
    // 2x2: pure red, pure green / pure blue, white
    val img = bmp(Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((0, 0, 255), (255, 255, 255))))
    val f = Codec.decodeBmp24(img)
    assert(f != null)
    assert(math.abs(f(0) - 0.5f) < 1e-6, s"mean blue ${f(0)}")  // 2 of 4 pixels
    assert(math.abs(f(1) - 0.5f) < 1e-6, s"mean green ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"mean red ${f(2)}")
    assert(f(4) === 4.0f) // pixel count
    // truncated pixel array -> null, not garbage
    assert(Codec.decodeBmp24(java.util.Arrays.copyOf(img, 56)) === null)
  }

  test("PCM decode: RMS, zero-crossing rate, and peak of a square wave") {
    // alternating +A/-A: RMS = A, ZCR = 1, peak = A
    val a = (0.5 * 32767).toShort
    val samples = Array.tabulate(400)(i => if (i % 2 == 0) a else (-a).toShort)
    val f = Codec.decodePcm16(wav16(samples))
    assert(f != null)
    assert(math.abs(f(0) - 0.5f) < 1e-3, s"rms ${f(0)}")
    assert(math.abs(f(1) - 1.0f) < 1e-6, s"zcr ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-3, s"peak ${f(2)}")
    assert(f(3) === 400.0f)
    // silence: all zeros
    val silent = Codec.decodePcm16(wav16(new Array[Short](100)))
    assert(silent(0) === 0.0f && silent(2) === 0.0f)
  }

  /** Hand-built PNG encoder for fixtures: picks the given filter for every
    * scanline, so each of the five predictors is exercised explicitly
    * (ImageIO chooses its own filters, so it can't pin them). */
  private def png(w: Int, h: Int, colorType: Int, depth: Int,
                  raw: Array[Byte], filter: Int,
                  palette: Array[Byte] = null,
                  trns: Array[Byte] = null): Array[Byte] = {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    val bpp = math.max(1, channels * depth / 8)
    val stride = (w * channels * depth + 7) / 8
    val filtered = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      filtered(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val cur = raw(y * stride + x) & 0xff
        val a = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) raw((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new Array[Byte](filtered.length * 2 + 64)
    var zlen = 0
    while (!defl.finished()) zlen += defl.deflate(zbuf, zlen, zbuf.length - zlen)
    defl.end()
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(out.array(), 4, 4 + data.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++
      (if (palette != null) chunk("PLTE", palette) else Array.empty[Byte]) ++
      (if (trns != null) chunk("tRNS", trns) else Array.empty[Byte]) ++
      chunk("IDAT", java.util.Arrays.copyOf(zbuf, zlen)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("PNG decode: every filter type reconstructs the same known image") {
    // 4x2 RGB8 with varied values so Sub/Up/Average/Paeth deltas differ
    val raw = Array.tabulate(2, 4 * 3)((y, i) => ((y * 37 + i * 29) % 256).toByte)
      .flatten
    val expect = {
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      for (y <- 0 until 2; x <- 0 until 4) {
        sr += (raw(y * 12 + x * 3) & 0xff) / 255.0
        sg += (raw(y * 12 + x * 3 + 1) & 0xff) / 255.0
        sb += (raw(y * 12 + x * 3 + 2) & 0xff) / 255.0
      }
      (sb / 8, sg / 8, sr / 8)
    }
    for (filter <- 0 to 4) {
      val f = Codec.decodePng(png(4, 2, 2, 8, raw, filter))
      assert(f != null, s"filter $filter decode failed")
      assert(math.abs(f(0) - expect._1) < 1e-6, s"filter $filter blue ${f(0)}")
      assert(math.abs(f(1) - expect._2) < 1e-6, s"filter $filter green ${f(1)}")
      assert(math.abs(f(2) - expect._3) < 1e-6, s"filter $filter red ${f(2)}")
      assert(f(4) === 8.0f)
      assert(f(5) === 1.0f) // opaque color type
    }
  }

  test("PNG decode: cross-validated against the JDK's independent encoder") {
    // ImageIO writes its own PNG (its own filter/compression choices);
    // our decoder must recover the exact channel means.
    val w = 13; val h = 7
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sa = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 19 + y * 3) % 256; val g = (x * 7 + y * 31) % 256
      val b = (x * 11 + y * 13) % 256; val a = 255 - ((x + y) * 9) % 128
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
      sr += r / 255.0; sg += g / 255.0; sb += b / 255.0; sa += a / 255.0
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val f = Codec.decodePng(bos.toByteArray)
    assert(f != null, "JDK-encoded PNG did not decode")
    val n = w * h
    assert(math.abs(f(0) - sb / n) < 1e-6, s"blue ${f(0)} vs ${sb / n}")
    assert(math.abs(f(1) - sg / n) < 1e-6)
    assert(math.abs(f(2) - sr / n) < 1e-6)
    assert(math.abs(f(5) - sa / n) < 1e-6, s"alpha ${f(5)} vs ${sa / n}")
    assert(f(4) === n.toFloat)
    // grayscale via an independent JDK path too
    val gray = new java.awt.image.BufferedImage(5, 5, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 5; x <- 0 until 5) {
      val v = (x * 40 + y * 10) % 256
      gray.getRaster.setSample(x, y, 0, v)
    }
    val gos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", gos))
    val gf = Codec.decodePng(gos.toByteArray)
    assert(gf != null)
    var gsum = 0.0
    for (y <- 0 until 5; x <- 0 until 5) gsum += gray.getRaster.getSample(x, y, 0) / 255.0
    assert(math.abs(gf(3) - gsum / 25) < 1e-6, s"gray luma ${gf(3)}") // r=g=b → luma = gray mean
  }

  test("PNG decode: palette, sub-byte depths, and 16-bit samples") {
    // color type 3, depth 2: four palette entries, 5px wide (packed, padded)
    val palette = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,   0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    // indices row0: 0,1,2,3,0  row1: 3,3,3,3,3  — packed 2-bit MSB-first
    val row0 = Array(((0 << 6) | (1 << 4) | (2 << 2) | 3).toByte, (0 << 6).toByte)
    val row1 = Array(((3 << 6) | (3 << 4) | (3 << 2) | 3).toByte, (3 << 6).toByte)
    val pf = Codec.decodePng(png(5, 2, 3, 2, row0 ++ row1, 0, palette))
    assert(pf != null)
    // reds: idx0 ×2, idx3 ×6 → (2*1.0 + 6*1.0)/10 = 0.8; greens: idx1 + idx3×6 = 0.7
    assert(math.abs(pf(2) - 0.8f) < 1e-6, s"palette red ${pf(2)}")
    assert(math.abs(pf(1) - 0.7f) < 1e-6, s"palette green ${pf(1)}")
    // palette tRNS: idx0 fully transparent, idx1 half, others opaque
    // -> mean alpha over 10px (idx0 x2 at 0, idx1 x1 at 128/255, 7 at 1)
    val pt = Codec.decodePng(png(5, 2, 3, 2, row0 ++ row1, 0, palette,
      trns = Array(0, 128).map(_.toByte)))
    assert(pt != null)
    val expAlpha = (2 * 0.0 + 1 * (128 / 255.0) + 7 * 1.0) / 10
    assert(math.abs(pt(5) - expAlpha) < 1e-6, s"palette tRNS alpha ${pt(5)}")
    // gray tRNS color key: value 0 transparent in an 8x1 checkerboard
    val gk = Codec.decodePng(png(8, 1, 0, 1, Array(0xAA.toByte), 0,
      trns = Array(0, 0).map(_.toByte)))
    assert(gk != null && math.abs(gk(5) - 0.5f) < 1e-6, s"gray color-key alpha ${gk(5)}")
    // gray depth 1: checkerboard 8x1 → mean 0.5
    val g1 = Codec.decodePng(png(8, 1, 0, 1, Array(0xAA.toByte), 0))
    assert(g1 != null && math.abs(g1(3) - 0.5f) < 1e-6, s"1-bit gray ${g1(3)}")
    // gray 16-bit: two samples 0x0000 and 0xFFFF → mean 0.5
    val g16 = Codec.decodePng(png(2, 1, 0, 16,
      Array(0x00, 0x00, 0xFF, 0xFF).map(_.toByte), 1))
    assert(g16 != null && math.abs(g16(3) - 0.5f) < 1e-6, s"16-bit gray ${g16(3)}")
  }

  test("PNG decode: Adam7 interlaced, cross-validated via ImageIO progressive mode") {
    // 11x5 (odd dims exercise the empty/partial Adam7 passes) RGB
    val w = 11; val h = 5
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 23 + y * 5) % 256; val g = (x * 3 + y * 41) % 256
      val b = (x * 17 + y * 29) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      sr += r / 255.0; sg += g / 255.0; sb += b / 255.0
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT) // Adam7
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    assert((bytes(8 + 8 + 12) & 0xff) === 1, "fixture must actually be interlaced")
    val f = Codec.decodePng(bytes)
    assert(f != null, "Adam7 PNG did not decode")
    val n = w * h
    assert(math.abs(f(0) - sb / n) < 1e-6, s"blue ${f(0)} vs ${sb / n}")
    assert(math.abs(f(1) - sg / n) < 1e-6)
    assert(math.abs(f(2) - sr / n) < 1e-6)
    assert(f(4) === n.toFloat)
  }

  test("PNG decode: malformed inputs filter, never crash") {
    val raw = Array.tabulate(12)(i => (i * 20).toByte)
    val good = png(2, 2, 2, 8, raw, 4)
    assert(Codec.decodePng(good) != null)
    // corrupt a CRC byte -> null
    val badCrc = good.clone(); badCrc(good.length - 1) = (badCrc(good.length - 1) ^ 0x5a).toByte
    assert(Codec.decodePng(badCrc) === null)
    // truncated IDAT -> null
    assert(Codec.decodePng(java.util.Arrays.copyOf(good, good.length - 20)) === null)
    // interlace flag flipped WITHOUT re-segmenting the scanlines: the
    // Adam7 layout needs more bytes than the sequential one -> null
    val inter = good.clone(); inter(8 + 8 + 12) = 1
    // fix the IHDR CRC after flipping the interlace byte
    val crc = new java.util.zip.CRC32(); crc.update(inter, 12, 17)
    val cb = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
    System.arraycopy(cb, 0, inter, 12 + 17, 4)
    assert(Codec.decodePng(inter) === null)
    // dispatch integration: a real PNG routes through decodePng
    assert(Codec.decodeAny(good).toSeq == Codec.decodePng(good).toSeq)
  }

  /** Encode a BufferedImage as JPEG via ImageIO (independent encoder). */
  private def jpegBytes(img: java.awt.image.BufferedImage, quality: Float,
                        progressive: Boolean = false): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    if (progressive)
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Channel means (b, g, r) of ImageIO's OWN decode of the same bytes —
    * the independent reference for the lossy formats. */
  private def imageioMeans(bytes: Array[Byte]): (Double, Double, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += ((rgb >> 16) & 0xff) / 255.0
      sg += ((rgb >> 8) & 0xff) / 255.0
      sb += (rgb & 0xff) / 255.0
    }
    val n = img.getWidth.toDouble * img.getHeight
    (sb / n, sg / n, sr / n)
  }

  test("JPEG decode: cross-validated against the JDK's independent codec") {
    // odd dims exercise partial edge MCUs; gradient content exercises AC
    // coefficients at every frequency. ImageIO's decoder is libjpeg-style
    // fixed-point; ours is double-precision T.81 — means agree to ~1 LSB.
    val w = 37; val h = 23
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 19 + y * 3) % 256; val g = (x * 7 + y * 31) % 256
      val b = (x * 11 + y * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    for (q <- Seq(0.95f, 0.7f, 0.4f)) { // high q ~4:4:4, lower exercises subsampled paths
      val bytes = jpegBytes(img, q)
      val f = Codec.decodeJpeg(bytes)
      assert(f != null, s"quality $q JPEG did not decode")
      val (eb, eg, er) = imageioMeans(bytes)
      assert(math.abs(f(0) - eb) < 0.01, s"q=$q blue ${f(0)} vs $eb")
      assert(math.abs(f(1) - eg) < 0.01, s"q=$q green ${f(1)} vs $eg")
      assert(math.abs(f(2) - er) < 0.01, s"q=$q red ${f(2)} vs $er")
      assert(f(4) === (w * h).toFloat)
      assert(f(5) === 1.0f)
    }
    // grayscale single-component scan
    val gray = new java.awt.image.BufferedImage(21, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 21)
      gray.getRaster.setSample(x, y, 0, (x * 12 + y * 25) % 256)
    val gbytes = jpegBytes(gray, 0.8f)
    val gf = Codec.decodeJpeg(gbytes)
    assert(gf != null, "grayscale JPEG did not decode")
    // compare raw raster samples (getRGB would gamma-convert gray->sRGB)
    val gref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gbytes))
    var gsum = 0.0
    for (y <- 0 until 9; x <- 0 until 21)
      gsum += gref.getRaster.getSample(x, y, 0) / 255.0
    val gmean = gsum / (21 * 9)
    assert(math.abs(gf(3) - gmean) < 0.01, s"gray luma ${gf(3)} vs $gmean")
  }

  /** Hand-built baseline JPEG: grayscale, flat 8x8 blocks (DC-only, unit
    * quant), std Annex K Huffman DC table, optional restart interval.
    * Flat blocks decode EXACTLY (DC-only IDCT is the constant
    * (V-128)+128), so expected means are exact, and DRI=1 forces a
    * restart marker between every MCU — the path ImageIO never emits. */
  private def jpegDcOnly(blockVals: Seq[Int], restart: Boolean,
                         sofHV: Int = 0x11): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int*): Unit = b.foreach(out.write)
    m(0xff, 0xd8) // SOI
    m(0xff, 0xdb, 0, 67, 0); (0 until 64).foreach(_ => out.write(1)) // DQT id0, all 1s
    val w = blockVals.size * 8
    m(0xff, 0xc0, 0, 11, 8, 0, 8, (w >> 8) & 0xff, w & 0xff, 1, 1, sofHV, 0) // SOF0 gray
    // DC table 0: Annex K luminance (bits then 12 symbols)
    val dcBits = Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    m(0xff, 0xc4, 0, (19 + 12) & 0xff, 0x00); dcBits.foreach(out.write); (0 to 11).foreach(out.write)
    // AC table 0: a minimal 1-entry table — symbol 0x00 (EOB) as code "0"
    m(0xff, 0xc4, 0, 20, 0x10); m(1); (1 until 16).foreach(_ => out.write(0)); m(0x00)
    if (restart) m(0xff, 0xdd, 0, 4, 0, 1) // DRI = 1 MCU
    m(0xff, 0xda, 0, 8, 1, 1, 0x00, 0, 63, 0) // SOS: comp 1, DC0/AC0
    // Annex K DC codes: cat0="00"; cat1.."5" are "010".."110"; 6+ add 1s
    def dcCode(cat: Int): (Int, Int) =
      if (cat == 0) (0, 2)
      else if (cat <= 5) (1 + cat, 3) // 010,011,100,101,110
      else ((1 << (cat - 2)) - 2, cat - 2) // 1110, 11110, 111110, ...
    var acc = 0L; var nb = 0
    def putBits(v: Int, n: Int): Unit = { acc = (acc << n) | (v & ((1L << n) - 1)); nb += n
      while (nb >= 8) { val byte = ((acc >> (nb - 8)) & 0xff).toInt; out.write(byte)
        if (byte == 0xff) out.write(0x00); nb -= 8 } }
    def flushAlign(): Unit = if (nb > 0) putBits((1 << (8 - nb)) - 1, 8 - nb)
    var pred = 0
    for ((v, idx) <- blockVals.zipWithIndex) {
      if (restart && idx > 0) {
        flushAlign(); m(0xff, 0xd0 + ((idx - 1) & 7)); pred = 0
      }
      val dc = 8 * (v - 128)
      val diff = dc - pred; pred = dc
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCode(cat)
      putBits(code, len)
      if (cat > 0) putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      putBits(0, 1) // EOB ("0" in the minimal AC table)
    }
    flushAlign()
    m(0xff, 0xd9) // EOI
    out.toByteArray
  }

  test("JPEG decode: hand-built DC-only fixture, exact means, restart markers") {
    for (restart <- Seq(false, true)) {
      val vals = Seq(96, 192, 48)
      val f = Codec.decodeJpeg(jpegDcOnly(vals, restart))
      assert(f != null, s"restart=$restart fixture did not decode")
      val exp = vals.map(_ / 255.0).sum / vals.size
      assert(math.abs(f(3) - exp) < 1e-6, s"restart=$restart luma ${f(3)} vs $exp")
      assert(f(4) === (vals.size * 64).toFloat)
    }
  }

  /** Hand-built subsampled COLOR JPEG: one MCU, flat DC-only blocks,
    * neutral chroma (Cb=Cr=128 -> R=G=B=Y exactly), so the expected
    * means are exact and the Y-block -> pixel placement + chroma
    * upsampling indexing is pinned for a chosen sampling factor. */
  private def jpegColorSub(hSamp: Int, vSamp: Int, yVals: Seq[Int]): Array[Byte] = {
    require(yVals.size == hSamp * vSamp)
    val out = new java.io.ByteArrayOutputStream()
    def m(b: Int*): Unit = b.foreach(out.write)
    val w = hSamp * 8; val h = vSamp * 8
    m(0xff, 0xd8)
    m(0xff, 0xdb, 0, 67, 0); (0 until 64).foreach(_ => out.write(1))
    m(0xff, 0xc0, 0, 17, 8, 0, h, 0, w, 3,
      1, (hSamp << 4) | vSamp, 0,  2, 0x11, 0,  3, 0x11, 0)
    val dcBits = Seq(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    m(0xff, 0xc4, 0, 31, 0x00); dcBits.foreach(out.write); (0 to 11).foreach(out.write)
    m(0xff, 0xc4, 0, 20, 0x10); m(1); (1 until 16).foreach(_ => out.write(0)); m(0x00)
    m(0xff, 0xda, 0, 12, 3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)
    var acc = 0L; var nb = 0
    def putBits(v: Int, n: Int): Unit = { acc = (acc << n) | (v & ((1L << n) - 1)); nb += n
      while (nb >= 8) { val byte = ((acc >> (nb - 8)) & 0xff).toInt; out.write(byte)
        if (byte == 0xff) out.write(0x00); nb -= 8 } }
    def dcCode(cat: Int): (Int, Int) =
      if (cat == 0) (0, 2) else if (cat <= 5) (1 + cat, 3)
      else ((1 << (cat - 2)) - 2, cat - 2)
    def putBlock(dc: Int, pred: Int): Int = {
      val diff = dc - pred
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCode(cat)
      putBits(code, len)
      if (cat > 0) putBits(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
      putBits(0, 1) // EOB
      dc
    }
    var predY = 0
    for (v <- yVals) predY = putBlock(8 * (v - 128), predY)
    putBlock(0, 0) // Cb = 128 exactly
    putBlock(0, 0) // Cr = 128 exactly
    if (nb > 0) putBits((1 << (8 - nb)) - 1, 8 - nb)
    m(0xff, 0xd9)
    out.toByteArray
  }

  test("JPEG decode: 4:2:2 and 4:2:0 chroma subsampling, exact means") {
    // 4:2:2 — two Y blocks side by side; neutral chroma keeps RGB == Y
    val f422 = Codec.decodeJpeg(jpegColorSub(2, 1, Seq(64, 192)))
    assert(f422 != null, "4:2:2 fixture did not decode")
    val exp422 = (64 + 192) / 2.0 / 255.0
    assert(math.abs(f422(3) - exp422) < 1e-6, s"4:2:2 luma ${f422(3)} vs $exp422")
    assert(math.abs(f422(0) - exp422) < 1e-6 && math.abs(f422(2) - exp422) < 1e-6)
    assert(f422(4) === 128.0f)
    // 4:2:0 — 2x2 Y blocks, one chroma pair for all four
    val f420 = Codec.decodeJpeg(jpegColorSub(2, 2, Seq(32, 96, 160, 224)))
    assert(f420 != null, "4:2:0 fixture did not decode")
    val exp420 = (32 + 96 + 160 + 224) / 4.0 / 255.0
    assert(math.abs(f420(3) - exp420) < 1e-6, s"4:2:0 luma ${f420(3)} vs $exp420")
    assert(f420(4) === 256.0f)
    // 4:4:4 — degenerate case through the same color path
    val f444 = Codec.decodeJpeg(jpegColorSub(1, 1, Seq(100)))
    assert(f444 != null && math.abs(f444(3) - 100 / 255.0) < 1e-6)
  }

  test("progressive JPEG decode: spectral selection + successive approximation vs ImageIO") {
    // same harness as the baseline cross-validation: odd dims (partial
    // edge MCUs), full-spectrum gradient content, three qualities
    // (4:4:4 down through subsampled chroma). ImageIO writes multi-scan
    // SOF2 with successive approximation — the full Annex G surface.
    val w = 37; val h = 23
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 19 + y * 3) % 256; val g = (x * 7 + y * 31) % 256
      val b = (x * 11 + y * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    for (q <- Seq(0.95f, 0.7f, 0.4f)) {
      val bytes = jpegBytes(img, q, progressive = true)
      // the fixture must actually be progressive: SOF2 marker present
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "fixture must be SOF2")
      val f = Codec.decodeJpeg(bytes)
      assert(f != null, s"quality $q progressive JPEG did not decode")
      val (eb, eg, er) = imageioMeans(bytes)
      assert(math.abs(f(0) - eb) < 0.01, s"q=$q blue ${f(0)} vs $eb")
      assert(math.abs(f(1) - eg) < 0.01, s"q=$q green ${f(1)} vs $eg")
      assert(math.abs(f(2) - er) < 0.01, s"q=$q red ${f(2)} vs $er")
      assert(f(4) === (w * h).toFloat)
      assert(f(5) === 1.0f)
    }
    // grayscale progressive: single-component scans, no interleave
    val gray = new java.awt.image.BufferedImage(21, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 21)
      gray.getRaster.setSample(x, y, 0, (x * 12 + y * 25) % 256)
    val gbytes = jpegBytes(gray, 0.8f, progressive = true)
    val gf = Codec.decodeJpeg(gbytes)
    assert(gf != null, "grayscale progressive JPEG did not decode")
    val gref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gbytes))
    var gsum = 0.0
    for (y <- 0 until 9; x <- 0 until 21)
      gsum += gref.getRaster.getSample(x, y, 0) / 255.0
    assert(math.abs(gf(3) - gsum / (21 * 9)) < 0.01, s"gray luma ${gf(3)}")
  }

  test("JPEG decode: non-baseline and malformed inputs filter, never crash") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, (x * 16) << 8 | y * 16)
    // progressive (SOF2) decodes for real since R11 — dispatch routes it
    val prog = jpegBytes(img, 0.8f, progressive = true)
    assert(Codec.decodeJpeg(prog) != null, "progressive must decode")
    assert(Codec.decodeAny(prog).toSeq == Codec.decodeJpeg(prog).toSeq)
    // truncated progressive entropy stream -> null, never a crash
    assert(Codec.decodeJpeg(java.util.Arrays.copyOf(prog, prog.length / 2)) === null)
    // truncated entropy stream -> null
    val good = jpegBytes(img, 0.8f)
    assert(Codec.decodeJpeg(good) != null)
    assert(Codec.decodeJpeg(java.util.Arrays.copyOf(good, good.length / 2)) === null)
    // garbage after SOI -> null
    val junk = Array[Byte](0xff.toByte, 0xd8.toByte) ++ Array.fill(64)(0x55.toByte)
    assert(Codec.decodeJpeg(junk) === null)
    // dispatch integration: a real JPEG routes through decodeJpeg
    assert(Codec.decodeAny(good).toSeq == Codec.decodeJpeg(good).toSeq)
  }

  test("adversarial payloads filter, never crash/hang/OOM (review regressions)") {
    // BMP: width crafted so w*3 wraps Int and would defeat the bounds
    // check — must null, not AIOOBE
    val bomb = bmp(Array(Array((1, 2, 3)))).clone()
    val wb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(0x55555557).array()
    System.arraycopy(wb, 0, bomb, 18, 4)
    assert(Codec.decodeBmp24(bomb) === null)
    // BMP alpha slot: opaque like PNG/JPEG, not 0
    assert(Codec.decodeBmp24(bmp(Array(Array((1, 2, 3)))))(5) === 1.0f)

    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(out.array(), 4, 4 + data.length)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def ihdr(w: Int, h: Int): Array[Byte] = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    // PNG: zlib FDICT header (0x78 0x20, checksum-valid) — Inflater
    // waits for a preset dictionary forever unless detected: must null
    val fdict = sig ++ chunk("IHDR", ihdr(1, 1)) ++
      chunk("IDAT", Array(0x78, 0x20, 0, 0, 0, 1, 0).map(_.toByte)) ++
      chunk("IEND", Array.empty[Byte])
    assert(Codec.decodePng(fdict) === null)
    // PNG: 400 Mpx header on a 100-byte payload — must null BEFORE
    // allocating, not OOM the executor
    val huge = sig ++ chunk("IHDR", ihdr(20000, 20000)) ++
      chunk("IDAT", Array[Byte](0)) ++ chunk("IEND", Array.empty[Byte])
    assert(Codec.decodePng(huge) === null)

    // RIFF: ~2 GB declared chunk size wraps the Int chunk advance —
    // must walk off cleanly (stub fallback), not AIOOBE
    val riff = java.nio.ByteBuffer.allocate(28)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes).putInt(20).put("WAVE".getBytes)
    riff.put("JUNK".getBytes).putInt(0x7ffffff8)
    val rb = riff.array()
    assert(Codec.decodeAny(rb).toSeq == DecodeStub.decodeStub(rb).toSeq)

    // JPEG: grayscale SOF declaring 2x2 sampling — a one-component scan
    // is NON-interleaved per T.81 A.2.3, so it must decode identically
    // to the 1x1 declaration (blocks in raster order), restarts included
    for (restart <- Seq(false, true)) {
      val ref = Codec.decodeJpeg(jpegDcOnly(Seq(96, 192, 48), restart))
      val got = Codec.decodeJpeg(jpegDcOnly(Seq(96, 192, 48), restart, sofHV = 0x22))
      assert(got != null, s"restart=$restart 2x2-gray did not decode")
      assert(got.toSeq == ref.toSeq, s"restart=$restart sampling changed the result")
    }

    // null payload: zero feature vector, not an NPE
    assert(Codec.decodeAny(null).toSeq ==
      new Array[Float](DecodeStub.FeatureDim).toSeq)
  }

  test("fuzz: decodeAny never throws — arbitrary bytes, magic-prefixed tails, bit flips") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val magics = Seq[Array[Byte]](
      Array(0xff, 0xd8).map(_.toByte),                                   // JPEG SOI
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), // PNG
      Array('B', 'M').map(_.toByte),                                     // BMP
      "RIFF".getBytes ++ Array[Byte](44, 0, 0, 0) ++ "WAVE".getBytes)    // WAV
    val valid = Seq(
      jpegDcOnly(Seq(96, 192), restart = true),
      jpegColorSub(2, 2, Seq(32, 96, 160, 224)),
      png(4, 2, 2, 8, Array.tabulate(24)(i => (i * 29).toByte), 4),
      bmp(Array(Array((1, 2, 3), (4, 5, 6)))),
      wav16(Array.tabulate(40)(i => (i * 991).toShort)))
    val gen: Gen[Array[Byte]] = Gen.oneOf(
      // pure noise
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
      // valid magic + noise tail (reaches deep into each parser)
      for {
        m <- Gen.oneOf(magics)
        t <- Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
      } yield m ++ t,
      // valid fixture with one random byte corrupted (syntax-adjacent)
      for {
        v <- Gen.oneOf(valid)
        i <- Gen.choose(0, v.length - 1)
        b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
      } yield { val c = v.clone(); c(i) = b; c },
      // valid fixture truncated at a random point
      for {
        v <- Gen.oneOf(valid)
        n <- Gen.choose(0, v.length - 1)
      } yield java.util.Arrays.copyOf(v, n))
    val prop = Prop.forAll(gen) { bytes =>
      val f = Codec.decodeAny(bytes) // must return, never throw
      f != null && f.length == DecodeStub.FeatureDim
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("decodeFeatures dispatches: real BMP/PCM decode, stub for the rest") {
    val img = bmp(Array(Array((255, 0, 0))))
    val aud = wav16(Array.tabulate(50)(i => if (i % 2 == 0) 16384 else -16384)
      .map(_.toShort))
    val other = "opaque compressed payload".getBytes
    val rows = Seq(
      DecodeStub.MediaRow(1L, "image", img),
      DecodeStub.MediaRow(2L, "audio", aud),
      DecodeStub.MediaRow(3L, "video", other)).toDS()
    val out = DecodeStub.decodeFeatures(rows).collect()
      .map(r => r.media_id -> r.feature).toMap
    assert(out(1L)(2) === 1.0f)                       // real red mean
    assert(math.abs(out(2L)(1) - 1.0f) < 1e-6)        // real ZCR
    assert(out(3L) === DecodeStub.decodeStub(other))  // stub fallback
    // deterministic across runs
    val again = DecodeStub.decodeFeatures(rows).collect()
      .map(r => r.media_id -> r.feature).toMap
    assert(out.keys.forall(k => out(k).toSeq == again(k).toSeq))
  }
}
