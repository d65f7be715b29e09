package graft.multimodal

import graft.FuzzUtil
import graft.plans.Wkb
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes passes over the pixel/audio decoders and metadata
  * parsers: random truncation at every small prefix, byte flips over
  * valid fixtures, garbage, header+garbage, and length-field extremes.
  * Contract under fuzz: filter-don't-fail — these are Catalyst
  * expression kernels (nullSafeEval), so they must return null (or the
  * stub features) on anything malformed and NEVER throw: an exception
  * here kills a 100 TB scan at row one. Allocation must stay bounded
  * (Codec.MaxPixels-style guards), so no case may OOM or hang. */
class MediaFuzzSpec extends AnyFunSuite {
  private val Cases = 1500
  private val Seed = 0x5EED15L

  // one valid fixture per format the decoders claim (SynthMedia ids
  // route bmp/png/wav/gif; JPEG baseline + progressive via ImageIO,
  // like CodecSpec's cross-validation fixtures)
  private def jpeg(progressive: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      13, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 9; x <- 0 until 13)
      img.setRGB(x, y, (x * 37 + y * 91) * 1715 & 0xffffff)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.8f)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def fixtures: Seq[Array[Byte]] =
    (0L to 3L).map(SynthMedia.forId(_)._2) ++
      Seq(jpeg(progressive = false), jpeg(progressive = true))

  test("Codec.decodeAny: 1500 adversarial cases per format never throw, never mis-shape") {
    FuzzUtil.fuzz("decodeAny", fixtures, Cases, Seed)(Codec.decodeAny)(
      accept = _ => false, // decodeAny falls back to the stub: total
      check = f => {
        assert(f.length === DecodeStub.FeatureDim)
        f.foreach(v => assert(!v.isNaN && !v.isInfinite,
          s"non-finite feature in ${f.mkString(",")}"))
      })
  }

  test("format-specific decoders: null-never-throw on adversarial bytes") {
    val decoders: Seq[(String, Array[Byte] => Array[Float])] = Seq(
      "decodeBmp24" -> Codec.decodeBmp24,
      "decodePng" -> Codec.decodePng,
      "decodeGif" -> Codec.decodeGif,
      "decodeJpeg" -> Codec.decodeJpeg,
      "decodePcm16" -> Codec.decodePcm16)
    for ((name, dec) <- decoders)
      FuzzUtil.fuzz(name, fixtures, Cases / 2, Seed ^ name.hashCode)(dec)(
        accept = _ => false,
        check = f => assert(f.length === DecodeStub.FeatureDim))
  }

  test("ImageMeta.parse: null-never-throw; any parsed dimensions are positive") {
    FuzzUtil.fuzz("ImageMeta", fixtures, Cases, Seed + 7)(ImageMeta.parse)(
      accept = _ => false,
      check = row => {
        assert(row.getInt(1) > 0 && row.getInt(2) > 0,
          s"non-positive parsed dimension: ${row.getInt(1)}x${row.getInt(2)}")
      })
  }

  test("AudioMeta.parse: null-never-throw; parsed channels/rate positive (WAV + MP3 header walks)") {
    // MP3 fixture: one ID3v2 tag + two V1L3 128kbps 44100 Hz frames of
    // silence — enough to drive the frame walk
    val mp3 = {
      val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 10) ++
        new Array[Byte](10)
      val frame = new Array[Byte](417)
      frame(0) = 0xFF.toByte; frame(1) = 0xFB.toByte
      frame(2) = 0x90.toByte; frame(3) = 0x00
      id3 ++ frame ++ frame
    }
    FuzzUtil.fuzz("AudioMeta", fixtures :+ mp3, Cases, Seed + 11)(
      AudioMeta.parse)(
      accept = _ => false,
      check = row => {
        assert(row.getInt(0) > 0, "non-positive channels")
        assert(row.getInt(1) > 0, "non-positive sample rate")
        assert(row.getLong(3) >= 0, "negative frame count")
      })
  }

  test("Wkb.toArrayData: null-never-throw on adversarial WKB") {
    // valid little-endian WKB: point, linestring, polygon(1 ring)
    def le(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def d(v: Double): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putDouble(v); b.array()
    }
    def i4(v: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(v); b.array()
    }
    val point = le(Array(1.toByte), i4(1), d(1.5), d(2.5))
    val line = le(Array(1.toByte), i4(2), i4(3),
      d(0), d(0), d(1), d(1), d(2), d(0))
    val poly = le(Array(1.toByte), i4(3), i4(1), i4(4),
      d(0), d(0), d(4), d(0), d(4), d(4), d(0), d(0))
    FuzzUtil.fuzz("Wkb", Seq(point, line, poly), Cases, Seed + 13)(
      Wkb.toArrayData)(accept = _ => false)
  }
}
