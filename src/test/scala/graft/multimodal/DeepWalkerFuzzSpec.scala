package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** TARGETED fuzz for the two deepest binary walkers — beyond
  * MediaFuzzSpec's whole-payload mutations (truncate/flip/garbage land
  * mostly in framing code): here the mutations are aimed at the regions
  * that drive the deep decode paths.
  *
  *  - ProgressiveJpeg: bytes mutated ONLY inside SOF2/DHT/SOS segment
  *    payloads and the entropy-coded scan data of a valid progressive
  *    fixture, so every case reaches the multi-scan coefficient
  *    accumulation (spectral selection bounds, successive-approximation
  *    shifts, Huffman tables, EOB runs) instead of dying at the SOI
  *    check. Plus crafted SOS parameter extremes (Ss/Se/Ah/Al corners).
  *  - MP3 frame-header walk: the EXHAUSTIVE 4096-combination sweep of
  *    the header fields that size a frame (version x layer x bitrate
  *    index x sample-rate index x padding) followed by pseudo-frames,
  *    plus random 4-byte headers — free-format (bitrate 0), reserved
  *    indices, and MPEG2.5 corners all walk without a throw, a hang, or
  *    an absurd frame count.
  *
  * Contract as everywhere in multimodal: filter-don't-fail (null on
  * malformed, never a JVM Error, allocation bounded), because these run
  * as Catalyst expression kernels inside 100 TB scans. */
class DeepWalkerFuzzSpec extends AnyFunSuite {

  // ---- progressive JPEG ----------------------------------------------

  private def progressiveJpeg(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      24, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 24)
      img.setRGB(x, y, (x * 53 + y * 131) * 2459 & 0xffffff)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.85f)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  /** (start, end) byte ranges of the interesting regions: SOF2/DHT/SOS
    * segment payloads and everything after each SOS header (entropy
    * data up to the next marker-ish boundary — we just take a fixed
    * window). Minimal marker walk; big-endian segment lengths. */
  private def deepRegions(b: Array[Byte]): Seq[(Int, Int)] = {
    var i = 2 // past SOI
    val out = Seq.newBuilder[(Int, Int)]
    var guard = 0
    while (i + 4 <= b.length && guard < 10000) {
      guard += 1
      if ((b(i) & 0xFF) != 0xFF) { i += 1 }
      else {
        val m = b(i + 1) & 0xFF
        if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2
        else if (m == 0xD9) i = b.length
        else {
          val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
          val payload = (i + 4, math.min(i + 2 + len, b.length))
          if (m == 0xC2 || m == 0xC4) out += payload
          if (m == 0xDA) {
            out += payload
            // entropy-coded data window right after the scan header
            out += ((payload._2,
              math.min(payload._2 + 160, b.length)))
          }
          i += 2 + math.max(len, 2)
        }
      }
    }
    out.result().filter(r => r._2 > r._1)
  }

  test("ProgressiveJpeg: 1200 scan-region mutants decode to null or a well-shaped feature, never throw") {
    val valid = progressiveJpeg()
    val regions = deepRegions(valid)
    assert(regions.nonEmpty, "fixture has no SOF2/DHT/SOS regions?")
    val r = new Random(0xD1E5EL)
    var nullCount = 0
    (0 until 1200).foreach { idx =>
      val b = valid.clone()
      val (lo, hi) = regions(r.nextInt(regions.size))
      (0 until (1 + r.nextInt(6))).foreach { _ =>
        b(lo + r.nextInt(hi - lo)) = r.nextInt(256).toByte
      }
      // a third of the cases also truncate INSIDE the mutated region
      val payload =
        if (idx % 3 == 0) java.util.Arrays.copyOf(b, lo + r.nextInt(hi - lo))
        else b
      val out =
        try Codec.decodeJpeg(payload)
        catch { case e: Throwable =>
          throw new AssertionError(
            s"case $idx (region $lo..$hi, len ${payload.length}) threw: $e", e)
        }
      if (out == null) nullCount += 1
      else assert(out.length == DecodeStub.FeatureDim)
    }
    info(s"nulls: $nullCount/1200")
  }

  test("ProgressiveJpeg: SOS parameter corners (Ss/Se/Ah/Al, component counts) never throw") {
    val valid = progressiveJpeg()
    // locate every SOS and rewrite its (Ss, Se, Ah<<4|Al) trailer bytes
    // to corner values the accumulator must bound-check
    val corners = Seq((0, 0, 0x00), (0, 63, 0xFF), (63, 0, 0x10),
      (1, 63, 0xA5), (62, 63, 0x13), (0, 63, 0xD0), (5, 4, 0x21),
      (63, 63, 0x99))
    var i = 2
    val sosAt = Seq.newBuilder[Int]
    while (i + 4 <= valid.length) {
      if ((valid(i) & 0xFF) == 0xFF && (valid(i + 1) & 0xFF) == 0xDA) {
        sosAt += i; i += 2
      } else i += 1
    }
    val positions = sosAt.result()
    assert(positions.nonEmpty)
    corners.zipWithIndex.foreach { case ((ss, se, ahal), ci) =>
      positions.foreach { at =>
        val b = valid.clone()
        val len = ((b(at + 2) & 0xFF) << 8) | (b(at + 3) & 0xFF)
        val trailer = at + 2 + len - 3 // Ss, Se, AhAl are the last 3
        if (trailer + 2 < b.length) {
          b(trailer) = ss.toByte
          b(trailer + 1) = se.toByte
          b(trailer + 2) = ahal.toByte
          val out =
            try Codec.decodeJpeg(b)
            catch { case e: Throwable =>
              throw new AssertionError(
                s"SOS corner $ci ($ss,$se,$ahal) at $at threw: $e", e)
            }
          if (out != null) assert(out.length == DecodeStub.FeatureDim)
        }
      }
    }
  }

  // ---- MP3 frame-header walk ------------------------------------------

  test("MP3 walk: exhaustive 4096 header-field combinations + garbage frames never throw; frame counts stay sane") {
    // header = FF Ez BR|SR|pad z: sweep version(2b) x layer(2b) x
    // bitrate(4b) x samplerate(2b) x padding(1b) = 4096 with the
    // remaining bits fixed — every sizing path incl. free-format
    // (bitrate 0), reserved (15), reserved sample idx (3), MPEG2.5
    val body = Array.fill[Byte](2000)(0xAA.toByte)
    for {
      ver <- 0 to 3; layer <- 0 to 3; br <- 0 to 15; sr <- 0 to 3
      pad <- 0 to 1
    } {
      val h1 = (0xE0 | (ver << 3) | (layer << 1) | 1).toByte // sync+fields
      val h2 = ((br << 4) | (sr << 2) | (pad << 1)).toByte
      val bytes = Array(0xFF.toByte, h1, h2, 0x00.toByte) ++ body
      val row =
        try AudioMeta.parse(bytes)
        catch { case e: Throwable =>
          throw new AssertionError(
            s"header v=$ver l=$layer br=$br sr=$sr pad=$pad threw: $e", e)
        }
      if (row != null) {
        assert(row.getInt(0) > 0 && row.getInt(1) > 0,
          s"v=$ver l=$layer br=$br sr=$sr: non-positive channels/rate")
        val samples = row.getLong(3) // n_frames = summed PCM SAMPLES
        // a Layer III frame is >= 24 bytes for every legal sizing and
        // yields <= 1152 samples, so the walk can never claim more than
        // the payload could hold — a blown count means the walker
        // stopped advancing (hang shape)
        assert(samples >= 0 && samples <= (bytes.length / 24 + 1) * 1152L,
          s"v=$ver l=$layer br=$br sr=$sr: absurd sample count $samples")
      }
    }
  }

  test("MP3 walk: 3000 random header streams with random tails never throw or hang") {
    val r = new Random(0xA0D10L)
    (0 until 3000).foreach { idx =>
      val n = 4 + r.nextInt(1200)
      val b = new Array[Byte](n)
      r.nextBytes(b)
      // force sync on half the cases so the walk actually starts
      if (idx % 2 == 0 && n >= 4) {
        b(0) = 0xFF.toByte
        b(1) = (b(1) | 0xE0).toByte
      }
      val t0 = System.nanoTime()
      try AudioMeta.parse(b)
      catch { case e: Throwable =>
        throw new AssertionError(s"random case $idx (len $n) threw: $e", e)
      }
      assert(System.nanoTime() - t0 < 2e9, s"case $idx: walk took >2 s")
    }
  }
}
