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
