package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal canonical WAV: RIFF/WAVE + fmt + data. Optionally an odd-size
    * LIST chunk BEFORE fmt (exercises even-padding + chunk-order walk). */
  private def wav(channels: Int, rate: Int, bits: Int, frames: Int,
                  oddListChunk: Boolean = false): Array[Byte] = {
    val block = channels * bits / 8
    val dataLen = frames * block
    val listBody = if (oddListChunk) 5 else 0
    val listLen = if (oddListChunk) 8 + listBody + 1 else 0 // +1 pad byte
    val total = 12 + listLen + 24 + 8 + dataLen
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
    if (oddListChunk) {
      b.put("LIST".getBytes("US-ASCII")).putInt(listBody)
      b.put(new Array[Byte](listBody + 1)) // odd size pads to even
    }
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * block).putShort(block.toShort).putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(new Array[Byte](dataLen))
    b.array()
  }

  /** Hand-built MP3: `n` Layer III frames, optional ID3v2 prefix.
    * MPEG-1 128 kbps 44100 Hz stereo -> frame length floor(144 *
    * 128000 / 44100) = 417 bytes, 1152 samples per frame. */
  private def mp3(n: Int, id3: Boolean = false, mono: Boolean = false,
                  v2: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3) {
      out.write("ID3".getBytes("US-ASCII")) // + ver/flags + synchsafe 10
      out.write(Array[Byte](4, 0, 0, 0, 0, 0, 10))
      out.write(new Array[Byte](10))
    }
    val frameLen =
      if (v2) 72 * 64000 / 22050 else 144 * 128000 / 44100 // 209 / 417
    for (_ <- 0 until n) {
      // sync + version + layer III + no CRC; V1: 0xFB, V2: 0xF3
      out.write(0xff); out.write(if (v2) 0xf3 else 0xfb)
      // V1: bitrate idx 9 = 128k; V2: idx 8 = 64k; sr idx 0, no pad
      out.write(if (v2) 0x80 else 0x90)
      out.write(if (mono) 0xc0 else 0x00)
      out.write(new Array[Byte](frameLen - 4))
    }
    out.toByteArray
  }

  test("MP3 frame-header walk: channels, rate, summed samples, past an ID3v2 tag") {
    val rows = Seq(
      ("v1stereo", mp3(3)),
      ("v1id3mono", mp3(2, id3 = true, mono = true)),
      ("v2", mp3(4, v2 = true)))
      .toDF("name", "bytes")
      .select(col("name"), AudioMeta.audioMeta(col("bytes")).as("m"))
      .select(col("name"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.n_frames"))
      .as[(String, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rows("v1stereo") === (2, 44100, 0, 3 * 1152L))
    assert(rows("v1id3mono") === (1, 44100, 0, 2 * 1152L))
    assert(rows("v2") === (2, 22050, 0, 4 * 576L))
    // non-audio bytes -> null row
    val junk = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)))
      .toDF("bytes").select(AudioMeta.audioMeta(col("bytes"))).collect()
    assert(junk.head.isNullAt(0))
  }

  test("WAV fmt/data chunks parse: channels, rate, bits, frame count") {
    val rows = Seq(
      (1L, wav(2, 44100, 16, 1000)),
      (2L, wav(1, 16000, 8, 320, oddListChunk = true)),
      (3L, "RIFFjunk but not a wave".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val out = rows
      .select(col("id"), AudioMeta.audioMeta(col("payload")).as("m"))
      .select(col("id"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.n_frames"))
      .as[(Long, Option[Int], Option[Int], Option[Int], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out(1L) === ((Some(2), Some(44100), Some(16), Some(1000L))))
    assert(out(2L) === ((Some(1), Some(16000), Some(8), Some(320L))))
    assert(out(3L) === ((None, None, None, None)))
    assert(out(4L) === ((None, None, None, None)))
  }

  test("truncated data chunk clamps the frame count instead of failing") {
    val full = wav(1, 8000, 16, 100)
    val cut = java.util.Arrays.copyOf(full, full.length - 60) // lose 30 frames
    val frames = Seq((1L, cut)).toDF("id", "payload")
      .select(AudioMeta.audioMeta(col("payload")).as("m"))
      .select("m.n_frames").as[Option[Long]].head()
    assert(frames === Some(70L))
  }

  test("duration filter composes in SQL via graft_audio_meta") {
    Seq((1L, wav(1, 16000, 16, 32000)), (2L, wav(1, 16000, 16, 8000)))
      .toDF("id", "payload").createOrReplaceTempView("wav_in")
    // keep clips >= 1 s: n_frames / sample_rate >= 1
    val kept = spark.sql(
      """SELECT id FROM wav_in
        |WHERE graft_audio_meta(payload).n_frames
        |      >= graft_audio_meta(payload).sample_rate""".stripMargin)
      .as[Long].collect().toSeq
    assert(kept === Seq(1L))
  }
}
