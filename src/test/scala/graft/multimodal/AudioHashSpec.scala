package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal PCM16 WAV around the given mono samples. */
  private def wav(samples: Array[Short], channels: Int = 1,
                  rate: Int = 8000): Array[Byte] = {
    val block = channels * 2
    val dataLen = samples.length * 2
    val total = 12 + 24 + 8 + dataLen
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * block).putShort(block.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  /** 650 frames whose per-window mean amplitude ramps UP window by
    * window (10 frames per window, amplitude = window index * 100),
    * optionally scaled (volume) or with one window made loud. */
  private def ramp(scale: Double = 1.0,
                   spikeWindow: Option[Int] = None): Array[Byte] = {
    val s = Array.tabulate(650) { f =>
      val w = f / 10
      val amp = if (spikeWindow.contains(w)) 30000.0 else w * 100.0
      (amp * scale).toShort
    }
    wav(s)
  }

  test("audio dHash: ramp structure, volume invariance, null on non-PCM") {
    val h = AudioHash.dHash64(ramp())
    assert(h != null)
    // strictly rising envelope: every "louder than next" bit is 0
    assert(h.longValue() === 0L)
    // volume scaling preserves every envelope comparison
    assert(AudioHash.dHash64(ramp(scale = 0.5)).longValue() === h.longValue())
    // a reversed ramp flips every bit
    val rev = wav(Array.tabulate(650)(f => ((64 - f / 10) * 100).toShort))
    assert(AudioHash.dHash64(rev).longValue() === -1L)
    // MP3 payloads carry no PCM16 samples -> null (not a throw)
    assert(AudioHash.dHash64("ID3junk".getBytes) == null)
    // too short to window -> null
    assert(AudioHash.dHash64(wav(Array.fill(10)(100.toShort))) == null)
  }

  test("audio near-dup pairs: gain-scaled twin pairs, spiked clip stays near, reverse far") {
    val rows = Seq(
      (1L, ramp()),
      (2L, ramp(scale = 0.3)),            // same envelope, quieter: hamming 0
      (3L, ramp(spikeWindow = Some(30))), // one loud window: few bits move
      (4L, wav(Array.tabulate(650)(f => ((64 - f / 10) * 100).toShort))))
      .toDF("clip_id", "payload")
    val pairs = AudioHash.nearDupPairs(rows, "clip_id", "payload", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val ids = pairs.map(p => (p._1, p._2))
    assert(ids.contains((1L, 2L)), s"gain twin not found: $pairs")
    assert(pairs.collectFirst { case (1L, 2L, d) => d }.get === 0)
    assert(ids.contains((1L, 3L)) && ids.contains((2L, 3L)),
      s"spiked near-twin not found: $pairs")
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L),
      s"reversed clip must not pair: $pairs")
  }
}
