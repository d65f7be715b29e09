package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Audio metadata straight from the container/frame headers — the
  * audio sibling of [[ImageMeta]], same contract: public format, no
  * codec library, null on unrecognized/truncated payloads.
  *
  * WAV/RIFF: walks chunks ("RIFF" + size + "WAVE", then `fmt ` for
  * channels/sample-rate/bits and `data` for payload size — chunks may
  * appear in any order and carry odd sizes, which pad to even per the
  * spec); n_frames = data bytes / block-align. MP3 (R10): walks MPEG
  * Layer III frame headers (ISO/IEC 11172-3 / 13818-3) past an ID3v2
  * tag, deriving each frame's byte length from its bitrate/samplerate
  * indices — headers only, no Huffman decode (full MP3 decode remains
  * the documented Codec waiver); n_frames = summed PCM samples
  * (1152/frame V1, 576 V2/V2.5), `bits = 0` marks a compressed
  * source. Emits `struct<channels int, sample_rate int, bits int,
  * n_frames bigint>`; duration follows as `n_frames / sample_rate`
  * downstream — the codec-free duration a corpus filter needs
  * ("drop clips under 1 s"). */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.AudioMeta.parse($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return parseMp3(b)
    var channels = -1; var rate = -1L; var bits = -1; var block = -1
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return null
      val body = i + 8
      if (tag(b, i, "fmt ")) {
        if (body + 16 > b.length) return null
        channels = le16(b, body + 2)
        rate = le32(b, body + 4)
        block = le16(b, body + 12)
        bits = le16(b, body + 14)
      } else if (tag(b, i, "data")) {
        dataBytes = math.min(size, (b.length - body).toLong) // truncated data ok
      }
      // chunks pad to even; advance in Long — a ~2 GB declared size
      // would wrap Int and turn i negative (AIOOBE), not end the walk
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > b.length) i = b.length else i = next.toInt
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue ||
        bits <= 0 || block <= 0 || dataBytes < 0) null
    else InternalRow(channels, rate.toInt, bits, dataBytes / block)
  }

  // MPEG audio Layer III header tables (ISO/IEC 11172-3 §2.4.2.3 /
  // 13818-3): bitrate kbps by index for (V1, L3) and (V2/V2.5, L3),
  // sample rate by index per version. Index 0 = "free format" (frame
  // length not derivable from the header) ends the walk.
  private val BrV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** MP3 METADATA by frame-header walk — channels, sample rate and the
    * total PCM sample count (`n_frames`, matching the WAV branch's
    * unit), with `bits = 0` marking a compressed source. An ID3v2 tag
    * is skipped by its synchsafe size. This parses HEADERS only: full
    * MP3 DECODE remains the documented filter-don't-fail waiver
    * (Codec.scala) — metadata needs no Huffman tables and is exactly
    * what a curation pass filters on. Non-MP3 / free-format-first
    * input -> null. */
  private def parseMp3(b: Array[Byte]): InternalRow = {
    var i = 0
    // ID3v2: "ID3" ver(2) flags(1) size(4, synchsafe 7-bit bytes)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + size
      if (i < 0 || i >= b.length) return null
    }
    var channels = -1; var rate = -1; var frames = 0L; var samples = 0L
    var run = true
    while (run && i + 4 <= b.length) {
      val h0 = u8(b, i); val h1 = u8(b, i + 1)
      val h2 = u8(b, i + 2); val h3 = u8(b, i + 3)
      // 11-bit sync + Layer III only (the training-corpus audio shape)
      val version = (h1 >> 3) & 0x3   // 0=V2.5, 2=V2, 3=V1 (1 reserved)
      val layer = (h1 >> 1) & 0x3     // 1 = Layer III
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0 || layer != 1 || version == 1)
        run = false
      else {
        val brIdx = (h2 >> 4) & 0xf
        val srIdx = (h2 >> 2) & 0x3
        val padding = (h2 >> 1) & 0x1
        val mode = (h3 >> 6) & 0x3    // 3 = single channel
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) run = false
        else {
          val v1 = version == 3
          val sr = (if (v1) SrV1 else if (version == 2) SrV2 else SrV25)(srIdx)
          val br = (if (v1) BrV1L3 else BrV2L3)(brIdx) * 1000
          // Layer III frame: floor(coef * bitrate / samplerate) + pad,
          // coef = 144 for V1, 72 for V2/V2.5 (576-sample granule)
          val len = (if (v1) 144 else 72) * br / sr + padding
          val ch = if (mode == 3) 1 else 2
          if (len < 4 || (channels > 0 && (ch != channels || sr != rate)))
            run = false // stream parameter change: stop at the clean prefix
          else {
            channels = ch; rate = sr
            frames += 1
            samples += (if (v1) 1152L else 576L)
            i += len
          }
        }
      }
    }
    if (frames == 0L) null
    else InternalRow(channels, rate, 0, samples)
  }

  def audioMeta(c: Column): Column =
    GraftShims.column(AudioMeta(GraftShims.expression(c)))
}
