package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** Audio metadata straight from the WAV/RIFF container header — the
  * audio sibling of [[ImageMeta]], same contract: public format, no
  * codec library, null on unrecognized/truncated payloads.
  *
  * Walks RIFF chunks ("RIFF" + size + "WAVE", then `fmt ` for
  * channels/sample-rate/bits and `data` for payload size — chunks may
  * appear in any order and carry odd sizes, which pad to even per the
  * spec). Emits `struct<channels int, sample_rate int, bits int,
  * n_frames bigint>`; duration follows as `n_frames / sample_rate`
  * downstream. n_frames = data bytes / block-align, the codec-free
  * duration a corpus filter needs ("drop clips under 1 s"). */
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
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
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

  def audioMeta(c: Column): Column =
    GraftShims.column(AudioMeta(GraftShims.expression(c)))
}
