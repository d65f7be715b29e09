package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Image dimensions straight from the container header — the metadata
  * half of multimodal decode that needs NO codec library (all three
  * container layouts are public specs):
  *
  *   - PNG:  8-byte signature, IHDR width/height as big-endian u32 at
  *     offsets 16/20
  *   - GIF:  "GIF87a"/"GIF89a", logical-screen width/height as
  *     little-endian u16 at offsets 6/8
  *   - JPEG: FF D8, then a marker-segment walk to the first SOF0-SOF15
  *     frame header (height/width big-endian u16 at +5/+7), skipping
  *     non-frame segments by their declared lengths
  *
  * Returns `struct<format string, width int, height int>`, null for
  * unrecognized/truncated payloads (filter-don't-fail, the standard
  * corpus-ingest contract). A native expression rather than a UDF for
  * the usual reason: this runs per row over billions of binary payloads
  * — the JPEG walk is a tight loop inside whole-stage codegen, and
  * unrecognized bytes short-circuit on the first two bytes. */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_image_meta requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
         |  graft.multimodal.ImageMeta.parse($in);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else InternalRow(UTF8String.fromString(fmt), w.toInt, h.toInt)

  /** Null on anything unrecognized or truncated. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG: 89 50 4E 47 0D 0A 1A 0A + IHDR chunk first (per spec)
    if (u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      if (b.length < 24) return null
      return row("png", be32(b, 16), be32(b, 20))
    }
    // GIF87a / GIF89a
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: FF D8, walk marker segments to the first SOF frame header
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null // lost sync
        val m = u8(b, i + 1)
        if (m == 0xff) { i += 1 } // fill bytes before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: length(2) precision(1) height(2) width(2)
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else {
          if (i + 3 >= b.length) return null
          val len = be16(b, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  def imageMeta(c: Column): Column =
    GraftShims.column(ImageMeta(GraftShims.expression(c)))
}
