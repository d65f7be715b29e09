package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual image hashing (dHash, Krawetz) — ties the multimodal
  * columns into the dedup machinery: a 64-bit gradient hash over a
  * 9x8 box-averaged luminance grid, where bit (r,c) says "pixel (r,c)
  * is brighter than its right neighbor". Near-duplicate images (small
  * crops, recompression, minor edits) land within a few Hamming bits;
  * pair detection then reuses the repo's Hamming-block equi-join shape
  * ([[graft.operators.Dedup]]'s simhash discipline — pigeonhole: at
  * Hamming distance <= 3, at least one of the 4 16-bit blocks is
  * identical, so candidates come from an equi-join, never all-pairs).
  *
  * The pixel sources are the repo's own library-free decoders: 24-bit
  * BMP ([[Codec.decodeBmp24]]'s layout) and JPEG in both coding modes
  * ([[Codec.decodeJpegPixels]] — baseline and progressive, so a
  * progressive re-encode of a baseline image hashes to within a few
  * bits); other formats flow through once decoded upstream (the decode
  * stage of [[DecodeStub.decodeFeatures]]) — the HASH contract is over
  * the luma grid and is format-independent ([[dHashFromGrid]]). */
object ImageHash {

  /** Grid geometry: 9 columns x 8 rows -> 8x8 = 64 horizontal-gradient
    * bits. */
  val GridW = 9
  val GridH = 8

  private def u8(b: Array[Byte], i: Int): Int = Codec.u8(b, i)
  private def le32(b: Array[Byte], i: Int): Long = Codec.le32(b, i)

  /** Box-averaged Rec. 601 luminance grid (GridW x GridH, row-major)
    * from a 24-bit BMP; null when the payload is not one this decoder
    * handles (same acceptance as [[Codec.isBmp24]], bounds included).
    * Box averaging IS the resize step: every source pixel lands in
    * exactly one cell, so the grid is the mean-pooled downsample. */
  def lumaGridBmp24(b: Array[Byte]): Array[Double] = {
    if (!Codec.isBmp24(b)) return null
    val off = le32(b, 10).toInt
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val h = math.abs(hRaw)
    if (w < GridW || h < GridH || w.toLong * h > Codec.MaxPixels) return null
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (off < 54 || off.toLong + rowBytes.toLong * h > b.length) return null
    val sum = new Array[Double](GridW * GridH)
    val cnt = new Array[Long](GridW * GridH)
    var y = 0
    while (y < h) {
      // bottom-up rows unless height is negative (top-down)
      val imgY = if (hRaw > 0) h - 1 - y else y
      val gy = imgY * GridH / h
      val base = off + y * rowBytes
      var x = 0
      while (x < w) {
        val gx = x * GridW / w
        val bl = u8(b, base + x * 3)
        val g = u8(b, base + x * 3 + 1)
        val r = u8(b, base + x * 3 + 2)
        val luma = 0.299 * r + 0.587 * g + 0.114 * bl
        sum(gy * GridW + gx) += luma
        cnt(gy * GridW + gx) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](GridW * GridH)
    var i = 0
    while (i < out.length) { out(i) = sum(i) / cnt(i); i += 1 }
    out
  }

  /** dHash over any GridW x GridH luma grid: bit 63-… set when cell
    * (r,c) is strictly brighter than cell (r,c+1) — format-independent,
    * deterministic, and stable under global brightness shifts (only
    * gradients matter). */
  def dHashFromGrid(g: Array[Double]): Long = {
    require(g != null && g.length == GridW * GridH,
      s"luma grid must be $GridW x $GridH")
    var h = 0L
    var r = 0
    while (r < GridH) {
      var c = 0
      while (c < GridW - 1) {
        h = (h << 1) | (if (g(r * GridW + c) > g(r * GridW + c + 1)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Box-averaged luminance grid from a decoded JPEG (either coding
    * mode — [[Codec.decodeJpegPixels]] routes SOF0/1 and SOF2): the
    * same mean-pooled downsample as the BMP path, over the shared
    * upsample+YCbCr pixel read. A baseline and a progressive re-encode
    * of one image therefore land within a few Hamming bits. */
  def lumaGridJpeg(b: Array[Byte]): Array[Double] = {
    val px = Codec.decodeJpegPixels(b)
    if (px == null || px.w < GridW || px.h < GridH) return null
    val sum = new Array[Double](GridW * GridH)
    val cnt = new Array[Long](GridW * GridH)
    val rgb = new Array[Double](3)
    var y = 0
    while (y < px.h) {
      val gy = y * GridH / px.h
      var x = 0
      while (x < px.w) {
        val gx = x * GridW / px.w
        Codec.jpegRgbAt(px, x, y, rgb)
        sum(gy * GridW + gx) += 0.299 * rgb(0) + 0.587 * rgb(1) + 0.114 * rgb(2)
        cnt(gy * GridW + gx) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](GridW * GridH)
    var i = 0
    while (i < out.length) { out(i) = sum(i) / cnt(i); i += 1 }
    out
  }

  /** Box-averaged luminance grid from a GIF frame 0 — palette-resolved
    * pixels through [[Codec.decodeGifPixels]], same pooling as the
    * other formats. */
  def lumaGridGif(b: Array[Byte]): Array[Double] = {
    val px = Codec.decodeGifPixels(b)
    if (px == null || px.w < GridW || px.h < GridH) return null
    val sum = new Array[Double](GridW * GridH)
    val cnt = new Array[Long](GridW * GridH)
    var y = 0
    while (y < px.h) {
      val gy = y * GridH / px.h
      var x = 0
      while (x < px.w) {
        val gx = x * GridW / px.w
        val pi = (px.idx(y * px.w + x) & 0xff) * 3
        sum(gy * GridW + gx) += 0.299 * u8(px.palette, pi) +
          0.587 * u8(px.palette, pi + 1) + 0.114 * u8(px.palette, pi + 2)
        cnt(gy * GridW + gx) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](GridW * GridH)
    var i = 0
    while (i < out.length) { out(i) = sum(i) / cnt(i); i += 1 }
    out
  }

  /** Boxed dHash of a 24-bit BMP, JPEG, or GIF payload; null for
    * anything else (the filter-don't-fail codec contract). Static entry
    * for the codegen expression below. */
  def dHash64(b: Array[Byte]): java.lang.Long = {
    val g =
      if (Codec.isJpeg(b)) lumaGridJpeg(b)
      else if (Codec.isGif(b)) lumaGridGif(b)
      else lumaGridBmp24(b)
    if (g == null) null else java.lang.Long.valueOf(dHashFromGrid(g))
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Column form: `graft_dhash(binary) -> long` (null on undecodable
    * payloads), as a native expression so corpus-scale hashing stays a
    * scan-level projection — no UDF, no shuffle. */
  def dHash(c: Column): Column =
    GraftShims.column(DHash(GraftShims.expression(c)))

  /** Near-duplicate image pairs within `maxHamming` (<= 3 for the
    * pigeonhole guarantee): hash at scan, then the shared Hamming-block
    * candidate join ([[HammingPairs.pairs64]]) — 4 shuffle rows per
    * image, candidates bounded by block-bucket sizes, the
    * [[graft.operators.Dedup]] shape, never all-pairs. */
  def nearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                   maxHamming: Int = 3): DataFrame =
    HammingPairs.pairs64(
        df.select(col(idCol).as("id"), dHash(col(payloadCol)).as("h"))
          .where(col("h").isNotNull),
        maxHamming)
      .withColumnRenamed("id_a", "img_a")
      .withColumnRenamed("id_b", "img_b")
}

/** `graft_dhash`: see [[ImageHash.dHash]]. */
case class DHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_dhash requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageHash.dHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val boxed = ctx.freshName("dh")
      s"""
         |java.lang.Long $boxed = graft.multimodal.ImageHash.dHash64($in);
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DHash =
    copy(child = newChild)
}
