package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes("US-ASCII"))
    b.putShort(w.toShort).putShort(h.toShort)
    b.put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  /** FF D8, APP0(JFIF), DHT (must be skipped, not taken for SOF), SOF0. */
  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(64)
    out.put(0xff.toByte).put(0xd8.toByte)
    out.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort)
      .put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
    out.put(0xff.toByte).put(0xc4.toByte).putShort(4.toShort)
      .put(new Array[Byte](2)) // DHT: 0xC4 is NOT a frame header
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11.toShort)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      .put(new Array[Byte](4))
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  test("PNG / GIF / JPEG dimensions parse from raw headers; junk is null") {
    val rows = Seq(
      (1L, png(640, 480)),
      (2L, gif(320, 200)),
      (3L, jpeg(1024, 768)),
      (4L, "not an image at all".getBytes("UTF-8")),
      (5L, java.util.Arrays.copyOf(png(9, 9), 12)), // truncated PNG
      (6L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val out = rows
      .select(col("id"), ImageMeta.imageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .as[(Long, Option[String], Option[Int], Option[Int])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out(1L) === ((Some("png"), Some(640), Some(480))))
    assert(out(2L) === ((Some("gif"), Some(320), Some(200))))
    assert(out(3L) === ((Some("jpeg"), Some(1024), Some(768))))
    assert(out(4L) === ((None, None, None)))
    assert(out(5L) === ((None, None, None)))
    assert(out(6L) === ((None, None, None)))
  }

  test("interpreted path agrees with codegen; SQL surface works") {
    val df = Seq((1L, png(33, 44))).toDF("id", "payload")
    // count_distinct forces the interpreted eval path
    val interp = df.select(count_distinct(ImageMeta.imageMeta(col("payload"))))
      .head().getLong(0)
    assert(interp === 1L)
    df.createOrReplaceTempView("img_in")
    val viaSql = spark.sql(
      "SELECT graft_image_meta(payload).width FROM img_in").head().getInt(0)
    assert(viaSql === 33)
  }

  test("JPEG walk survives fill bytes and standalone markers") {
    val base = jpeg(100, 50)
    // insert a fill byte run before the SOF marker region: FF FF FF D8 ...
    val withFill = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      base.drop(2)
    val got = Seq((1L, withFill)).toDF("id", "payload")
      .select(ImageMeta.imageMeta(col("payload")).as("m"))
      .select("m.width").as[Option[Int]].head()
    assert(got === Some(100))
  }
}
