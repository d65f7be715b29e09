package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

/** Fixture-driven BIFF8 coverage: the spec writes a Workbook stream
  * record-by-record from the MS-XLS layouts (BOF/BOUNDSHEET/SST with a
  * mid-string CONTINUE split/LABELSST/NUMBER/RK/MULRK/LABEL/BOOLERR),
  * wraps it in a TestCfb container, and asserts the read DataFrame. */
class BiffReaderSpec extends SparkSpec {
  import spark.implicits._

  private def rec(t: Int, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(t.toShort).putShort(payload.length.toShort).put(payload)
    b.array()
  }
  private def le(parts: Any*): Array[Byte] = {
    val b = ByteBuffer.allocate(parts.map {
      case _: Byte => 1
      case _: Short => 2
      case _: Int => 4
      case _: Double => 8
      case s: Array[Byte] => s.length
    }.sum).order(ByteOrder.LITTLE_ENDIAN)
    parts.foreach {
      case v: Byte => b.put(v)
      case v: Short => b.putShort(v)
      case v: Int => b.putInt(v)
      case v: Double => b.putDouble(v)
      case v: Array[Byte] => b.put(v)
    }
    b.array()
  }
  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, le(0x0600.toShort, dt.toShort, 0x3515.toShort, 0x07CC,
      0x0000.toShort, 0x0000.toShort))
  private def compressed(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)
  private def wide(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_16LE)
  private def cellHdr(rw: Int, c: Int): Array[Byte] =
    le(rw.toShort, c.toShort, 0.toShort)

  /** RK encodings: int<<2|2, x100 int<<2|3, top-30-bit double. */
  private def rkInt(v: Int): Int = (v << 2) | 2
  private def rkInt100(v: Int): Int = (v << 2) | 3
  private def rkDouble(d: Double): Int = {
    val bits = java.lang.Double.doubleToLongBits(d)
    ((bits >>> 32) & 0xFFFFFFFCL).toInt
  }

  private def buildXls(): Array[Byte] = {
    // SST: 4 strings; string 1 ("Totals £") is wide; string 2 is split
    // across a CONTINUE mid-characters with a re-issued flag byte
    val s3a = "long shared "
    val s3b = "string tail"
    val sst = rec(0x00FC, le(4, 4,
      2.toShort, 0.toByte, compressed("hd"),
      8.toShort, 1.toByte, wide("Totals £"),
      (s3a.length + s3b.length).toShort, 0.toByte, compressed(s3a)))
    val cont = rec(0x003C, le(0.toByte, compressed(s3b),
      4.toShort, 0.toByte, compressed("Kent")))
    val sheetRecords = new ByteArrayOutputStream()
    sheetRecords.write(bof(0x0010))
    sheetRecords.write(rec(0x00FD, le(cellHdr(0, 0), 0)))          // hd
    sheetRecords.write(rec(0x00FD, le(cellHdr(0, 1), 1)))          // Totals £
    sheetRecords.write(rec(0x00FD, le(cellHdr(1, 0), 2)))          // long shared string tail
    sheetRecords.write(rec(0x0203, le(cellHdr(1, 1), 12.5)))       // NUMBER
    sheetRecords.write(rec(0x00FD, le(cellHdr(2, 0), 3)))          // Kent
    sheetRecords.write(rec(0x027E, le(cellHdr(2, 1), rkInt(42))))  // RK int
    sheetRecords.write(rec(0x00BD, le(3.toShort, 0.toShort,        // MULRK cols 0-2
      0.toShort, rkInt100(1999),                                   // 19.99
      0.toShort, rkDouble(2.5),
      0.toShort, rkInt(-7),
      2.toShort)))
    sheetRecords.write(rec(0x0204, le(cellHdr(4, 0),               // LABEL inline
      6.toShort, 0.toByte, compressed("inline"))))
    sheetRecords.write(rec(0x0205, le(cellHdr(4, 1),               // BOOLERR true
      1.toByte, 0.toByte)))
    sheetRecords.write(rec(0x000A, Array.empty[Byte]))

    // globals: BOF + BOUNDSHEET (sheet offset patched below) + SST + EOF
    val globalsPrefix = new ByteArrayOutputStream()
    globalsPrefix.write(bof(0x0005))
    val boundsheetPayload = le(0 /* patched */, 0.toShort,
      6.toByte, 0.toByte, compressed("Sheet1"))
    globalsPrefix.write(rec(0x0085, boundsheetPayload))
    globalsPrefix.write(sst)
    globalsPrefix.write(cont)
    globalsPrefix.write(rec(0x000A, Array.empty[Byte]))
    val globals = globalsPrefix.toByteArray
    // patch the BOUNDSHEET lbPlyPos: sheet BOF starts right after globals
    val bsOffset = bof(0x0005).length + 4 // start of the BOUNDSHEET payload
    ByteBuffer.wrap(globals).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(bsOffset, globals.length)

    val wb = new ByteArrayOutputStream()
    wb.write(globals); wb.write(sheetRecords.toByteArray)
    TestCfb.write(Seq("Workbook" -> wb.toByteArray))
  }

  test("BIFF8 .xls end-to-end: SST continue-split, RK/MULRK/NUMBER/LABEL cells") {
    val dir = Files.createTempDirectory("biff").toString
    val path = s"$dir/legacy.xls"
    val fos = new FileOutputStream(path); fos.write(buildXls()); fos.close()
    val df = BiffReader.readXls(spark, path, headerRow = 0)
    assert(df.columns.toSeq === Seq("hd", "Totals £"))
    val rows = df.as[(Option[String], Option[String])].collect().toSeq
    assert(rows === Seq(
      (Some("long shared string tail"), Some("12.5")),
      (Some("Kent"), Some("42")),
      (Some("19.99"), Some("2.5")),   // MULRK row: cols 0,1 (col 2 = -7 dropped by width)
      (Some("inline"), Some("TRUE"))))
  }

  test("RC4-obfuscated .xls is refused with a pointer to the agile path") {
    val wb = new ByteArrayOutputStream()
    wb.write(bof(0x0005))
    wb.write(rec(0x002F, le(1.toShort, 1.toShort, 1.toShort))) // FILEPASS
    wb.write(rec(0x000A, Array.empty[Byte]))
    val dir = Files.createTempDirectory("biff-rc4").toString
    val path = s"$dir/locked.xls"
    val fos = new FileOutputStream(path)
    fos.write(TestCfb.write(Seq("Workbook" -> wb.toByteArray))); fos.close()
    val e = intercept[IllegalArgumentException] {
      BiffReader.readXls(spark, path)
    }
    assert(e.getMessage.contains("RC4"))
  }
}
