package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy binary .xls (BIFF8) reader — the last leg of the reference's
  * spreadsheet surface: `geoplace_swa.py:69` reads the decrypted GeoPlace
  * workbook with `pd.read_excel(... xlrd)`, i.e. BIFF, not OOXML.
  * Implemented from the public MS-XLS spec over the [[OfficeCrypto.Cfb]]
  * compound-file reader (the .xls container is the same OLE2 format as
  * the encrypted-package container).
  *
  * Covered: the Workbook stream's globals (BOUNDSHEET sheet directory,
  * SST shared strings incl. CONTINUE spans with their re-issued encoding
  * flag byte, compressed + UTF-16 strings) and the worksheet cell records
  * LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR. Values surface as
  * strings, like the XLSX/ODS readers (pandas `astype(str)` semantics).
  * Password-protected workbooks (FILEPASS) decrypt for all three legacy
  * schemes — XOR obfuscation, "standard" RC4, RC4 CryptoAPI
  * ([[OfficeCrypto.decryptBiffWorkbook]]); the modern agile-encrypted
  * path is [[SpreadsheetSource.readEncryptedXlsx]].
  *
  * Driver-side parse by design, like the rest of SpreadsheetSource:
  * workbooks are driver-scale artifacts; the downstream reshaping is the
  * shared distributed `promote` path.
  */
object BiffReader {

  private case class Rec(offset: Int, t: Int, data: Array[Byte])

  private def records(b: Array[Byte]): Vector[Rec] = {
    val out = Vector.newBuilder[Rec]
    var off = 0
    while (off + 4 <= b.length) {
      val buf = ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN)
      val t = buf.getShort() & 0xFFFF
      val n = buf.getShort() & 0xFFFF
      if (off + 4 + n > b.length) return out.result()
      out += Rec(off, t, java.util.Arrays.copyOfRange(b, off + 4, off + 4 + n))
      off += 4 + n
    }
    out.result()
  }

  /** Byte cursor over an SST record plus its CONTINUE records. Numeric
    * fields never span segments (spec guarantee); character arrays do,
    * and each continuation re-issues the encoding flag byte. */
  private final class Segs(segs: Vector[Array[Byte]]) {
    private var si = 0
    private var off = 0
    private def seg = segs(si)
    private def hop(): Unit =
      while (off >= seg.length && si < segs.length - 1) { si += 1; off = 0 }
    def u8(): Int = { hop(); val v = seg(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        hop()
        // past the final segment: a corrupt cRun/cbExt would otherwise
        // leave take = 0 and spin this loop forever
        if (off >= seg.length) sys.error("SST truncated (skip past end)")
        val take = math.min(left, (seg.length - off).toLong)
        off += take.toInt; left -= take
      }
    }
    /** Read `cch` characters, re-reading the flag byte at each segment
      * boundary (MS-XLS 2.5.293: continued strings restate fHighByte). */
    def chars(cch: Int, wideAtStart: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = wideAtStart
      var left = cch
      while (left > 0) {
        hop()
        if (off >= seg.length) sys.error("SST truncated")
        // every CONTINUE fragment of an in-progress string restates the
        // flag byte — including when the record boundary fell exactly
        // between the string's cch/flags header and its first character
        // (sb is still empty then, so keying on sb.length would consume
        // the flag byte as a character and garble the rest of the SST)
        if (off == 0 && si > 0) wide = (u8() & 1) == 1
        val avail = (seg.length - off) / (if (wide) 2 else 1)
        val take = math.min(left, math.max(avail, 1))
        var i = 0
        while (i < take) {
          val c = if (wide) (u8() | (u8() << 8)).toChar else u8().toChar
          sb.append(c); i += 1
        }
        left -= take
      }
      sb.toString
    }
  }

  private def parseSst(sstRec: Rec, continues: Vector[Rec]): Vector[String] = {
    val cur = new Segs(sstRec.data +: continues.map(_.data))
    cur.skip(4) // cstTotal
    val unique = cur.u32().toInt
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < unique) {
      val cch = cur.u16()
      val flags = cur.u8()
      val wide = (flags & 0x01) == 1
      val ext = (flags & 0x04) != 0
      val rich = (flags & 0x08) != 0
      val cRun = if (rich) cur.u16() else 0
      val cbExt = if (ext) cur.u32() else 0L
      out += cur.chars(cch, wide)
      cur.skip(4L * cRun)
      cur.skip(cbExt)
      i += 1
    }
    out.result()
  }

  /** RK-compressed number (MS-XLS 2.5.276). */
  private def rkValue(rk: Long): Double = {
    val v =
      if ((rk & 2) != 0) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) v / 100.0 else v
  }

  /** Integer-valued doubles render without ".0" (pandas-str semantics). */
  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** All (row, col, value-string) cells of worksheet `sheet` (1-based).
    * A password decrypts RC4-CryptoAPI-protected workbooks
    * ([[OfficeCrypto.Rc4CryptoApi]] — the geoplace_swa.py case). */
  def cells(xlsBytes: Array[Byte], sheet: Int = 1,
            password: Option[String] = None): Seq[(Long, Int, String)] = {
    val streams = OfficeCrypto.Cfb.streams(xlsBytes)
    val wb0 = streams.getOrElse("Workbook", streams.getOrElse("Book",
      sys.error("no Workbook stream — not a BIFF .xls file")))
    val recs0 = records(wb0)
    // BIFF5/95 'Book' streams reuse record types with DIFFERENT layouts
    // (byte strings without the flags byte): parsing them as BIFF8 would
    // garble silently, so check the BOF version up front
    recs0.headOption.filter(r => r.t == 0x0809 && r.data.length >= 2)
      .foreach { bof =>
        val vers = (bof.data(0) & 0xFF) | ((bof.data(1) & 0xFF) << 8)
        require(vers == 0x0600,
          f"unsupported BIFF version 0x$vers%04X — only BIFF8 (Excel 97+)")
      }
    val encrypted = recs0.exists(_.t == 0x002F)
    // the unencrypted (typical) case reuses the already-parsed records
    // instead of a second full parse+copy pass over the stream
    val recs = (encrypted, password) match {
      case (false, _) => recs0
      case (true, Some(pw)) => records(OfficeCrypto.decryptBiffWorkbook(wb0, pw))
      case (true, None) => throw new IllegalArgumentException(
        "password-protected .xls (FILEPASS): pass a password " +
          "(XOR-obfuscated, RC4 standard, or RC4 CryptoAPI) or use " +
          "SpreadsheetSource.readEncryptedXlsx for modern " +
          "agile-encrypted workbooks")
    }
    // globals substream: sheet directory + shared strings
    val globalsEnd = recs.indexWhere(_.t == 0x000A) // first EOF
    val globals = recs.take(if (globalsEnd < 0) recs.length else globalsEnd)
    val sheetOffsets = globals.filter(_.t == 0x0085).map { r =>
      ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN).getInt()
    }
    require(sheet >= 1 && sheet <= sheetOffsets.length,
      s"sheet $sheet of ${sheetOffsets.length} in workbook")
    val sst = globals.indexWhere(_.t == 0x00FC) match {
      case -1 => Vector.empty[String]
      case i => parseSst(globals(i),
        globals.drop(i + 1).takeWhile(_.t == 0x003C))
    }
    // worksheet substream: from its BOF to its EOF
    val start = recs.indexWhere(_.offset == sheetOffsets(sheet - 1))
    require(start >= 0, s"BOUNDSHEET offset ${sheetOffsets(sheet - 1)} not on a record")
    val body = recs.drop(start + 1).takeWhile(_.t != 0x000A)

    val out = Seq.newBuilder[(Long, Int, String)]
    body.foreach { r =>
      val b = ByteBuffer.wrap(r.data).order(ByteOrder.LITTLE_ENDIAN)
      r.t match {
        case 0x00FD => // LABELSST
          val (rw, c) = (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF)
          b.getShort() // ixfe
          out += ((rw.toLong, c, sst(b.getInt())))
        case 0x0204 => // LABEL (inline string)
          val (rw, c) = (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF)
          b.getShort() // ixfe
          val cch = b.getShort() & 0xFFFF
          val wide = (b.get() & 1) == 1
          val bytes = new Array[Byte](cch * (if (wide) 2 else 1))
          b.get(bytes)
          out += ((rw.toLong, c, new String(bytes,
            if (wide) StandardCharsets.UTF_16LE else StandardCharsets.ISO_8859_1)))
        case 0x0203 => // NUMBER
          val (rw, c) = (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF)
          b.getShort()
          out += ((rw.toLong, c, fmt(b.getDouble())))
        case 0x027E => // RK
          val (rw, c) = (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF)
          b.getShort()
          out += ((rw.toLong, c, fmt(rkValue(b.getInt() & 0xFFFFFFFFL))))
        case 0x00BD => // MULRK
          val rw = b.getShort() & 0xFFFF
          val colFirst = b.getShort() & 0xFFFF
          val n = (r.data.length - 6) / 6
          for (i <- 0 until n) {
            b.getShort() // ixfe
            out += ((rw.toLong, colFirst + i, fmt(rkValue(b.getInt() & 0xFFFFFFFFL))))
          }
        case 0x0205 => // BOOLERR
          val (rw, c) = (b.getShort() & 0xFFFF, b.getShort() & 0xFFFF)
          b.getShort()
          val v = b.get(); val isErr = b.get()
          if (isErr == 0) out += ((rw.toLong, c, if (v != 0) "TRUE" else "FALSE"))
        case _ => // BOF, DIMENSIONS, ROW, formatting... — not cell data
      }
    }
    out.result()
  }

  /** Read one worksheet of a BIFF8 .xls into a DataFrame, with the same
    * header-promotion semantics as readXlsx/readOds. `password` unlocks
    * RC4-CryptoAPI-protected workbooks. */
  def readXls(spark: SparkSession, xlsPath: String, headerRow: Int = 0,
              sheet: Int = 1, password: Option[String] = None): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(xlsPath))
    import spark.implicits._
    val cellDf = cells(bytes, sheet, password).toDF("rn", "ci", "value")
    SpreadsheetSource.promote(cellDf, headerRow)
  }
}
