package graft.spark.xlsx

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.FuzzUtil
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-bytes pass over the graft-xlsx StAX reader (zip walk,
  * workbook-order sheet resolution, cell-ref positioning, shared
  * strings, row counting) — the same null-or-loud contract the
  * sqlite/BIFF/CFB readers earned in R15: a mutated container must
  * return normally or throw a controlled Exception, NEVER a JVM Error
  * (the colIdx overflow → headerSchema OOM class this spec found) and
  * never a hang. Pure JVM (no Spark jobs), so the full 1000-case
  * budget is cheap. */
class XlsxParseFuzzSpec extends AnyFunSuite {
  private val Cases = 1000
  private val Seed = 0xA16016L

  /** A realistic workbook: workbook.xml + rels (so openSheet takes the
    * workbook-order path), two sheets, shared strings with a rich-text
    * run, inline strings, gap cells, ref-less cells. */
  private def validXlsx(): Array[Byte] = {
    val members = Seq(
      "xl/workbook.xml" ->
        """<workbook xmlns:r="urn:r"><sheets>
          |<sheet name="Data" sheetId="1" r:id="rId1"/>
          |<sheet name="Notes" sheetId="2" r:id="rId2"/>
          |</sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships>
          |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/sharedStrings.xml" ->
        """<sst><si><t>Region</t></si><si><t>Spend</t></si>
          |<si><r><t>Lon</t></r><r><t>don</t></r></si></sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>12.5</v></c></row>
          |<row><c t="inlineStr"><is><t>York</t></is></c><c r="C3"><v>7</v></c></row>
          |</sheetData></worksheet>""".stripMargin,
      "xl/worksheets/sheet2.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1"><v>note</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    val tmp = Files.createTempFile("fuzz-valid", ".xlsx")
    val zos = new ZipOutputStream(new FileOutputStream(tmp.toFile))
    members.foreach { case (n, content) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val bytes = Files.readAllBytes(tmp)
    Files.deleteIfExists(tmp)
    bytes
  }

  private def withTempFile[T](bytes: Array[Byte])(f: String => T): T = {
    val p = Files.createTempFile("fuzz", ".xlsx")
    try { Files.write(p, bytes); f(p.toString) }
    finally Files.deleteIfExists(p)
  }

  test("XlsxParse: 1000 mutated workbooks through rows/countRows/headerSchema — loud or clean, never an Error") {
    val conf = new Configuration()
    FuzzUtil.fuzz("XlsxParse", Seq(validXlsx()), Cases, Seed) { bytes =>
      withTempFile(bytes) { path =>
        val src = new XlsxParse.ZipSource(path, conf)
        // deepest surface first: full drain resolves every cell ref,
        // shared-string index, and inline string
        val it = XlsxParse.rows(src, sheet = 1)
        try it.foreach(_ => ()) finally it.close()
        XlsxParse.countRows(src, sheet = 1, headerRow = 0)
        XlsxParse.headerSchema(path, headerRow = 0, sheet = 1, conf)
      }
      ()
    }(accept = _ => true)
  }

  test("XlsxParse: a cell ref beyond the XFD grid refuses loudly instead of materializing the schema") {
    val conf = new Configuration()
    // 8 letters overflow Int through colIdx; 5 stay positive but huge —
    // both classes must throw, not build a multi-million-field schema
    for (ref <- Seq("AAAAAAAA1", "ZZZZZ1", "XFE1")) {
      val tmp = Files.createTempFile("fuzz-ref", ".xlsx")
      val zos = new ZipOutputStream(new FileOutputStream(tmp.toFile))
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(
        s"""<worksheet><sheetData>
           |<row r="1"><c r="$ref"><v>h</v></c></row>
           |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
      zos.closeEntry(); zos.close()
      val e = intercept[RuntimeException](
        XlsxParse.headerSchema(tmp.toString, headerRow = 0, sheet = 1, conf))
      assert(e.getMessage.contains("XFD"), s"ref $ref: $e")
      Files.deleteIfExists(tmp)
    }
    // XFD itself (the grid's last column) still resolves
    val tmp = Files.createTempFile("fuzz-xfd", ".xlsx")
    val zos = new ZipOutputStream(new FileOutputStream(tmp.toFile))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(
      """<worksheet><sheetData>
        |<row r="1"><c r="A1"><v>a</v></c><c r="XFD1"><v>z</v></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val schema = XlsxParse.headerSchema(tmp.toString, 0, 1, conf)
    assert(schema.length === 16384 && schema.last.name === "z")
    Files.deleteIfExists(tmp)
  }
}
