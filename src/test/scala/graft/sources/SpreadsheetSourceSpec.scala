package graft.sources

import graft.SparkSpec
import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

class SpreadsheetSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkZip(dir: String, name: String, members: Map[String, String]): String = {
    val zipPath = Paths.get(dir, name)
    val zos = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    members.foreach { case (n, content) =>
      zos.putNextEntry(new ZipEntry(n))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    zipPath.toString
  }

  test("readXlsx: shared strings, header promotion past a title row, gap cells") {
    val dir = Files.createTempDirectory("xlsx").toString
    // row 1 = report title (discarded), row 2 = headers, rows 3-4 = data;
    // B4 missing (gap), C4 present
    val xlsx = mkZip(dir, "report.xlsx", Map(
      "xl/sharedStrings.xml" ->
        """<sst><si><t>DfT report 2024</t></si><si><t>Region Name</t></si>
          |<si><t>Total Spend</t></si><si><t>Notes</t></si><si><t>London</t></si>
          |<si><t>ok</t></si><si><t>Leeds</t></si></sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c><c r="C2" t="s"><v>3</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>12.5</v></c><c r="C3" t="s"><v>5</v></c></row>
          |<row r="4"><c r="A4" t="s"><v>6</v></c><c r="C4"><v>7</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val staging = Files.createTempDirectory("xlsx-staging").toString
    val df = SpreadsheetSource.readXlsx(spark, xlsx, staging, headerRow = 1)
    assert(df.columns.toSeq === Seq("Region Name", "Total Spend", "Notes"))
    val rows = df.as[(Option[String], Option[String], Option[String])].collect().toSeq
    assert(rows === Seq(
      (Some("London"), Some("12.5"), Some("ok")),
      (Some("Leeds"), None, Some("7"))))
    // composes with the reference's column cleaning
    assert(ColumnNormalizer.snakeCase(df).columns.toSeq
      === Seq("region_name", "total_spend", "notes"))
  }

  test("readXlsx: wide columns (AA+) index correctly") {
    val dir = Files.createTempDirectory("xlsx-wide").toString
    val xlsx = mkZip(dir, "wide.xlsx", Map(
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1"><v>h0</v></c><c r="Z1"><v>h25</v></c><c r="AA1"><v>h26</v></c></row>
          |<row r="2"><c r="AA2"><v>42</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val staging = Files.createTempDirectory("xlsx-wide-staging").toString
    val df = SpreadsheetSource.readXlsx(spark, xlsx, staging)
    assert(df.columns.length === 27)
    assert(df.columns(26) === "h26")
    assert(df.select("h26").as[Option[String]].head() === Some("42"))
  }

  test("readXlsx selects the requested worksheet by index") {
    val dir = Files.createTempDirectory("xlsx-sheets").toString
    val xlsx = mkZip(dir, "multi.xlsx", Map(
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1"><v>cover</v></c></row>
          |</sheetData></worksheet>""".stripMargin,
      "xl/worksheets/sheet2.xml" ->
        """<worksheet><sheetData>
          |<row r="1"><c r="A1"><v>id</v></c></row>
          |<row r="2"><c r="A2"><v>7</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val staging = Files.createTempDirectory("xlsx-sheets-staging").toString
    val df = SpreadsheetSource.readXlsx(spark, xlsx, staging, sheet = 2)
    assert(df.columns.toSeq === Seq("id"))
    assert(df.as[Option[String]].head() === Some("7"))
  }

  test("readOds: repeated cells expand, empty runs only position, sheet by name") {
    val dir = Files.createTempDirectory("ods").toString
    val ods = mkZip(dir, "stats.ods", Map(
      "content.xml" ->
        """<office:document-content xmlns:office="urn:o" xmlns:table="urn:t" xmlns:text="urn:x">
          |<office:body><office:spreadsheet>
          |<table:table table:name="Cover">
          |<table:table-row><table:table-cell office:value-type="string"><text:p>ignore me</text:p></table:table-cell></table:table-row>
          |</table:table>
          |<table:table table:name="Data">
          |<table:table-row><table:table-cell office:value-type="string"><text:p>Area</text:p></table:table-cell><table:table-cell office:value-type="string"><text:p>Q1</text:p></table:table-cell><table:table-cell office:value-type="string"><text:p>Q2</text:p></table:table-cell></table:table-row>
          |<table:table-row><table:table-cell office:value-type="string"><text:p>York</text:p></table:table-cell><table:table-cell table:number-columns-repeated="2" office:value-type="float" office:value="5"><text:p>5</text:p></table:table-cell><table:table-cell table:number-columns-repeated="1000"/></table:table-row>
          |<table:table-row><table:table-cell office:value-type="string"><text:p>Bath</text:p></table:table-cell><table:table-cell table:number-columns-repeated="1"/><table:table-cell office:value-type="float" office:value="9.5"><text:p>9.5</text:p></table:table-cell></table:table-row>
          |</table:table>
          |</office:spreadsheet></office:body></office:document-content>""".stripMargin))
    val staging = Files.createTempDirectory("ods-staging").toString
    val df = SpreadsheetSource.readOds(spark, ods, staging,
      headerRow = 0, sheet = Some("Data"))
    assert(df.columns.toSeq === Seq("Area", "Q1", "Q2"))
    val rows = df.as[(Option[String], Option[String], Option[String])].collect().toSeq
    assert(rows === Seq(
      (Some("York"), Some("5"), Some("5")),   // repeated value fills Q1+Q2
      (Some("Bath"), None, Some("9.5"))))     // empty run shifts Q2 into place
  }
}
