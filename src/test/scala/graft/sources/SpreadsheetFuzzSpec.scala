package graft.sources

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.{FuzzUtil, SparkSpec}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Adversarial passes over the Spark-plan spreadsheet/XML readers
  * (SpreadsheetSource.readXlsx/readOds, XmlSource) and a drift-property
  * sweep over CsvBundle.unionHarmonized. These drive full Spark jobs per
  * case, so the byte-fuzz budgets are smaller than the pure-JVM readers'
  * 1000 (the positioning logic is Catalyst expressions — the hazard
  * surface is the repeat-count fanout and the header materialization,
  * covered by targeted adversarial cases below). Contract as everywhere:
  * clean result or loud Exception; never a JVM Error, unbounded
  * allocation, or hang. */
class SpreadsheetFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 0xB16016L

  private def mkZip(members: Seq[(String, String)]): Array[Byte] = {
    val tmp = Files.createTempFile("sfuzz", ".zip")
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

  private def withTempFile[T](bytes: Array[Byte], suffix: String)(
      f: String => T): T = {
    val p = Files.createTempFile("sfuzz", suffix)
    try { Files.write(p, bytes); f(p.toString) }
    finally Files.deleteIfExists(p)
  }

  private def validXlsx(): Array[Byte] = mkZip(Seq(
    "xl/sharedStrings.xml" ->
      "<sst><si><t>Region</t></si><si><t>Spend</t></si><si><t>London</t></si></sst>",
    "xl/worksheets/sheet1.xml" ->
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>12.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin))

  private def odsContent(colRep: String, rowRep: String): String =
    s"""<office:document-content xmlns:office="urn:o" xmlns:table="urn:t" xmlns:text="urn:x">
       |<office:body><office:spreadsheet>
       |<table:table table:name="Data">
       |<table:table-row><table:table-cell office:value-type="string"><text:p>Area</text:p></table:table-cell><table:table-cell office:value-type="string"><text:p>Q1</text:p></table:table-cell></table:table-row>
       |<table:table-row table:number-rows-repeated="$rowRep"><table:table-cell office:value-type="string"><text:p>York</text:p></table:table-cell><table:table-cell table:number-columns-repeated="$colRep" office:value-type="float" office:value="5"><text:p>5</text:p></table:table-cell></table:table-row>
       |</table:table>
       |</office:spreadsheet></office:body></office:document-content>""".stripMargin

  private def validOds(): Array[Byte] =
    mkZip(Seq("content.xml" -> odsContent("2", "1")))

  test("readXlsx: 120 mutated archives — loud or clean, never an Error") {
    val staging = Files.createTempDirectory("xfuzz-stage").toString
    var n = 0
    FuzzUtil.fuzz("readXlsx", Seq(validXlsx()), 120, Seed) { bytes =>
      n += 1
      withTempFile(bytes, ".xlsx") { path =>
        SpreadsheetSource.readXlsx(spark, path, s"$staging/$n").collect()
      }
      ()
    }(accept = _ => true)
  }

  test("readOds: 120 mutated archives — loud or clean, never an Error") {
    val staging = Files.createTempDirectory("ofuzz-stage").toString
    var n = 0
    FuzzUtil.fuzz("readOds", Seq(validOds()), 120, Seed + 1) { bytes =>
      n += 1
      withTempFile(bytes, ".ods") { path =>
        SpreadsheetSource.readOds(spark, path, s"$staging/$n").collect()
      }
      ()
    }(accept = _ => true)
  }

  test("readOds: hostile repeat counts refuse loudly instead of exploding the grid") {
    val staging = Files.createTempDirectory("ods-hostile").toString
    // a billion-wide non-empty column run / row run, a zero repeat, and
    // a negative repeat: each must throw the graft-ods grid error (via
    // raise_error inside the plan), never attempt the fanout — and the
    // zero/negative cases must never count DOWNWARD through `sequence`
    val hostile = Seq(
      ("1000000000", "1"), ("2", "1000000000"), ("0", "1"), ("2", "-3"))
    hostile.zipWithIndex.foreach { case ((colRep, rowRep), i) =>
      withTempFile(mkZip(Seq("content.xml" -> odsContent(colRep, rowRep))),
          ".ods") { path =>
        val e = intercept[Exception](
          SpreadsheetSource.readOds(spark, path, s"$staging/$i").collect())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("graft-ods")),
          s"case ($colRep, $rowRep): $e")
      }
    }
    // a negative repeat on an EMPTY row run never explodes, but it would
    // silently shift every later row's number BACKWARD through the
    // cumulative sum (review-found: the cap check sits after the
    // empty-run filter) — it must refuse too, not corrupt row numbering
    val emptyNeg = odsContent("2", "1").replace(
      "<table:table-row table:number-rows-repeated=\"1\">",
      "<table:table-row table:number-rows-repeated=\"-7\"/>" +
        "<table:table-row>")
    withTempFile(mkZip(Seq("content.xml" -> emptyNeg)), ".ods") { path =>
      val e = intercept[Exception](
        SpreadsheetSource.readOds(spark, path, s"$staging/eneg").collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("not positive")), s"$e")
    }
    // the format's real padding idiom — TRAILING empty runs out to the
    // 16384-column edge — still reads (empty runs are filtered before
    // the cumulative-grid check, so padding costs nothing and the sheet
    // stays exactly grid-sized: 1 + 2 + 16381 = 16384)
    val okContent = odsContent("2", "1").replace(
      "</table:table-cell></table:table-row>\n</table:table>",
      "</table:table-cell>" +
        "<table:table-cell table:number-columns-repeated=\"16381\"/>" +
        "</table:table-row>\n</table:table>")
    withTempFile(mkZip(Seq("content.xml" -> okContent)), ".ods") { path =>
      val df = SpreadsheetSource.readOds(spark, path, s"$staging/ok")
      assert(df.columns.take(2).toSeq === Seq("Area", "Q1"))
    }
    // CUMULATIVE grid overflow: each run is inside the per-run cap, but
    // together they leave the sheet — a per-run check alone would explode
    // runs x cap rows (review-found). Columns: a leading EMPTY 16384-run
    // positions the per-run-legal rep=2 cell at columns 16384-16385;
    // rows: two 600k non-empty runs end past row 2^20.
    val colOverflow = odsContent("2", "1").replace(
      "<table:table-cell table:number-columns-repeated=\"2\"",
      "<table:table-cell table:number-columns-repeated=\"16384\"/>" +
        "<table:table-cell table:number-columns-repeated=\"2\"")
    val rowOverflow = odsContent("2", "600000").replace(
      "<table:table-row table:number-rows-repeated=\"600000\">",
      "<table:table-row table:number-rows-repeated=\"600000\">" +
        "<table:table-cell office:value-type=\"string\">" +
        "<text:p>pad</text:p></table:table-cell></table:table-row>" +
        "<table:table-row table:number-rows-repeated=\"600000\">")
    Seq("colof" -> colOverflow, "rowof" -> rowOverflow).foreach {
      case (tag, content) =>
        withTempFile(mkZip(Seq("content.xml" -> content)), ".ods") { path =>
          val e = intercept[Exception](
            SpreadsheetSource.readOds(spark, path, s"$staging/$tag").collect())
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Nil
            else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          assert(msgs(e).exists(m => m.contains("graft-ods") &&
            m.contains("cumulative")), s"$tag: $e")
        }
    }
  }

  test("XmlSource: 150 mutated row-tagged documents — loud or clean, never an Error") {
    val valid =
      """<rows>
        |<rec><id>1</id><name>alpha</name></rec>
        |<rec><id>2</id><name>beta</name></rec>
        |</rows>""".stripMargin.getBytes("UTF-8")
    val schema = StructType(Seq(StructField("id", StringType),
      StructField("name", StringType)))
    FuzzUtil.fuzz("XmlSource", Seq(valid), 150, Seed + 2) { bytes =>
      withTempFile(bytes, ".xml") { path =>
        XmlSource.read(spark, path, "rec", Some(schema)).collect()
        // and the inference path (no schema): exercises Spark XML's
        // sampling pass over the same mutated bytes
        XmlSource.read(spark, path, "rec").collect()
      }
      ()
    }(accept = _ => true)
  }

  test("CsvBundle.unionHarmonized: random column drift — missing columns null-pad, full set survives") {
    val r = new scala.util.Random(Seed)
    val allCols = Vector("a", "b", "c", "d", "e")
    (0 until 30).foreach { _ =>
      // 2-4 frames, each a random non-empty subset of columns in a
      // random order, 1-3 rows of distinctive values
      val frames = (0 until 2 + r.nextInt(3)).map { fi =>
        val cols = r.shuffle(allCols).take(1 + r.nextInt(allCols.size))
        val rows = (0 until 1 + r.nextInt(3)).map(ri =>
          cols.map(c => s"$c-$fi-$ri"))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(
            vs => org.apache.spark.sql.Row(vs: _*))),
          StructType(cols.map(c => StructField(c, StringType))))
      }
      val u = CsvBundle.unionHarmonized(frames)
      // output column set == union of inputs' sets
      assert(u.columns.toSet === frames.flatMap(_.columns).toSet)
      // every input row survives with its values under the right names
      // and nulls exactly in its missing columns
      val got = u.collect().map(row =>
        u.columns.zipWithIndex.map { case (c, i) =>
          c -> Option(row.get(i)).map(_.toString)
        }.toMap).toSeq
      val want = frames.flatMap { f =>
        val have = f.columns.toSet
        f.collect().map(row =>
          u.columns.map { c =>
            c -> (if (have(c)) Option(row.getAs[String](c)) else None)
          }.toMap)
      }
      assert(got.sortBy(_.toString) === want.sortBy(_.toString))
    }
  }
}
