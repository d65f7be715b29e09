package graft.spark.xlsx

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

class XlsxDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkZip(dir: String, name: String, members: Map[String, String]): String = {
    val zipPath = Paths.get(dir, name)
    val zos = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    members.foreach { case (entry, content) =>
      zos.putNextEntry(new ZipEntry(entry))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    zipPath.toString
  }

  private def workbook(dir: String, name: String, city: String, spend: String): String =
    mkZip(dir, name, Map(
      "xl/sharedStrings.xml" ->
        s"""<sst><si><t>Title</t></si><si><t>Region Name</t></si>
           |<si><t>Total Spend</t></si><si><t>Notes</t></si>
           |<si><r><t>$city</t></r><r><t> City</t></r></si><si><t>ok</t></si></sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<worksheet><sheetData>
           |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
           |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c><c r="C2" t="s"><v>3</v></c></row>
           |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3"><v>$spend</v></c><c r="C3" t="s"><v>5</v></c></row>
           |<row r="4"><c r="A4" t="inlineStr"><is><t>inline</t></is></c><c r="C4"><v>7</v></c></row>
           |</sheetData></worksheet>""".stripMargin))

  test("format(graft-xlsx): header promotion, shared strings, rich text, inline strings, gaps") {
    val dir = Files.createTempDirectory("dsv2-xlsx").toString
    val f = workbook(dir, "a.xlsx", "London", "12.5")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f)
    assert(df.columns.toSeq === Seq("Region Name", "Total Spend", "Notes"))
    val rows = df.as[(Option[String], Option[String], Option[String])]
      .collect().toSet
    assert(rows === Set(
      (Some("London City"), Some("12.5"), Some("ok")), // rich-text runs concat
      (Some("inline"), None, Some("7"))))              // inlineStr + B4 gap
  }

  test("one input partition per file; multi-file load unions rows") {
    val dir = Files.createTempDirectory("dsv2-xlsx-multi").toString
    val f1 = workbook(dir, "jan.xlsx", "London", "1")
    val f2 = workbook(dir, "feb.xlsx", "Leeds", "2")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f1, f2)
    assert(df.rdd.getNumPartitions === 2)
    val cities = df.select("Region Name").as[String].collect().toSet
    assert(cities === Set("London City", "Leeds City", "inline"))
    assert(df.count() === 4) // empty projection path (count(*)) works
  }

  test("a user schema that reorders or subsets columns binds by NAME to the sheet header") {
    val dir = Files.createTempDirectory("dsv2-xlsx-user").toString
    val f = workbook(dir, "a.xlsx", "London", "12.5")
    // reversed order + a subset: positional binding would read 'Total
    // Spend' from cell 0 and 'Region Name' from cell 1 — silently wrong
    val df = spark.read.format("graft-xlsx").option("headerRow", 1)
      .schema("`Total Spend` STRING, `Region Name` STRING").load(f)
    val rows = df.as[(Option[String], Option[String])].collect().toSet
    assert(rows === Set(
      (Some("12.5"), Some("London City")), (None, Some("inline"))))
    // a name that is not in the sheet header fails loudly, not silently-null
    val e = intercept[Exception] {
      spark.read.format("graft-xlsx").option("headerRow", 1)
        .schema("`No Such Column` STRING").load(f).collect()
    }
    assert(e.getMessage.contains("No Such Column"))
  }

  test("multi-file header drift fails loudly instead of misaligning columns") {
    val dir = Files.createTempDirectory("dsv2-xlsx-drift").toString
    val f1 = workbook(dir, "jan.xlsx", "London", "1")
    // feb.xlsx renames the second header cell: its values must not land
    // under 'Total Spend'
    val f2 = mkZip(dir, "feb.xlsx", Map(
      "xl/sharedStrings.xml" ->
        """<sst><si><t>Region Name</t></si><si><t>Spend GBP</t></si>
          |<si><t>Notes</t></si><si><t>Leeds</t></si></sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="s"><v>1</v></c><c r="C2" t="s"><v>2</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>9</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    val e = intercept[Exception] {
      spark.read.format("graft-xlsx").option("headerRow", 1)
        .load(f1, f2).collect()
    }
    assert(e.getMessage.contains("header drift") ||
      Option(e.getCause).exists(_.getMessage.contains("header drift")),
      s"got: $e")
  }

  test("scan reports size statistics from the archive bytes") {
    val dir = Files.createTempDirectory("dsv2-xlsx-stats").toString
    val f = workbook(dir, "a.xlsx", "London", "12.5")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[XlsxScan]
    val stats = scan.estimateStatistics()
    assert(stats.sizeInBytes().isPresent)
    assert(stats.sizeInBytes().getAsLong ===
      new java.io.File(f).length() * 5)
  }

  test("a vanished workbook fails size statistics loudly instead of undercounting") {
    val dir = Files.createTempDirectory("dsv2-xlsx-stats-gone").toString
    val f1 = workbook(dir, "a.xlsx", "London", "1")
    val f2 = workbook(dir, "b.xlsx", "Leeds", "2")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f1, f2)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[XlsxScan]
    // the file disappears between planning and the statistics ask: a
    // silent 0-byte contribution could flip a broadcast decision, so the
    // estimate must fail like the scan itself will (copy() because the
    // planned scan may have memoized its size during plan construction)
    assert(new java.io.File(f2).delete())
    intercept[java.io.FileNotFoundException](
      scan.copy().estimateStatistics().sizeInBytes())
  }

  test("COUNT(*) enforces the same header-drift contract as the column scan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("dsv2-xlsx-cnt-drift").toString
    val f1 = workbook(dir, "jan.xlsx", "London", "1")
    val f2 = mkZip(dir, "feb.xlsx", Map(
      "xl/sharedStrings.xml" ->
        """<sst><si><t>Region Name</t></si><si><t>Spend GBP</t></si>
          |<si><t>Notes</t></si><si><t>Leeds</t></si></sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet><sheetData>
          |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="s"><v>1</v></c><c r="C2" t="s"><v>2</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>9</v></c></row>
          |</sheetData></worksheet>""".stripMargin))
    // SELECT * errors on the drifted folder, so SELECT COUNT(*) must too
    // — the two plans agreeing is the point of threading the header in
    val e = intercept[Exception] {
      spark.read.format("graft-xlsx").option("headerRow", 1)
        .load(f1, f2).agg(count(lit(1))).head()
    }
    assert(e.getMessage.contains("header drift") ||
      Option(e.getCause).exists(_.getMessage.contains("header drift")),
      s"got: $e")
  }

  test("an EMPTY sheet counts as 0 in both plans (no false header-drift error)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("dsv2-xlsx-empty").toString
    val f1 = workbook(dir, "jan.xlsx", "London", "1")
    val fEmpty = mkZip(dir, "feb.xlsx", Map(
      "xl/sharedStrings.xml" -> "<sst></sst>",
      "xl/worksheets/sheet1.xml" ->
        "<worksheet><sheetData></sheetData></worksheet>"))
    val df = spark.read.format("graft-xlsx").option("headerRow", 1)
      .load(f1, fEmpty)
    // the column scan accepts the empty month (0 rows), so COUNT(*)
    // must too — the header validation only errors when DATA exists
    // without a header
    assert(df.count() === 2L)
    assert(df.agg(count(lit(1))).head().getLong(0) === 2L)
  }

  test("COUNT(*) pushes into the scan; grouped aggregates do not") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("dsv2-xlsx-agg").toString
    val f1 = workbook(dir, "a.xlsx", "London", "1")
    val f2 = workbook(dir, "b.xlsx", "Leeds", "2")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f1, f2)
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    // pushdown happens in the optimizer (V2ScanRelationPushDown): the
    // optimized plan's scan relation carries the chosen Scan, AQE-proof
    val agg = df.agg(count(lit(1)))
    val scan = agg.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.get
    // the count scan never loads shared strings or decodes a cell
    assert(scan.isInstanceOf[XlsxCountScan], scan.description())
    assert(agg.head().getLong(0) === 4L) // partials (2 + 2) merged by Spark
    // with a GROUP BY the pushdown must decline: full row scan
    val grouped = df.groupBy(col("Notes")).count()
    val gScan = grouped.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.scan
    }.get
    assert(gScan.isInstanceOf[XlsxScan])
    assert(grouped.collect().map(_.getLong(1)).sum === 4L)
  }

  test("equality filter pushes into the cell parse; rows drop pre-materialization") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("dsv2-xlsx-filter").toString
    val f1 = workbook(dir, "jan.xlsx", "London", "1")
    val f2 = workbook(dir, "feb.xlsx", "Leeds", "2")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1)
      .load(f1, f2)
      .where(col("Region Name") === "Leeds City")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get.asInstanceOf[XlsxScan]
    // the scan carries the equality + the implied IsNotNull
    assert(scan.cellFilters.contains((0, "Leeds City")),
      s"equality not pushed: ${scan.cellFilters}")
    assert(scan.description().contains("EqualTo(Region Name,Leeds City)"))
    // reader-level drop: the scan's own iterator yields only matches
    val reader = scan.createReaderFactory()
      .createReader(XlsxInputPartition(f2))
    var n = 0
    while (reader.next()) n += 1
    assert(n === 1, "non-matching rows must drop inside the parse")
    // end-to-end result stays exact (Spark re-checks residual filters)
    val rows = df.select("Region Name", "Total Spend")
      .as[(String, String)].collect().toSeq
    assert(rows === Seq(("Leeds City", "2")))
  }

  test("column pruning reaches the scan") {
    val dir = Files.createTempDirectory("dsv2-xlsx-prune").toString
    val f = workbook(dir, "a.xlsx", "London", "12.5")
    val df = spark.read.format("graft-xlsx").option("headerRow", 1).load(f)
      .select("Notes")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }
    assert(scan.map(_.fieldNames.toSeq) === Some(Seq("Notes")))
    assert(df.as[String].collect().toSet === Set("ok", "7"))
  }
}
