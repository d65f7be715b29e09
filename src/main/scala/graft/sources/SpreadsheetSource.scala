package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spreadsheet ingestion without any spreadsheet library: XLSX and ODS are
  * ZIPs of XML, so the read path is [[Fetch.unzip]] + Spark's native XML
  * source + relational reshaping — closing the reference's `pd.read_excel`
  * surface (reference: src/data_processors/dft_road_stats.py:61 reads DfT
  * .ods sheets with `header=6`-style header promotion, then snake-cases
  * columns; geoplace_swa.py reads .xls).
  *
  * Semantics mirror the reference's pandas usage: pick a sheet, promote a
  * (possibly non-first) row to column headers, emit every value as STRING
  * (`df.astype(str)` in the reference) — typing is downstream work for
  * SchemaValidator / casts. Legacy binary .xls is covered by
  * [[BiffReader.readXls]] (native BIFF8 decoder over the same CFB
  * container); password-protected modern workbooks by
  * [[readEncryptedXlsx]].
  *
  * Scale note: one spreadsheet is one driver-side unzip (sheets are small
  * by construction — Excel caps at ~1M rows); the PARSE of the extracted
  * XML is a distributed Spark scan, and many-file ingestion parallelizes
  * per file like every other staged source.
  */
object SpreadsheetSource {

  // ---- xlsx ----------------------------------------------------------

  private val xlsxRowSchema = StructType(Seq(
    StructField("_r", LongType),
    StructField("c", ArrayType(StructType(Seq(
      StructField("_r", StringType),   // "A1" cell ref
      StructField("_t", StringType),   // "s" = shared string, "inlineStr"
      StructField("v", StringType),
      // inline strings (streaming writers): value in <is><t>, no <v>
      StructField("is", StructType(Seq(StructField("t", StringType))))))))))

  private val sstSchema = StructType(Seq(
    StructField("si", ArrayType(StructType(Seq(
      StructField("t", StringType),
      // rich-text entries carry runs <r><t>..</t></r> and no direct <t>
      StructField("r", ArrayType(StructType(Seq(StructField("t", StringType)))))))))))

  /** "AB7" -> 0-based column index (base-26 letters). */
  private def colIdx(ref: Column): Column =
    aggregate(
      filter(split(regexp_extract(ref, "^([A-Z]+)", 1), ""), ch => ch =!= ""),
      lit(0), (acc, ch) => acc * 26 + (ascii(ch) - 64)) - 1

  /** Read one worksheet of an .xlsx archive. `headerRow` is the 0-based
    * row promoted to column names (pandas `header=`); rows above it are
    * discarded (title/preamble rows, as in the DfT files). */
  def readXlsx(spark: SparkSession, xlsxPath: String, stagingDir: String,
               headerRow: Int = 0, sheet: Int = 1): DataFrame = {
    val members = Fetch.unzip(xlsxPath, stagingDir)
    val sheetXml = members.find(_.endsWith(s"sheet$sheet.xml")).getOrElse(
      sys.error(s"no worksheet sheet$sheet.xml in $xlsxPath"))
    val rows = spark.read.format("xml").option("rowTag", "row")
      .schema(xlsxRowSchema).load(sheetXml)
    val raw = rows.select((col("_r") - 1).as("rn"), explode(col("c")).as("cell"))
      .select(col("rn"), colIdx(col("cell._r")).as("ci"),
        col("cell._t").as("t"),
        // inline-string cells carry their text in is.t, not v
        when(col("cell._t") === "inlineStr", col("cell.is.t"))
          .otherwise(col("cell.v")).as("v"))
    val resolved = members.find(_.endsWith("sharedStrings.xml")) match {
      case Some(ssPath) =>
        // sst read as ONE row so posexplode yields stable string indices
        val ss = spark.read.format("xml").option("rowTag", "sst")
          .schema(sstSchema).load(ssPath)
          .select(posexplode(col("si")).as(Seq("si_idx", "si")))
          // rich-text entries (formatted runs) have no direct <t>:
          // concatenate the runs' texts, like every mainstream reader
          .select(col("si_idx"),
            coalesce(col("si.t"),
              array_join(transform(col("si.r"), r => r("t")), "")).as("s"))
        // cast only shared-string refs: ANSI cast would throw on "12.5"
        raw.join(broadcast(ss),
            when(raw("t") === "s", raw("v")).cast("int") === ss("si_idx"), "left")
          .select(col("rn"), col("ci"),
            when(col("t") === "s", col("s")).otherwise(col("v")).as("value"))
      case None => raw.select(col("rn"), col("ci"), col("v").as("value"))
    }
    promote(resolved, headerRow)
  }

  /** Read a password-protected (ECMA-376 agile-encrypted) .xlsx — the
    * reference's GeoPlace SWA path (geoplace_swa.py:64-69, msoffcrypto +
    * read_excel). Decrypts the OLE2 container to the plain ZIP package
    * (see [[OfficeCrypto]]), then the ordinary [[readXlsx]] scan. */
  def readEncryptedXlsx(spark: SparkSession, encPath: String, password: String,
                        stagingDir: String, headerRow: Int = 0,
                        sheet: Int = 1): DataFrame = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stagingDir))
    val dec = OfficeCrypto.decryptToFile(encPath, password,
      s"$stagingDir/decrypted.xlsx")
    readXlsx(spark, dec, s"$stagingDir/unzipped", headerRow, sheet)
  }

  // ---- ods -----------------------------------------------------------

  private val odsCellSchema = StructType(Seq(
    StructField("_office:value", StringType),
    StructField("_office:value-type", StringType),
    StructField("_table:number-columns-repeated", LongType),
    StructField("text:p", StringType)))
  private val odsTableSchema = StructType(Seq(
    StructField("_table:name", StringType),
    StructField("table:table-row", ArrayType(StructType(Seq(
      StructField("_table:number-rows-repeated", LongType),
      StructField("table:table-cell", ArrayType(odsCellSchema))))))))

  /** Read one sheet of an .ods archive (content.xml). Handles the format's
    * `number-columns-repeated` run-length cells: positions come from a
    * cumulative repeat sum, and only NON-EMPTY repeated cells expand — so
    * the trailing "1000 empty columns" padding real ODS writers emit costs
    * nothing. `number-rows-repeated` gets the same treatment (real
    * writers emit it for blank preamble runs — ignoring it would shift
    * every later row index and break headerRow promotion).
    *
    * LIMITATION: horizontally merged cells are not position-corrected —
    * `<table:covered-table-cell>` placeholders are separate sibling
    * elements whose interleaving order with table-cells the XML source
    * cannot preserve; cells right of a merge land `span-1` columns
    * early. Unmerge in the source or use the xlsx export. */
  def readOds(spark: SparkSession, odsPath: String, stagingDir: String,
              headerRow: Int = 0, sheet: Option[String] = None): DataFrame = {
    val members = Fetch.unzip(odsPath, stagingDir)
    val content = members.find(_.endsWith("content.xml")).getOrElse(
      sys.error(s"no content.xml in $odsPath"))
    val tables = spark.read.format("xml").option("rowTag", "table:table")
      .schema(odsTableSchema).load(content)
    val t = sheet.fold(tables.limit(1))(n => tables.where(col("`_table:name`") === n))
    // row numbering via cumulative rows-repeated (one spreadsheet: the
    // unpartitioned window is over one sheet's row elements, driver-scale
    // by construction like promote's header collect)
    val wr = Window.orderBy("rpos")
    // repeat counts on NON-EMPTY runs become explode fanout: a crafted
    // (or corrupt) repeat of 10^9 would materialize a billion-element
    // sequence per cell — refuse anything outside the spreadsheet grid
    // (LibreOffice's 2^20 rows x 16384 columns) LOUDLY before exploding.
    // Empty runs only advance positions (filtered before the explode),
    // so real writers' "repeat 16384 empty columns" padding still
    // costs nothing. Non-positive repeats would make `sequence` count
    // DOWNWARD (silent row/column corruption) — same loud refusal.
    def checkedRep(rep: Column, cap: Long, what: String): Column =
      when(rep >= 1L && rep <= cap, rep)
        .otherwise(raise_error(concat(
          lit(s"graft-ods: $what repeat count "), rep.cast("string"),
          lit(s" outside the 1..$cap grid"))))
    val rows = t
      .select(posexplode(col("`table:table-row`")).as(Seq("rpos", "r")))
      .select(col("rpos"),
        coalesce(col("r").getField("_table:number-rows-repeated"), lit(1L)).as("rrep"),
        col("r").getField("table:table-cell").as("cs"))
      // non-positive row repeats are invalid on ANY run — an EMPTY run's
      // negative repeat would silently shift every later row's rn0
      // BACKWARD through the cumulative sum (rows land at or before the
      // header row and vanish), so this check runs BEFORE the window and
      // the empty-run filter; the grid cap applies only to runs that
      // actually explode (below)
      .withColumn("rrep",
        when(col("rrep") >= 1L, col("rrep"))
          .otherwise(raise_error(concat(
            lit("graft-ods: row repeat count "), col("rrep").cast("string"),
            lit(" is not positive")))))
      .withColumn("rn0", sum(col("rrep")).over(wr) - col("rrep"))
      .where(col("cs").isNotNull) // empty repeated row runs only advance rn
      .withColumn("rrep", checkedRep(col("rrep"), 1L << 20, "row"))
      // the per-run cap alone is not a grid guarantee: many non-empty
      // runs each under 2^20 still explode runs x 2^20 rows in total —
      // the CUMULATIVE end index must also sit inside the grid, exactly
      // like a real sheet (LibreOffice refuses files past row 2^20)
      .withColumn("rn0",
        when(col("rn0") + col("rrep") - 1 <= (1L << 20) - 1, col("rn0"))
          .otherwise(raise_error(concat(
            lit("graft-ods: cumulative row index "),
            (col("rn0") + col("rrep") - 1).cast("string"),
            lit(s" outside the 0..${(1L << 20) - 1} grid")))))
      .select(explode(sequence(col("rn0"), col("rn0") + col("rrep") - 1)).as("rn"),
        col("cs"))
    val cells = rows
      .select(col("rn"), posexplode(col("cs")).as(Seq("pos", "cell")))
      .select(col("rn"), col("pos"),
        coalesce(col("cell").getField("_table:number-columns-repeated"), lit(1L)).as("rep"),
        when(col("cell").getField("_office:value-type") === "float",
            col("cell").getField("_office:value"))
          .otherwise(col("cell").getField("text:p")).as("value"))
      .withColumn("rep", checkedRep(col("rep"), 16384L, "column"))
    val w = Window.partitionBy("rn").orderBy("pos")
    val positioned = cells
      .withColumn("ci0", sum(col("rep")).over(w) - col("rep"))
      .where(col("value").isNotNull) // empty runs position later cells, nothing more
      // same cumulative-grid rule as rows: runs x 16384 per-run-legal
      // repeats must still land inside the 16384-column sheet
      .withColumn("ci0",
        when(col("ci0") + col("rep") - 1 <= 16383L, col("ci0"))
          .otherwise(raise_error(concat(
            lit("graft-ods: cumulative column index "),
            (col("ci0") + col("rep") - 1).cast("string"),
            lit(" outside the 0..16383 grid")))))
      .select(col("rn"),
        explode(sequence(col("ci0"), col("ci0") + col("rep") - 1)).as("ci"),
        col("value"))
    promote(positioned, headerRow)
  }

  // ---- shared --------------------------------------------------------

  /** Promote row `headerRow` (0-based `rn`) to column names; later rows
    * become data. The header collect is one spreadsheet row — driver-side
    * by design, exactly like pandas `header=N`. */
  private[sources] def promote(rawCells: DataFrame, headerRow: Int): DataFrame = {
    val cells = rawCells.select(
      col("rn"), col("ci").cast("int").as("ci"), col("value"))
    val hdr = cells.where(col("rn") === headerRow)
      .select(col("ci"), col("value")).collect()
      .map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    require(hdr.nonEmpty, s"header row $headerRow is empty")
    // a corrupt cell ref can resolve to a huge-but-positive column index;
    // materializing that many output columns is an OOM, not a schema
    require(hdr.keys.max <= 16383,
      s"header cell index ${hdr.keys.max} is beyond the 16384-column grid")
    val nCols = hdr.keys.max + 1
    val data = cells.where(col("rn") > headerRow)
      .groupBy("rn")
      .agg(map_from_entries(collect_list(struct(col("ci"), col("value")))).as("m"))
    // styled-but-empty header cells (value null) fall back to col_N
    // instead of .as(null) NPE-ing the plan; duplicate headers (two
    // "Total" columns — ubiquitous in stats releases) get _2/_3 suffixes
    // so downstream by-name references aren't ambiguous
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val outCols = (0 until nCols).map { i =>
      val base = hdr.getOrElse(i, None).filter(_.nonEmpty).getOrElse(s"col_$i")
      val n = seen.getOrElse(base, 0) + 1
      seen(base) = n
      col("m").getItem(i).as(if (n == 1) base else s"${base}_$n")
    }
    data.orderBy("rn").select(outCols: _*)
  }
}
