package graft.sinks

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

import graft.spark.xlsx.SerializableHadoopConf

/** Distributed XLSX writer — the write half of the `graft-xlsx` source
  * (reference: the pipelines READ workbooks via pandas; publishing results
  * back as workbooks is the inverse leg a data team asks for first).
  *
  * One workbook PER PARTITION (`part-NNNNN.xlsx` under `dir`), each task
  * streaming its rows straight into its own zip on the Hadoop FS — no
  * driver staging, no global coordination, and Excel's ~1M-row sheet cap
  * maps naturally onto partition sizing. Header row = column names; every
  * value is written as an inline string (`inlineStr`, XML-escaped) so the
  * file round-trips through the all-string `graft-xlsx` reader and needs
  * no shared-strings table. Nulls become gap cells (absent), matching the
  * reader's sparse-cells contract.
  *
  * Only the standard zip members a conforming consumer needs are emitted:
  * [Content_Types].xml, the two .rels, workbook.xml, sheet1.xml — all
  * fixed public-format boilerplate except the sheet data.
  */
object XlsxSink {

  def write(df: DataFrame, dir: String): Unit = {
    val names = df.schema.fieldNames.toSeq
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val path = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.xlsx")
        val fs = path.getFileSystem(conf.value)
        // attempt-unique temp + rename commit: concurrent speculative /
        // zombie attempts of the same partition can never interleave
        // writes into the final file (a torn zip), and a task that dies
        // mid-write leaves only a .tmp the next attempt ignores
        val tmp = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d-attempt-${tc.taskAttemptId()}.xlsx.tmp")
        val out = new ZipOutputStream(fs.create(tmp, true))
        try {
          writeWorkbook(out, names, rows)
          out.close()
          if (!fs.rename(tmp, path)) {
            // rename refuses an existing target on HDFS: another attempt
            // of this partition already committed identical content
            fs.delete(tmp, false)
            if (!fs.exists(path))
              sys.error(s"xlsx commit failed for partition $pid: " +
                s"rename $tmp -> $path")
          }
        } finally {
          // close is idempotent after success; on the exception path a
          // zip with no finished entries can throw from close itself —
          // never mask the original failure
          try out.close() catch { case _: Exception => () }
          fs.delete(tmp, false)
        }
      }
    }
  }

  /** Excel's hard per-sheet row cap (XLSX format limit, header included):
    * writing past it produces a workbook Excel rejects as corrupt or
    * silently truncates — fail fast instead. */
  private[sinks] val MaxSheetRows = 1048576

  private def writeWorkbook(zos: ZipOutputStream, header: Seq[String],
                            rows: Iterator[Row]): Unit = {
    val wb = new WorkbookStream(zos, header)
    var n = 1L // header
    rows.foreach { r =>
      n += 1
      if (n > MaxSheetRows) throw new IllegalStateException(
        s"xlsx: partition exceeds Excel's $MaxSheetRows-row sheet cap — " +
          "repartition the DataFrame so every partition fits one sheet")
      wb.writeRow((0 until r.length).map(i =>
        Option(r.get(i)).map(_.toString)))
    }
    wb.finish()
  }

  /** 0-based column index -> A1-style column letters. */
  private[sinks] def colRef(ci: Int): String = {
    var i = ci + 1
    val sb = new StringBuilder
    while (i > 0) {
      val rem = (i - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }
}

/** Streams one conforming workbook into an open zip: fixed boilerplate
  * members + the header row up front, then one `<row>` per [[writeRow]]
  * call, `</sheetData>` on [[finish]]. Shared by [[XlsxSink.write]]
  * (foreachPartition) and the `graft-xlsx` DSv2 write path — one
  * format-emitting implementation. */
private[graft] final class WorkbookStream(zos: ZipOutputStream,
                                          header: Seq[String]) {
  import XlsxSink.colRef

  private var rn = 1

  locally {
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    // the sheet streams: header + one <row> per writeRow, inline strings
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    push("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    push("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    writeRow(header.map(Option(_)))
  }

  private def push(s: String): Unit = zos.write(s.getBytes("UTF-8"))

  def writeRow(cells: Seq[Option[String]]): Unit = {
    push(rowXml(rn, cells))
    rn += 1
  }

  def finish(): Unit = {
    push("</sheetData></worksheet>")
    zos.closeEntry()
  }

  private def rowXml(rn: Int, cells: Seq[Option[String]]): String = {
    val sb = new StringBuilder(s"""<row r="$rn">""")
    cells.zipWithIndex.foreach {
      case (Some(v), ci) =>
        sb.append(s"""<c r="${colRef(ci)}$rn" t="inlineStr"><is><t>""")
          .append(escape(v)).append("</t></is></c>")
      case (None, _) => // null -> gap cell, the reader's sparse contract
    }
    sb.append("</row>").toString
  }

  private def escape(s: String): String = {
    // XML 1.0 forbids control chars below 0x20 (except tab/LF/CR) and
    // U+FFFE/U+FFFF even when escaped: one raw control byte from a
    // dirty source row would make the whole workbook unparseable for
    // Excel AND the graft-xlsx reader, so sanitize (drop) them first
    def ok(c: Char): Boolean =
      (c >= 0x20 || c == '\t' || c == '\n' || c == '\r') &&
        c != '\uFFFE' && c != '\uFFFF'
    val clean = if (s.forall(ok)) s else s.filter(ok)
    clean.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  }
}
