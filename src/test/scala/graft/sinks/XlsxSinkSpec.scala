package graft.sinks

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class XlsxSinkSpec extends SparkSpec {
  import spark.implicits._

  test("write -> graft-xlsx read round-trip: escaping, nulls, multi-partition") {
    val dir = Files.createTempDirectory("xlsx-sink").toString + "/out"
    val df = Seq(
      (1L, Some("plain"), Some("ok")),
      (2L, Some("a & b < c > d"), None),          // XML escapes + null cell
      (3L, None, Some("last"))
    ).toDF("id", "payload", "note")
      .select(col("id").cast("string").as("id"), col("payload"), col("note"))
      .repartition(2)
    XlsxSink.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length === 2, "one workbook per non-empty partition")

    val back = spark.read.format("graft-xlsx")
      .load(files.map(_.getPath).toIndexedSeq: _*)
    assert(back.columns.toSeq === Seq("id", "payload", "note"))
    val rows = back.as[(Option[String], Option[String], Option[String])]
      .collect().toSet
    assert(rows === Set(
      (Some("1"), Some("plain"), Some("ok")),
      (Some("2"), Some("a & b < c > d"), None),
      (Some("3"), None, Some("last"))))
    // COUNT(*) pushdown also counts the written files correctly
    assert(back.count() === 3)
  }

  test("colRef produces A1-style letters past column Z") {
    assert(XlsxSink.colRef(0) === "A")
    assert(XlsxSink.colRef(25) === "Z")
    assert(XlsxSink.colRef(26) === "AA")
    assert(XlsxSink.colRef(27 * 26 - 1) === "ZZ")
  }
}
