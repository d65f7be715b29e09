package graft.spark.xlsx

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class XlsxWriteSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 write: append round-trips through the read path, one file per partition") {
    val dir = Files.createTempDirectory("xlsx-w").toString
    val df = Seq(("London", 12, "a&b"), ("Leeds", 7, "<tag>"), ("York", 3, null))
      .toDF("city", "n", "notes").repartition(2)
    df.write.format("graft-xlsx").mode("append").save(dir)

    // ignore Hadoop LocalFileSystem .crc sidecars — hidden files by contract
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(f => f.startsWith(".") || f.startsWith("_")).sorted
    assert(files.forall(f => f.startsWith("part-") && f.endsWith(".xlsx")))
    assert(files.length === 2, s"expected one workbook per partition: ${files.toSeq}")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_temporary")),
      "temp dir must be gone after commit")

    val back = spark.read.format("graft-xlsx")
      .load(files.map(f => s"$dir/$f"): _*)
    assert(back.columns.toSeq === Seq("city", "n", "notes"))
    val rows = back.as[(String, String, Option[String])].collect().toSet
    // ints stringify; null survives as a gap cell; XML-escaped chars round-trip
    assert(rows === Set(("London", "12", Some("a&b")),
      ("Leeds", "7", Some("<tag>")), ("York", "3", None)))
  }

  test("DSv2 write: overwrite truncates the previous generation") {
    val dir = Files.createTempDirectory("xlsx-w2").toString
    Seq(("old1", 1), ("old2", 2)).toDF("k", "v").repartition(4)
      .write.format("graft-xlsx").mode("append").save(dir)
    val before = new java.io.File(dir).listFiles().length
    assert(before >= 2)

    Seq(("new", 9)).toDF("k", "v").coalesce(1)
      .write.format("graft-xlsx").mode("overwrite").save(dir)
    val after = new java.io.File(dir).listFiles().map(_.getName)
    assert(after.count(_.endsWith(".xlsx")) === 1,
      s"stale part files survived overwrite: ${after.toSeq}")
    val back = spark.read.format("graft-xlsx").load(s"$dir/${after.head}")
      .as[(String, String)].collect().toSet
    assert(back === Set(("new", "9")))
  }

  test("DSv2 write: empty partitions emit no file; typed values render externally") {
    val dir = Files.createTempDirectory("xlsx-w3").toString
    val df = Seq((java.sql.Date.valueOf("2024-03-01"), BigDecimal("1.50")))
      .toDF("d", "amt").select(col("d"), col("amt").cast("decimal(5,2)"))
      .repartition(8)
    df.write.format("graft-xlsx").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.count(_.endsWith(".xlsx")) === 1,
      "7 empty partitions must not emit workbooks")
    val back = spark.read.format("graft-xlsx").load(s"$dir/${files.head}")
      .as[(String, String)].collect().toSet
    // Catalyst-to-Scala conversion, not raw internal ints/longs
    assert(back === Set(("2024-03-01", "1.50")))
  }
}
