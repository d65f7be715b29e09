package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned with dynamic overwrite replaces only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("psink").toString
    val v1 = Seq((1L, "2024-01", 10.0), (2L, "2024-02", 20.0)).toDF("id", "month", "v")
    ParquetSink.writePartitioned(v1, dir, Seq("month"))
    // re-run "the January pipeline" with corrected data
    val fix = Seq((3L, "2024-01", 99.0)).toDF("id", "month", "v")
    ParquetSink.writePartitioned(fix, dir, Seq("month"))
    val out = spark.read.parquet(dir).select("id", "month")
      .as[(Long, String)].collect().toSet
    // January replaced (id 1 gone, 3 present); February untouched
    assert(out === Set((3L, "2024-01"), (2L, "2024-02")))
  }

  test("compactPartitioned merges small files, preserves data, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("psink3").toString
    // simulate many incremental appends: 6 small files per month
    val rows = (1 to 60).map(i => (i.toLong, if (i % 2 == 0) "2024-01" else "2024-02", i * 1.0))
    ParquetSink.writePartitioned(rows.toDF("id", "month", "v").repartition(6), dir, Seq("month"))
    def filesPerMonth: Map[String, Long] = {
      import java.nio.file._
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("month="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala.count(_.toString.endsWith(".parquet")).toLong)
        .toMap
    }
    val before = filesPerMonth
    assert(before.values.forall(_ >= 6))
    ParquetSink.compactPartitioned(spark, dir, Seq("month"), targetFileMB = 512)
    val after = filesPerMonth
    assert(after.values.forall(_ <= 2), s"still fragmented: $after")
    val back = spark.read.parquet(dir)
    assert(back.count() === 60)
    assert(back.agg(sum("v")).as[Double].head() === (1 to 60).map(_ * 1.0).sum)
    // second pass is a no-op shape-wise
    ParquetSink.compactPartitioned(spark, dir, Seq("month"), targetFileMB = 512)
    assert(spark.read.parquet(dir).count() === 60)
  }

  test("partitioned layout enables partition pruning in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("psink2").toString
    ParquetSink.writePartitioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "part"), dir, Seq("part"))
    val plan = spark.read.parquet(dir).where(col("part") === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"))
  }
}
