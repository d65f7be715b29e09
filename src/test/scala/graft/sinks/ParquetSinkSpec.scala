package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

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

  test("partitioned layout enables partition pruning in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("psink2").toString
    ParquetSink.writePartitioned(
      Seq((1L, "a"), (2L, "b")).toDF("id", "part"), dir, Seq("part"))
    val plan = spark.read.parquet(dir).where(col("part") === "a")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"))
  }
}
