package graft.sources

import graft.SparkSpec
import graft.sinks.ParquetSink
import org.apache.spark.sql.functions._

class MonthlyTablesSpec extends SparkSpec {
  import spark.implicits._

  test("month-partitioned layout replaces the generated UNION ALL, with pruning") {
    val root = java.nio.file.Files.createTempDirectory("monthly").toString
    val rows = Seq(
      ("2024-01", 1, 10.0), ("2024-01", 2, 20.0),
      ("2024-02", 3, 30.0), ("2024-03", 4, 40.0), ("2024-04", 5, 50.0))
      .toDF("month", "id", "v")
    ParquetSink.writePartitioned(rows.coalesce(1), root, Seq("month")) // 1 file/month

    val q1 = MonthlyTables.readMonths(spark, root, "2024-01", "2024-02")
    assert(q1.count() === 3)
    assert(q1.agg(sum("v")).as[Double].head() === 60.0)

    // partition pruning: the unrequested months never reach the scan
    val scan = q1.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"))
    val filesRead = q1.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    q1.collect()
    assert(filesRead.exists(_.value <= 2)) // only the 2 requested month dirs
  }

  test("partition-scoped month refresh is idempotent (dynamic overwrite)") {
    val root = java.nio.file.Files.createTempDirectory("monthly2").toString
    ParquetSink.writePartitioned(
      Seq(("2024-01", 1, 1.0), ("2024-02", 2, 2.0)).toDF("month", "id", "v"),
      root, Seq("month"))
    // re-land January with corrected data; February untouched
    ParquetSink.writePartitioned(
      Seq(("2024-01", 9, 9.0)).toDF("month", "id", "v"), root, Seq("month"))
    val back = spark.read.parquet(root)
    assert(back.count() === 2)
    assert(back.where("month = '2024-01'").select("id").as[Int].head() === 9)
  }

  test("unionTagged pads drifted vintages and tags the source table") {
    val jan = Seq((1, 10.0)).toDF("id", "v")
    val feb = Seq((2, 20.0, "extra")).toDF("id", "v", "note") // schema drift
    val out = MonthlyTables.unionTagged(Seq("01_2024" -> jan, "02_2024" -> feb))
    assert(out.columns.sorted.toSeq === Seq("id", "note", "source_table", "v"))
    val m = out.select("source_table", "note").as[(String, Option[String])]
      .collect().toMap
    assert(m === Map("01_2024" -> None, "02_2024" -> Some("extra")))
  }
}
