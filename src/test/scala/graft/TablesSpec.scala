package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Schema-contract check for the driver-regenerated testdata: the events
  * loader must yield BIGINT epoch-nanos for every on-disk ts encoding the
  * driver has shipped so far (INT64 nanos ≤ r6, timestamp[us] r7+). */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, 1700000000L * 1000000L, 7L, "view", 1.5),
    (2L, 1700000123L * 1000000L + 456789L, 8L, "click", 2.5))

  private def writeEvents(dir: String, tsExpr: String): Unit =
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", expr(tsExpr)).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def loadNanos(dir: String): Map[Long, Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === LongType)
    df.select("event_id", "ts").as[(Long, Long)].collect().toMap
  }

  private val wantNanos = rows.map { case (id, us, _, _, _) => id -> us * 1000L }.toMap

  test("Tables.events normalizes every shipped ts encoding to BIGINT nanos") {
    val base = java.nio.file.Files.createTempDirectory("evts").toString
    // ≤r6 layout: BIGINT epoch-nanos
    writeEvents(s"$base/long", "ts_us * 1000")
    // r7+ layout: timestamp[us], not adjusted to UTC (TIMESTAMP_NTZ)
    writeEvents(s"$base/ntz", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ)")
    // instant-semantics timestamp[us] (isAdjustedToUTC=true), for good measure
    writeEvents(s"$base/tz", "timestamp_micros(ts_us)")
    assert(loadNanos(s"$base/long") === wantNanos)
    assert(loadNanos(s"$base/ntz") === wantNanos)
    assert(loadNanos(s"$base/tz") === wantNanos)
  }

  test("Tables.events fails fast with a readable message on schema drift") {
    val base = java.nio.file.Files.createTempDirectory("evts-bad").toString
    writeEvents(base, "CAST(ts_us AS STRING)")
    val e = intercept[IllegalStateException](Tables.events(spark, base))
    assert(e.getMessage.contains("schema contract"))
    assert(e.getMessage.contains("'ts'"))
  }

  test("real testdata loads under the contract") {
    assert(Tables.events(spark, sfDir).schema("ts").dataType === LongType)
  }

  test("eventsBetween pushes the time range into the parquet scan, both encodings") {
    val base = java.nio.file.Files.createTempDirectory("evts-range").toString
    writeEvents(s"$base/long", "ts_us * 1000")
    writeEvents(s"$base/ntz", "CAST(timestamp_micros(ts_us) AS TIMESTAMP_NTZ)")
    for (enc <- Seq("long", "ntz")) {
      // [1700000000, 1700000100) keeps event 1, drops event 2
      val df = Tables.eventsBetween(spark, s"$base/$enc", 1700000000L, 1700000100L)
      assert(df.schema("ts").dataType === LongType, s"$enc: ts not normalized")
      assert(df.select("event_id").as[Long].collect().toSeq === Seq(1L), s"$enc: wrong rows")
      // the predicate must reach the scan as a pushed filter on the RAW
      // column — sitting above the normalization Project would read
      // every row group at scale
      val p = df.queryExecution.executedPlan.toString.replaceAll("\\s+", " ")
      assert(p.contains("PushedFilters"), s"$enc: no PushedFilters section")
      assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
        s"$enc: ts range not pushed into the scan: $p")
    }
  }
}
