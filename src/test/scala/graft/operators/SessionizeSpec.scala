package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits at gaps > threshold, 0-based per user") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L), (1L, 2000L, 3L), (1L, 2100L, 4L),
      (2L, 0L, 5L)
    ).toDF("user_id", "sec", "event_id")
    val out = Sessionize.sessionize(df, "user_id", "sec", 1800L, col("event_id"))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }
}
