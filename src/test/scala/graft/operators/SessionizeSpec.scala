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

  test("sessionize session boundaries == Spark's native session_window") {
    // same gap semantics: a session extends while consecutive events are
    // <= gap apart — including the EXACT-gap boundary (user 3), where
    // session_window's touching windows merge just like the lag rule
    val df = Seq(
      (1L, 0L, 1L), (1L, 1700L, 2L), (1L, 3300L, 3L), // chained: one session
      (1L, 10000L, 4L),                               // gap > 1800: new session
      (2L, 42L, 5L),
      (3L, 0L, 6L), (3L, 1800L, 7L)                   // gap EXACTLY == 1800
    ).toDF("user_id", "sec", "event_id")
    val custom = Sessionize.sessionize(df, "user_id", "sec", 1800L, col("event_id"))
      .groupBy("user_id", "session_id")
      .agg(min("sec").as("start_sec"), max("sec").as("end_sec"),
        count(lit(1)).as("n"))
      .select("user_id", "start_sec", "end_sec", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val native = df
      .withColumn("ts", col("sec").cast("timestamp"))
      .groupBy(col("user_id"), session_window(col("ts"), "1800 seconds"))
      .agg(min("sec").as("start_sec"), max("sec").as("end_sec"),
        count(lit(1)).as("n"))
      .select("user_id", "start_sec", "end_sec", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(custom === native)
  }

  test("concurrency counts sessions active at each start, boundaries inclusive") {
    // sessions: A[0,10], B[5,20], C[10,30] (C starts exactly at A's end),
    // D[100,110] isolated
    val sess = Seq(
      (1L, 0L, 0L, 10L), (2L, 0L, 5L, 20L), (3L, 0L, 10L, 30L),
      (4L, 0L, 100L, 110L)
    ).toDF("user_id", "session_id", "start_sec", "end_sec")
    val out = Sessionize.concurrency(sess, "user_id", "session_id",
        "start_sec", "end_sec")
      .select("user_id", "n_concurrent").as[(Long, Long)].collect().toMap
    // at A.start=0: {A}; at B.start=5: {A,B}; at C.start=10: {A,B,C}
    // (A ends AT 10 -> inclusive overlap); at D.start: {D}
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("concurrency excludes NULL-bounded sessions, matching the inequality-join oracle") {
    // an OPEN session (null end) must neither probe nor decrement: NULLs
    // sort first in the sweep order, so an unguarded -1 would land
    // before every probe and understate every count by one
    val sess = Seq(
      (1L, 0L, Some(0L), Some(10L)), (2L, 0L, Some(5L), Some(20L)),
      (9L, 0L, Some(3L), None), (8L, 0L, None, Some(50L))
    ).toDF("user_id", "session_id", "start_sec", "end_sec")
    val out = Sessionize.concurrency(sess, "user_id", "session_id",
        "start_sec", "end_sec")
      .select("user_id", "n_concurrent").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 2L))
  }

  test("stateIntervals collapses consecutive runs only; same state later is a new interval") {
    val df = Seq(
      // user 1: A A B A  -> three intervals (A twice, split by B)
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      // user 2: single event
      (2L, 5L, 5L, "C")
    ).toDF("user_id", "sec", "event_id", "event_type")
    val out = Sessionize.stateIntervals(df, "user_id", "event_type",
        Seq(col("sec"), col("event_id")), col("sec"))
      .select("user_id", "event_type", "from_sec", "to_sec", "n_events")
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, "A", 10L, 20L, 2L),
      (1L, "B", 30L, 30L, 1L),
      (1L, "A", 40L, 40L, 1L),
      (2L, "C", 5L, 5L, 1L)))
  }
}
