package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long, v: Double) =
    EventStream.Event(id, new Timestamp(sec * 1000), user, "click", v)

  test("tumblingCounts aggregates per window+type incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    mem.addData(ev(1, 100, 1, 1.0), ev(2, 200, 1, 2.0), ev(3, 3700, 2, 3.0))
    val q = EventStream.tumblingCounts(mem.toDF(), "1 hour").writeStream
      .format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .selectExpr("n_events", "CAST(total_value AS DOUBLE)")
        .as[(Long, Double)].collect().sortBy(_._1)
      assert(rows.toSeq === Seq((1L, 3.0), (2L, 3.0)))
    } finally q.stop()
  }

  test("sessionizeStream closes sessions on gap within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    // user 1: two events 10s apart, then a 3000s gap -> first session closes
    mem.addData(ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0), ev(3, 3010, 1, 4.0))
    val q = EventStream.sessionizeStream(mem.toDS(), gapSec = 1800,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()).writeStream
      .format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sess_test").as[EventStream.Session].collect()
      assert(closed.length === 1)
      assert(closed.head === EventStream.Session(1L, 0L, 10L, 2L, 3.0))
    } finally q.stop()
  }
}
