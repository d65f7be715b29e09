package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** RestartRecoverySpec's kill-and-recover harness parameterized over
  * the OTHER stateful streaming twins (round-15 brief #7):
  * stateIntervalsStream (flatMapGroupsWithState, event-time timeout),
  * and the three sketch streams kmvDistinct/cms/hist
  * (mapGroupsWithState, unbounded keyed state). Each runs across TWO
  * SparkSession lifetimes with every in-memory state-store provider
  * unloaded between them — recovery can only come from the
  * checkpoint — and the cross-restart output must equal a single-run
  * twin over the same input, with inputs arranged so the batch-2
  * result is WRONG unless batch-1 state was actually recovered. */
class RestartTwinsSpec extends SparkSpec {

  private def newDir(p: String) = Files.createTempDirectory(p).toString

  /** Land one arrival as one flat parquet file (file source lists
    * non-recursively). */
  private def writeInput[T](dir: String, rows: Seq[T], part: String,
                            toDf: Seq[T] => DataFrame): Unit = {
    val scratch = Files.createTempDirectory("twin-in").toString
    toDf(rows).coalesce(1).write.mode("overwrite").parquet(scratch)
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val f = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    Files.move(f.toPath, java.nio.file.Paths.get(dir, s"$part.parquet"))
  }

  /** One query lifetime. Update-mode twins append through foreachBatch
    * with the batch id attached: foreachBatch is at-least-once across a
    * restart, so the reader below reduces to the LAST emission per key
    * and exact-duplicate replays collapse. */
  private def lifetime[I, O](session: SparkSession, input: String,
      ckpt: String, out: String, enc: Encoder[I],
      f: Dataset[I] => Dataset[O], mode: OutputMode): Unit = {
    val src = session.readStream.schema(enc.schema).parquet(input).as[I](enc)
    val q = f(src).toDF().writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.withColumn("__batch", lit(id))
          .write.mode("append").parquet(out)
      }
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Latest emission per key: max __batch per key, exact dups dropped
    * (driver-side — outputs are a handful of sketch rows). */
  private def lastPerKey(out: String, keyCol: String): Set[Seq[Any]] = {
    val df = spark.read.parquet(out)
    val ki = df.columns.indexOf(keyCol)
    val bi = df.columns.indexOf("__batch")
    require(ki >= 0 && bi >= 0, s"missing $keyCol/__batch in ${df.columns.toSeq}")
    df.collect().groupBy(_.get(ki)).values.flatMap { rs =>
      val maxB = rs.map(_.getLong(bi)).max
      rs.filter(_.getLong(bi) == maxB)
        .map(r => r.toSeq.patch(bi, Nil, 1)).distinct
    }.toSet
  }

  /** Append-mode reader: the full emitted set (a replayed batch re-runs
    * under the SAME batch id with identical deterministic rows, so
    * distinct() collapses the at-least-once duplicates). */
  private def allRows(out: String): Set[Seq[Any]] =
    spark.read.parquet(out).drop("__batch").distinct()
      .collect().map(_.toSeq).toSet

  /** Run the full kill/recover protocol and compare against single-run. */
  private def crossRestartEqualsSingle[I, O](name: String,
      batch1: Seq[I], batch2: Seq[I], toDf: Seq[I] => DataFrame,
      enc: Encoder[I], f: Dataset[I] => Dataset[O], mode: OutputMode,
      keyCol: String): Set[Seq[Any]] = {
    val root = newDir(s"twin-$name")
    val input = s"$root/in"
    def reduce(out: String): Set[Seq[Any]] =
      if (mode == OutputMode.Append()) allRows(out)
      else lastPerKey(out, keyCol)
    writeInput(input, batch1, "b1", toDf)
    lifetime(spark.newSession(), input, s"$root/ckpt", s"$root/out",
      enc, f, mode)
    // the kill: only the checkpoint survives
    org.apache.spark.sql.GraftShims.unloadStateStores()
    writeInput(input, batch2, "b2", toDf)
    lifetime(spark.newSession(), input, s"$root/ckpt", s"$root/out",
      enc, f, mode)
    val restarted = reduce(s"$root/out")

    org.apache.spark.sql.GraftShims.unloadStateStores()
    lifetime(spark.newSession(), input, s"$root/ckpt-single",
      s"$root/out-single", enc, f, mode)
    val single = reduce(s"$root/out-single")
    assert(restarted === single,
      s"$name: cross-restart output diverged from the single-run twin")
    restarted
  }

  test("kmvDistinctStream state survives a kill: sketch after restart == single run, bit for bit") {
    val s = spark
    import s.implicits._
    // k=8 with 40 distinct values forces evictions BOTH sides of the
    // restart: batch 2's result is wrong unless batch 1's sketch was
    // recovered from the checkpoint
    val aVals = (0 until 40).map(i => (i * 7919L + 13) % 100003)
    val b1 = aVals.take(25).map(("A", _)) ++ Seq(("B", 11L), ("B", 5L))
    val b2 = aVals.drop(25).map(("A", _)) ++ Seq(("B", 11L), ("B", 99L))
    val out = crossRestartEqualsSingle[(String, Long), EventStream.KmvGroup](
      "kmv", b1, b2, rows => rows.toDF("_1", "_2"),
      implicitly[Encoder[(String, Long)]],
      ds => EventStream.kmvDistinctStream(ds, k = 8), OutputMode.Update(),
      "key")
    assert(out.size === 2) // A and B both present after recovery
    val aSketch = out.find(_.head == "A").get(1).asInstanceOf[scala.collection.Seq[Long]]
    assert(aSketch.size === 8, "A's sketch must be at capacity k=8")
  }

  test("cmsStream state survives a kill: count grid after restart == single run") {
    val s = spark
    import s.implicits._
    val b1 = Seq.tabulate(30)(i => ("A", s"tok${i % 5}")) :+ (("B", "x"))
    val b2 = Seq.tabulate(30)(i => ("A", s"tok${i % 7}")) :+ (("B", "y"))
    val out = crossRestartEqualsSingle[(String, String), EventStream.CmsGroup](
      "cms", b1, b2, rows => rows.toDF("_1", "_2"),
      implicitly[Encoder[(String, String)]],
      ds => EventStream.cmsStream(ds, d = 4, w = 64), OutputMode.Update(),
      "key")
    // the grid must hold BOTH batches' increments (61 rows for A)
    val aGrid = out.find(_.head == "A").get(1).asInstanceOf[scala.collection.Seq[Long]]
    assert(aGrid.grouped(64).map(_.sum).toSeq === Seq.fill(4)(60L))
  }

  test("histStream state survives a kill: bins after restart == single run") {
    val s = spark
    import s.implicits._
    val b1 = (0 until 50).map(i => ("A", (i % 10).toLong))
    val b2 = (0 until 50).map(i => ("A", (i % 20).toLong))
    val out = crossRestartEqualsSingle[(String, Long), EventStream.HistGroup](
      "hist", b1, b2, rows => rows.toDF("_1", "_2"),
      implicitly[Encoder[(String, Long)]],
      ds => EventStream.histStream(ds, lo = 0L, hi = 20L, bins = 4),
      OutputMode.Update(), "key")
    val bins = out.find(_.head == "A").get(1).asInstanceOf[scala.collection.Seq[Long]]
    assert(bins.sum === 100L, s"lost batch-1 counts across restart: $bins")
  }

  test("stateIntervalsStream state survives a kill: an interval OPENED before the kill closes after it") {
    val s = spark
    import s.implicits._
    def ev(id: Long, sec: Long, user: Long, typ: String) =
      EventStream.Event(id, new Timestamp(sec * 1000), user, typ, 1.0)
    // user 1's 'A' run OPENS in batch 1 and extends + closes in batch 2:
    // its (from, n) are only right if batch-1 state was recovered
    val b1 = Seq(ev(1, 100, 1, "A"), ev(2, 200, 1, "A"))
    val b2 = Seq(ev(3, 250, 1, "A"), ev(4, 300, 1, "B"),
      ev(5, 90000, 2, "Z")) // watermark push flushes closed runs
    val out = crossRestartEqualsSingle[EventStream.Event, EventStream.Interval](
      "ivl", b1, b2, rows => rows.toDF(),
      implicitly[Encoder[EventStream.Event]],
      (ds: Dataset[EventStream.Event]) =>
        EventStream.stateIntervalsStream(ds, flushSec = 3600),
      OutputMode.Append(), "user_id")
    // the recovered run: starts at the batch-1 time with ALL 3 events —
    // without recovery the restart would open a fresh run at 250
    assert(out.exists { r =>
      r(0) == 1L && r(1) == "A" && r(2) == 100L && r(4) == 3L
    }, s"user 1's cross-restart 'A' run is wrong: $out")
  }
}
