package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Kill-and-recover coverage for the STORE-BACKED foreachBatch gates —
  * the three whose durable state lives in their own parquet store or
  * table rather than the streaming state store (RestartRecoverySpec and
  * RestartTwinsSpec cover the state-store twins): semanticGateBatch's
  * cell-partitioned vector store, upsertBatch's SnapshotTable, and
  * packStream's offset ledger. Each runs as a REAL streaming query over
  * a replayable file source, is stopped after lifetime 1, and restarts
  * in a NEW SparkSession from the same checkpoint + store with new
  * input; the cross-restart result must equal a single-run twin over
  * the same input (fresh checkpoint AND fresh store). What makes the
  * restart non-trivial in each case: lifetime 2's decisions depend on
  * lifetime 1's durable state (a stored near-dup must drop, an upsert
  * must hit the stored key, the pack offset must continue), so recovery
  * failure shows up as content divergence, not just a crash. */
class RestartGatesSpec extends SparkSpec {

  private def newDir(p: String) = Files.createTempDirectory(p).toString

  /** Land one arrival as one flat parquet file (file source lists
    * non-recursively). */
  private def writeInput(dir: String, df: DataFrame, part: String): Unit = {
    val scratch = Files.createTempDirectory("gate-in").toString
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    Files.createDirectories(java.nio.file.Paths.get(dir))
    val f = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    Files.move(f.toPath, java.nio.file.Paths.get(dir, s"$part.parquet"))
  }

  /** One streaming-query lifetime driving a foreachBatch gate. */
  private def lifetime(session: SparkSession, input: String,
      schema: org.apache.spark.sql.types.StructType,
      ckpt: String, handler: (DataFrame, Long) => Unit): Unit = {
    val src = session.readStream.schema(schema).parquet(input)
    val q = src.writeStream
      .foreachBatch(handler)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("semanticGateBatch survives a kill: a lifetime-2 near-dup of a lifetime-1 vector drops via the recovered store") {
    val s = spark
    import s.implicits._
    val root = newDir("gate-sem")
    val centroids = Array(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    def df(rows: (Long, Seq[Double])*) = rows.toDF("id", "emb")
    // lifetime 1: 1 and 2 near-parallel (intra-batch, min id 1 wins);
    // 3 in the other cell survives
    val b1 = df(1L -> Seq(10.0, 0.1), 2L -> Seq(9.9, 0.2),
      3L -> Seq(0.1, 8.0))
    // lifetime 2: 4 duplicates STORED 1 (only the recovered store can
    // drop it); 5 is genuinely new
    val b2 = df(4L -> Seq(10.1, 0.11), 5L -> Seq(7.0, -6.9))

    def run(ckpt: String, store: String, out: String): Set[Long] = {
      val emit: DataFrame => Unit = d =>
        d.select("id").write.mode("append").parquet(out)
      lifetime(spark.newSession(), s"$root/in", b1.schema, ckpt,
        EventStream.semanticGateBatch(store, "id", "emb", centroids,
          tau = 0.95, emit = emit))
      spark.read.parquet(out).distinct().as[Long].collect().toSet
    }

    writeInput(s"$root/in", b1, "b1")
    run(s"$root/ckpt", s"$root/store", s"$root/out")
    org.apache.spark.sql.GraftShims.unloadStateStores() // the kill
    writeInput(s"$root/in", b2, "b2")
    val restarted = run(s"$root/ckpt", s"$root/store", s"$root/out")

    org.apache.spark.sql.GraftShims.unloadStateStores()
    val single = run(s"$root/ckpt-single", s"$root/store-single",
      s"$root/out-single")
    assert(restarted === single,
      "cross-restart survivors diverged from the single-run twin")
    assert(restarted === Set(1L, 3L, 5L),
      s"expected 4 to drop against the RECOVERED store: $restarted")
    // the store itself recovered + extended: exactly the survivors
    assert(spark.read.parquet(s"$root/store").select("vid")
      .as[Long].collect().toSet === Set(1L, 3L, 5L))
  }

  test("upsertBatch survives a kill: lifetime-2 changes merge into the lifetime-1 table, content == single run") {
    val s = spark
    import s.implicits._
    import graft.sinks.SnapshotTable
    val root = newDir("gate-cdc")
    def df(rows: (Long, Long, String)*) = rows.toDF("id", "seq", "v")
    val b1 = df((1L, 1L, "a0"), (2L, 1L, "b0"))
    // lifetime 2: update key 1 (hits the stored row), insert key 3
    val b2 = df((1L, 2L, "a1"), (3L, 1L, "c0"))

    def run(ckpt: String, table: String): Set[(Long, String)] = {
      lifetime(spark.newSession(), s"$root/in", b1.schema, ckpt,
        EventStream.upsertBatch(table, Seq("id"), col("seq")))
      SnapshotTable.read(spark, table)
        .select("id", "v").as[(Long, String)].collect().toSet
    }

    writeInput(s"$root/in", b1, "b1")
    run(s"$root/ckpt", s"$root/t")
    org.apache.spark.sql.GraftShims.unloadStateStores() // the kill
    writeInput(s"$root/in", b2, "b2")
    val restarted = run(s"$root/ckpt", s"$root/t")

    org.apache.spark.sql.GraftShims.unloadStateStores()
    val single = run(s"$root/ckpt-single", s"$root/t-single")
    assert(restarted === single,
      "cross-restart table content diverged from the single-run twin")
    assert(restarted === Set((1L, "a1"), (2L, "b0"), (3L, "c0")))
    // and the pre-restart state still time-travels
    assert(SnapshotTable.read(spark, s"$root/t", Some(1L))
      .select("id", "v").as[(Long, String)].collect().toSet ===
      Set((1L, "a0"), (2L, "b0")))
  }

  test("packStream survives a kill: the token offset continues from the recovered ledger, layout == single run") {
    val s = spark
    import s.implicits._
    val root = newDir("gate-pack")
    // doc ids monotone ACROSS lifetimes so the single-run twin (which
    // may see both files in one micro-batch) concatenates in the same
    // global order as the two-lifetime run
    def df(rows: (Long, Long)*) = rows.toDF("doc_id", "n_tokens")
    val b1 = df((1L to 7L).map(i => (i, 1L + i % 5)): _*)
    val b2 = df((8L to 14L).map(i => (i, 1L + i % 5)): _*)

    def run(ckpt: String, ledger: String, out: String)
        : Set[(Long, Long, Long, Long)] = {
      val emit: DataFrame => Unit = d =>
        d.select("doc_id", "seq_id", "seq_off", "n_splits")
          .write.mode("append").parquet(out)
      lifetime(spark.newSession(), s"$root/in", b1.schema, ckpt,
        EventStream.packStream(ledger, Seq("doc_id"), "n_tokens", 8L, emit))
      spark.read.parquet(out).distinct()
        .as[(Long, Long, Long, Long)].collect().toSet
    }

    writeInput(s"$root/in", b1, "b1")
    run(s"$root/ckpt", s"$root/ledger", s"$root/out")
    org.apache.spark.sql.GraftShims.unloadStateStores() // the kill
    writeInput(s"$root/in", b2, "b2")
    val restarted = run(s"$root/ckpt", s"$root/ledger", s"$root/out")

    org.apache.spark.sql.GraftShims.unloadStateStores()
    val single = run(s"$root/ckpt-single", s"$root/ledger-single",
      s"$root/out-single")
    assert(restarted === single,
      "cross-restart packing diverged from the single-run twin")
    // the batch operator over the full corpus agrees too
    val batchTwin = graft.operators.TrainMix
      .packSequences(b1.unionByName(b2), Seq($"doc_id"), "n_tokens", 8L)
      .select("doc_id", "seq_id", "seq_off", "n_splits")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(restarted === batchTwin,
      "cross-restart packing diverged from the batch operator")
  }
}
