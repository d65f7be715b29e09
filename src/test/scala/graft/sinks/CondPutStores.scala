package graft.sinks

import java.nio.file.{Files, Path => JPath, StandardCopyOption}
import java.nio.file.attribute.FileTime

import scala.util.Random

/** Spec-level fake of an S3-class conditional-put store: a local
  * directory whose FIVE CommitStore operations provide EXACTLY the
  * guarantees the trait contracts — [[putIfAbsent]] is linearized by a
  * per-store lock (standing in for the server-side atomicity of
  * `PutObject If-None-Match: *`), and NOTHING ELSE is assumed: no
  * O_EXCL exposed, no rename, list/read/delete/touch are plain
  * operations like GET/LIST/DELETE/CopyObject. If the commit protocol
  * survives the multi-writer chaos suite against this store, the only
  * property a real S3 deployment still has to supply is the
  * conditional-put itself (which S3 provides natively).
  *
  * `latencyMs > 0` injects a uniform random sleep BEFORE each
  * operation's atomic section (network latency widens every protocol
  * race window without weakening the op's own atomicity — the honest
  * S3 simulation). `mtimeQuantumMs > 1` truncates LISTED mtimes to
  * that quantum (real S3 reports LastModified at second granularity;
  * the grace logic must stay safe when a heartbeat and a backdate
  * become indistinguishable — see CondPutChaos.quantizedVoidRace). */
final class LocalCondPutStore(dirPath: String, latencyMs: Int = 0,
                              mtimeQuantumMs: Long = 1L)
    extends CommitStore {
  private val dir: JPath = java.nio.file.Paths.get(dirPath)
  private val lock = new Object
  private val rnd = new Random(42)

  private def lag(): Unit = if (latencyMs > 0) {
    val d = rnd.synchronized(rnd.nextInt(latencyMs))
    if (d > 0) Thread.sleep(d)
  }

  override def init(): Unit = { Files.createDirectories(dir); () }

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
    lag()
    lock.synchronized {
      val p = dir.resolve(name)
      if (Files.exists(p)) false
      else {
        Files.createDirectories(dir)
        // full-object visibility: write to a dot-tmp and MOVE inside the
        // lock, so even a non-locking reader (there are none — reads
        // also lock — but the fake shouldn't be weaker than S3) never
        // sees a partial body
        val tmp = dir.resolve(s".put-${java.util.UUID.randomUUID()}")
        Files.write(tmp, body)
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }
  }

  override def read(name: String): Array[Byte] = {
    lag()
    lock.synchronized(Files.readAllBytes(dir.resolve(name)))
  }

  override def list(): Seq[CommitStore.Entry] = {
    lag()
    lock.synchronized {
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filterNot(_.getFileName.toString.startsWith(".put-"))
            .map(p => CommitStore.Entry(p.getFileName.toString,
              Files.getLastModifiedTime(p).toMillis /
                mtimeQuantumMs * mtimeQuantumMs))
            .toVector
        } finally s.close()
      }
    }
  }

  override def delete(name: String): Unit = {
    lag()
    lock.synchronized { Files.deleteIfExists(dir.resolve(name)); () }
  }

  override def touch(name: String): Unit = {
    lag()
    lock.synchronized {
      val p = dir.resolve(name)
      // CopyObject-onto-itself semantics: refresh mtime in place, the
      // name never goes unlisted
      if (Files.exists(p))
        Files.setLastModifiedTime(p,
          FileTime.fromMillis(System.currentTimeMillis()))
      ()
    }
  }

  /** Test hook: backdate a name's mtime (simulates a claim whose writer
    * crashed `ageMs` ago). */
  def backdate(name: String, ageMs: Long): Unit = lock.synchronized {
    val p = dir.resolve(name)
    if (Files.exists(p))
      Files.setLastModifiedTime(p,
        FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    ()
  }
}

/** [[CommitStore]] wrapper delegating every op — subclasses hook single
  * operations to make protocol races deterministic in specs. */
private[sinks] class DelegatingStore(inner: CommitStore) extends CommitStore {
  override def putIfAbsent(name: String, body: Array[Byte]): Boolean =
    inner.putIfAbsent(name, body)
  override def read(name: String): Array[Byte] = inner.read(name)
  override def list(): Seq[CommitStore.Entry] = inner.list()
  override def delete(name: String): Unit = inner.delete(name)
  override def touch(name: String): Unit = inner.touch(name)
  override def init(): Unit = inner.init()
}

/** The multi-writer chaos scenario shared by every [[CommitStore]]
  * implementation's stress suite (LocalCondPutStore, the HTTP-backed
  * [[S3CommitStore]] against the loopback endpoint): 4 appenders + a
  * CAS-retrying merger + compactor + vacuum + backdated burned claims,
  * then the quiesced invariants — no row lost, no version collision,
  * gap-free history, every kept version resolves. `backdate` is the
  * store-specific test hook that ages a claim as if its writer crashed. */
object CondPutChaos {
  import java.util.concurrent.ConcurrentLinkedQueue
  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration._
  import scala.concurrent.ExecutionContext.Implicits.global
  import scala.util.Random
  import org.apache.spark.sql.SparkSession

  def run(spark: SparkSession, root: String, cp: CommitStore,
          backdate: (String, Long) => Unit,
          info: String => Unit): Unit = {
    import spark.implicits._
    val store = Some(cp)
    SnapshotTable.write(Seq((0L, "base")).toDF("id", "v"), root, store = store)

    val appended = new ConcurrentLinkedQueue[Long]()
    val versionsSeen = new ConcurrentLinkedQueue[Long]()
    val mergedKeys = new ConcurrentLinkedQueue[Long]()
    var compactsLanded = 0
    var casAborts = 0
    val lock = new Object

    val appenders = (1 to 4).map { w =>
      Future {
        val r = new Random(2000 + w)
        (1 to 6).foreach { i =>
          val id = w * 1000L + i
          val v = SnapshotTable.write(
            Seq((id, s"w$w-$i")).toDF("id", "v"), root, append = true,
            store = store)
          appended.add(id); versionsSeen.add(v)
          Thread.sleep(r.nextInt(120))
        }
      }
    }
    val merger = Future {
      val r = new Random(78)
      (1 to 5).foreach { i =>
        val key = -(1L + r.nextInt(3))
        var done = false
        var attempts = 0
        while (!done && attempts < 60) {
          attempts += 1
          try {
            val v = SnapshotTable.merge(
              Seq((key, s"m-$i-$attempts")).toDF("id", "v"), root,
              Seq("id"), store)
            versionsSeen.add(v); mergedKeys.add(key); done = true
          } catch {
            case _: java.util.ConcurrentModificationException =>
              lock.synchronized { casAborts += 1 }
              Thread.sleep(r.nextInt(80))
          }
        }
        assert(done, s"merge $i starved after $attempts CAS aborts")
      }
    }
    val compactor = Future {
      val r = new Random(98)
      (1 to 4).foreach { _ =>
        Thread.sleep(150 + r.nextInt(250))
        try {
          val v = SnapshotTable.compact(spark, root, store = store)
          versionsSeen.add(v)
          lock.synchronized { compactsLanded += 1 }
        } catch {
          case _: java.util.ConcurrentModificationException =>
            lock.synchronized { casAborts += 1 }
        }
      }
    }
    val vacuumer = Future {
      (1 to 3).foreach { _ =>
        Thread.sleep(400)
        SnapshotTable.vacuum(spark, root, keep = 5,
          orphanGraceMs = 10L * 60 * 1000, store = store)
      }
    }
    // chaos: backdated burned claims landed THROUGH the store API — the
    // crashed-writer debris the appender void path must resolve
    val chaos = Future {
      val r = new Random(14)
      (1 to 6).foreach { _ =>
        Thread.sleep(100 + r.nextInt(200))
        val base = SnapshotTable.versions(spark, root, store)
          .lastOption.getOrElse(1L)
        val slot = base + 1 + r.nextInt(2)
        if (cp.putIfAbsent(s"claim-$slot", Array.emptyByteArray))
          backdate(s"claim-$slot", SnapshotTable.claimGraceMs + 1000L)
      }
    }

    Await.result(
      Future.sequence(Seq(merger, compactor, vacuumer, chaos) ++ appenders),
      600.seconds)

    // quiesced optimistic passes, with the append sweep for leftover
    // burned chaos claims sitting exactly at live+1 (see the filesystem
    // stress spec for the reasoning)
    var sweep = 0
    def withSweepRetry(what: String)(body: => Long): Unit = {
      var done = false
      while (!done) {
        try { versionsSeen.add(body); done = true }
        catch {
          case _: java.util.ConcurrentModificationException =>
            sweep += 1
            assert(sweep <= 8, s"quiesced $what starved by burned claims")
            val id = 9000L + sweep
            versionsSeen.add(SnapshotTable.write(
              Seq((id, s"sweep-$sweep")).toDF("id", "v"), root,
              append = true, store = store))
            appended.add(id)
        }
      }
    }
    withSweepRetry("compact") {
      val v = SnapshotTable.compact(spark, root, store = store)
      lock.synchronized { compactsLanded += 1 }
      v
    }
    withSweepRetry("merge") {
      val v = SnapshotTable.merge(
        Seq((-9L, "final")).toDF("id", "v"), root, Seq("id"), store)
      mergedKeys.add(-9L)
      v
    }

    // ---- invariants (same as the filesystem stress) ---------------------
    import scala.jdk.CollectionConverters._
    val vs = versionsSeen.asScala.toSeq
    assert(vs.distinct.size == vs.size, s"version collision: $vs")

    val manifests = SnapshotTable.versions(spark, root, store)
    assert(manifests.nonEmpty)
    assert(manifests == (manifests.min to manifests.max),
      s"manifest history has holes: $manifests")

    manifests.takeRight(5).foreach { v =>
      SnapshotTable.read(spark, root, Some(v), store).count()
    }

    val live = SnapshotTable.read(spark, root, store = store)
      .as[(Long, String)].collect()
    val ids = live.map(_._1).toSeq
    assert(ids.distinct.size == ids.size,
      s"duplicated rows in the live snapshot: ${ids.sorted}")
    val expectAppends = appended.asScala.toSet + 0L
    val gotPositive = ids.filter(_ >= 0).toSet
    assert(gotPositive == expectAppends,
      s"lost appends: ${(expectAppends -- gotPositive).toSeq.sorted}; " +
        s"ghosts: ${(gotPositive -- expectAppends).toSeq.sorted}")
    val gotNegative = ids.filter(_ < 0).toSet
    assert(gotNegative == mergedKeys.asScala.toSet,
      s"merge keys diverged: $gotNegative vs ${mergedKeys.asScala.toSet}")

    info(s"versions=${manifests.size} compacts=$compactsLanded " +
      s"casAborts=$casAborts")
    assert(vs.size == appended.size + 6 + compactsLanded)
  }

  /** The mtime-QUANTIZATION race: S3 lists LastModified at SECOND
    * granularity, so a claim heartbeat and a crash-age backdate landing
    * in the same second are indistinguishable to a voider — the grace
    * check can fire against a writer that is actually alive. Safety
    * must come from the conditional put, never the clock: exactly one
    * of {the writer's manifest-N, the voider's void-N} lands, and the
    * loser learns LOUDLY. Both directions are pinned deterministically
    * (gates, not sleeps) on one table:
    *
    *  1. the VOID wins — the live-but-misjudged writer's land fails
    *     with the loud "voided by a concurrent writer" error and its
    *     rows are NOT in the table (told ≠ lost);
    *  2. the WRITER wins — the voider's void-put loses, is silently
    *     dropped (awaitLowerClaims' contract), and the voider carries
    *     the writer's files forward: both rows live.
    */
  def quantizedVoidRace(spark: SparkSession, root: String, cp: CommitStore,
                        backdate: (String, Long) => Unit,
                        info: String => Unit): Unit = {
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val store = Some(cp)
    SnapshotTable.write(Seq((0L, "base")).toDF("id", "v"), root,
      store = store) // v1

    // ---- direction 1: the void wins, the writer loses loudly ---------
    val claimed1 = new CountDownLatch(1)
    val gate1 = new CountDownLatch(1)
    val holding1: CommitStore = new DelegatingStore(cp) {
      override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
        if (name.startsWith("manifest-"))
          assert(gate1.await(60, TimeUnit.SECONDS), "gate1 starved")
        val r = super.putIfAbsent(name, body)
        if (r && name.startsWith("claim-")) claimed1.countDown()
        r
      }
    }
    val w1 = Future {
      SnapshotTable.write(Seq((100L, "w1")).toDF("id", "v"), root,
        append = true, store = Some(holding1))
    }
    assert(claimed1.await(60, TimeUnit.SECONDS), "w1 never claimed")
    // the same-second ambiguity: a heartbeat lands, then the backdate —
    // after second-truncation the voider sees only "aged past grace"
    cp.touch("claim-2")
    backdate("claim-2", SnapshotTable.claimGraceMs + 1999L)
    // appender B: judges claim-2 crashed, voids slot 2, lands at 3
    val vB = SnapshotTable.write(Seq((200L, "b1")).toDF("id", "v"), root,
      append = true, store = store)
    assert(vB == 3L, s"voider landed at $vB, expected 3")
    gate1.countDown() // the live writer wakes and tries to land
    val w1err = org.scalatest.Assertions.intercept[IllegalStateException] {
      Await.result(w1, 60.seconds)
    }
    assert(w1err.getMessage.contains("voided by a concurrent writer"),
      s"writer lost silently instead of loudly: ${w1err.getMessage}")
    val live1 = SnapshotTable.read(spark, root, store = store)
      .as[(Long, String)].collect().toSet
    assert(live1 == Set((0L, "base"), (200L, "b1")),
      s"void direction: live rows wrong: $live1")
    // v2 IS the void: reading at it shows exactly v1's content
    assert(SnapshotTable.read(spark, root, Some(2L), store)
      .as[(Long, String)].collect().toSet == Set((0L, "base")))

    // ---- direction 2: the writer wins, the void loses silently -------
    val claimed2 = new CountDownLatch(1)
    val gate2 = new CountDownLatch(1)
    val w2Landed = new CountDownLatch(1)
    val holding2: CommitStore = new DelegatingStore(cp) {
      override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
        if (name.startsWith("manifest-"))
          assert(gate2.await(60, TimeUnit.SECONDS), "gate2 starved")
        val r = super.putIfAbsent(name, body)
        if (r && name.startsWith("claim-")) claimed2.countDown()
        r
      }
    }
    val w2 = Future {
      val v = SnapshotTable.write(Seq((101L, "w2")).toDF("id", "v"), root,
        append = true, store = Some(holding2))
      w2Landed.countDown()
      v
    }
    assert(claimed2.await(60, TimeUnit.SECONDS), "w2 never claimed")
    cp.touch("claim-4")
    backdate("claim-4", SnapshotTable.claimGraceMs + 1999L)
    // the voider's store releases the writer at the last instant — its
    // void-put reaches the store AFTER manifest-4 landed and must lose
    val bStore2: CommitStore = new DelegatingStore(cp) {
      override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
        if (name == "manifest-4") {
          gate2.countDown()
          assert(w2Landed.await(60, TimeUnit.SECONDS), "w2 land starved")
        }
        super.putIfAbsent(name, body)
      }
    }
    val vB2 = SnapshotTable.write(Seq((201L, "b2")).toDF("id", "v"), root,
      append = true, store = Some(bStore2))
    assert(Await.result(w2, 60.seconds) == 4L, "writer should land at 4")
    assert(vB2 == 5L, s"voider-turned-carrier landed at $vB2, expected 5")
    val live2 = SnapshotTable.read(spark, root, store = store)
      .as[(Long, String)].collect().toSet
    assert(live2 == Set((0L, "base"), (200L, "b1"), (101L, "w2"),
      (201L, "b2")), s"writer-wins direction: live rows wrong: $live2")
    val versions = SnapshotTable.versions(spark, root, store)
    assert(versions == (1L to 5L), s"history has holes: $versions")
    info(s"quantized void race: both directions pinned, history $versions")
  }
}
