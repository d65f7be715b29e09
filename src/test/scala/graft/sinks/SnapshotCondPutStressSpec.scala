package graft.sinks

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.Random

/** The SnapshotStressSpec discipline re-run against the CONDITIONAL-PUT
  * commit seam ([[CommitStore]]): every commit primitive goes through a
  * [[LocalCondPutStore]] — a store exposing ONLY the S3-class contract
  * (linearizable put-if-absent, plain list/read/delete/touch; no O_EXCL,
  * no rename) with injected latency widening every race window. Same
  * global invariants as the filesystem stress: no committed row lost,
  * no version collision, gap-free history, every kept version resolves,
  * optimistic commits land on base+1 or abort loudly. Chaos injects
  * backdated burned claims through the store API (the crashed-writer
  * shape the void protocol exists for). */
class SnapshotCondPutStressSpec extends SparkSpec {
  import spark.implicits._

  test("conditional-put store: basic write/append/merge/time-travel round trip") {
    val root = Files.createTempDirectory("snapcpbasic").toString + "/t"
    val store = Some(new LocalCondPutStore(root + "/_cstore"): CommitStore)
    val v1 = SnapshotTable.write(Seq((1L, "a")).toDF("id", "v"), root,
      store = store)
    val v2 = SnapshotTable.write(Seq((2L, "b")).toDF("id", "v"), root,
      append = true, store = store)
    assert(Seq(v1, v2) == Seq(1L, 2L))
    assert(SnapshotTable.versions(spark, root, store) == Seq(1L, 2L))
    assert(SnapshotTable.read(spark, root, store = store)
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // time travel still sees v1 alone
    assert(SnapshotTable.read(spark, root, Some(1L), store)
      .as[(Long, String)].collect().toSet == Set((1L, "a")))
    val v3 = SnapshotTable.merge(Seq((1L, "a2"), (3L, "c")).toDF("id", "v"),
      root, Seq("id"), store)
    assert(v3 == 3L)
    assert(SnapshotTable.read(spark, root, store = store)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b"), (3L, "c")))
    // readChanges across the merge: exactly the rewritten + fresh files
    assert(SnapshotTable.readChanges(spark, root, 2L, store = store)
      .as[(Long, String)].collect().toSet == Set((1L, "a2"), (3L, "c")))
    // the filesystem never received a _manifests directory: ALL commit
    // metadata went through the store (the seam is real, not a shadow)
    assert(!Files.exists(java.nio.file.Paths.get(root, "_manifests")))
  }

  test("conditional-put store refuses nothing that the scheme guard would: s3a root commits through the seam") {
    // the point of the seam: the same root that the filesystem path
    // REFUSES is accepted when the caller supplies the atomicity. The
    // data write then fails (no s3a connector here) — but it must get
    // PAST the scheme guard and into the write, proving the guard is
    // bypassed by contract, not by accident.
    val store = Some(new LocalCondPutStore(
      Files.createTempDirectory("snapcps3").toString): CommitStore)
    val noGuard = intercept[Exception] {
      SnapshotTable.write(Seq((1L, "a")).toDF("id", "v"),
        "s3a://bucket/t", store = store)
    }
    assert(!noGuard.getMessage.contains("flat object store"),
      s"scheme guard fired despite a CommitStore: ${noGuard.getMessage}")
    // and WITHOUT the store the guard still refuses, before any IO
    val guarded = intercept[IllegalArgumentException] {
      SnapshotTable.write(Seq((1L, "a")).toDF("id", "v"), "s3a://bucket/t")
    }
    assert(guarded.getMessage.contains("flat object store"))
  }

  test("4 appenders + merger + compactor + vacuum + chaos claims through the conditional-put seam: no row lost, history sound") {
    val root = Files.createTempDirectory("snapcpstress").toString + "/t"
    val cp = new LocalCondPutStore(root + "/_cstore", latencyMs = 3)
    val store = Some(cp: CommitStore)
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
          cp.backdate(s"claim-$slot", SnapshotTable.claimGraceMs + 1000L)
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
}
