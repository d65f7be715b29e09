package graft.sinks

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.Random

/** Multi-writer stress for the snapshot commit protocol: N concurrent
  * threads mix appends, optimistic merges/compacts, and vacuums on ONE
  * table while a chaos thread injects crashed-writer debris (backdated
  * burned claims — the exact shape the void protocol exists for — and
  * tmp litter). The pieces are each spec-tested in SnapshotTableSpec;
  * this drives them together, seeded for reproducibility, and pins the
  * global invariants:
  *
  *  - no committed row is ever lost: the final snapshot holds EXACTLY
  *    the union of every successful append plus latest-wins merge keys;
  *  - returned versions never collide;
  *  - the manifest history is gap-free between its ends (voids fill
  *    graced-out slots; nothing resurrects a vacuumed version);
  *  - every kept version fully resolves (no dangling file — i.e. no
  *    committed version was vacuumed out from under its manifest);
  *  - merge/compact either land on their read base + 1 or abort with
  *    ConcurrentModificationException — never a silent shadow.
  */
class SnapshotStressSpec extends SparkSpec {
  import spark.implicits._

  test("4 appenders + merger + compactor + vacuum + chaos claims: no row lost, history sound") {
    val root = Files.createTempDirectory("snapstress").toString + "/t"
    SnapshotTable.write(Seq((0L, "base")).toDF("id", "v"), root)
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

    val appended = new ConcurrentLinkedQueue[Long]()   // committed append ids
    val versionsSeen = new ConcurrentLinkedQueue[Long]()
    val mergedKeys = new ConcurrentLinkedQueue[Long]() // negative key space
    var compactsLanded = 0
    var casAborts = 0
    val lock = new Object

    // 4 appenders: unique positive ids, every SUCCESSFUL append must
    // survive everything else the table endures
    val appenders = (1 to 4).map { w =>
      Future {
        val r = new Random(1000 + w)
        (1 to 6).foreach { i =>
          val id = w * 1000L + i
          val v = SnapshotTable.write(
            Seq((id, s"w$w-$i")).toDF("id", "v"), root, append = true)
          appended.add(id); versionsSeen.add(v)
          Thread.sleep(r.nextInt(120))
        }
      }
    }
    // merger: upserts into a disjoint NEGATIVE key space with a retry
    // loop — aborts are the documented optimistic-concurrency outcome
    val merger = Future {
      val r = new Random(77)
      (1 to 5).foreach { i =>
        val key = -(1L + r.nextInt(3)) // 3 hot keys, replayed upserts
        var done = false
        var attempts = 0
        while (!done && attempts < 60) {
          attempts += 1
          try {
            val v = SnapshotTable.merge(
              Seq((key, s"m-$i-$attempts")).toDF("id", "v"), root, Seq("id"))
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
    // compactor: same optimistic contract
    val compactor = Future {
      val r = new Random(99)
      (1 to 4).foreach { _ =>
        Thread.sleep(150 + r.nextInt(250))
        try {
          val v = SnapshotTable.compact(spark, root)
          versionsSeen.add(v)
          lock.synchronized { compactsLanded += 1 }
        } catch {
          case _: java.util.ConcurrentModificationException =>
            lock.synchronized { casAborts += 1 }
        }
      }
    }
    // vacuum: long orphan grace (in-flight writers look like crashes —
    // the documented contract), generous keep
    val vacuumer = Future {
      (1 to 3).foreach { _ =>
        Thread.sleep(400)
        SnapshotTable.vacuum(spark, root, keep = 5,
          orphanGraceMs = 10L * 60 * 1000)
      }
    }
    // chaos: backdated burned claims right above the live version — the
    // crashed-writer shape appenders must void without losing anything —
    // plus stale tmp litter
    val chaos = Future {
      val r = new Random(13)
      (1 to 6).foreach { i =>
        Thread.sleep(100 + r.nextInt(200))
        val base = SnapshotTable.versions(spark, root).lastOption.getOrElse(1L)
        val p = new org.apache.hadoop.fs.Path(
          root, s"_manifests/claim-${base + 1 + r.nextInt(2)}")
        try {
          val o = f.create(p, false); o.close()
          f.setTimes(p, System.currentTimeMillis() -
            SnapshotTable.claimGraceMs - 1000L, -1L)
        } catch { case _: java.io.IOException => () } // slot already real
        val t = f.create(new org.apache.hadoop.fs.Path(
          root, s"_manifests/.tmp-chaos-$i"), true)
        t.close()
      }
    }

    Await.result(
      Future.sequence(Seq(merger, compactor, vacuumer, chaos) ++ appenders),
      600.seconds)

    // quiesced: the optimistic paths must now land (under the storm they
    // may abort every attempt — correct, but land-coverage must not
    // depend on thread luck). One wrinkle: a LEFTOVER backdated chaos
    // claim can sit exactly at live+1 — compact then aborts by design,
    // and only an APPEND can void that slot (the appender wait/void
    // protocol). Sweep with an append and retry; each sweep either
    // lands past the obstruction or voids it, so this converges.
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
              append = true))
            appended.add(id)
        }
      }
    }
    withSweepRetry("compact") {
      val v = SnapshotTable.compact(spark, root)
      lock.synchronized { compactsLanded += 1 }
      v
    }
    withSweepRetry("merge") {
      val v = SnapshotTable.merge(
        Seq((-9L, "final")).toDF("id", "v"), root, Seq("id"))
      mergedKeys.add(-9L)
      v
    }

    // ---- invariants -----------------------------------------------------
    import scala.jdk.CollectionConverters._
    val vs = versionsSeen.asScala.toSeq
    assert(vs.distinct.size == vs.size, s"version collision: $vs")

    val manifests = SnapshotTable.versions(spark, root)
    assert(manifests.nonEmpty)
    // gap-free between its ends: voids fill graced slots, vacuum trims
    // only from the LOW end, nothing resurrects
    if (manifests != (manifests.min to manifests.max)) {
      val dump = manifests.take(3).map { v =>
        val p = new org.apache.hadoop.fs.Path(root, s"_manifests/manifest-$v")
        val st = f.getFileStatus(p)
        val in = f.open(p)
        val body = scala.io.Source.fromInputStream(in).mkString
        in.close()
        s"manifest-$v (mtime ${st.getModificationTime}): ${body.take(300)}"
      }.mkString("\n")
      fail(s"manifest history has holes: $manifests\n$dump")
    }

    // every kept version resolves completely (a vacuumed file under a
    // live manifest would throw here)
    manifests.takeRight(5).foreach { v =>
      SnapshotTable.read(spark, root, Some(v)).count()
    }

    // no committed row lost, ever: base + every successful append id
    // exactly once + latest-wins merge keys
    val live = SnapshotTable.read(spark, root)
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

    // accounting closes: every returned version came from exactly one
    // successful append (24), merge (5), or landed compact
    info(s"versions=${manifests.size} compacts=$compactsLanded " +
      s"casAborts=$casAborts")
    assert(vs.size == appended.size + 6 + compactsLanded)
  }
}
