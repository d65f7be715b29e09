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
    CondPutChaos.run(spark, root, cp, cp.backdate, info(_))
  }

  test("second-quantized mtimes: heartbeat-vs-backdate void race loses loudly on exactly one side") {
    val root = Files.createTempDirectory("snapcpquant").toString + "/t"
    val cp = new LocalCondPutStore(root + "/_cstore",
      mtimeQuantumMs = 1000L) // S3's LastModified granularity
    CondPutChaos.quantizedVoidRace(spark, root, cp, cp.backdate, info(_))
  }
}
