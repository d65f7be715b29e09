package graft.sinks

import java.nio.file.{Files, NoSuchFileException}
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The CommitStore seam's CLIENT half, driven end-to-end over HTTP
  * against [[FakeS3Endpoint]] — real sockets, real XML, real
  * continuation-token paging, real 409-retry — so the only property a
  * cloud deployment still supplies is S3's own conditional-put plus a
  * signer in the `headers` seam. */
class S3CommitStoreSpec extends SparkSpec {

  private def withEndpoint[A](pageSize: Int = 3, latencyMs: Int = 0,
                              conflict409EveryN: Int = 0)
                             (f: (FakeS3Endpoint, S3CommitStore) => A): A = {
    val ep = new FakeS3Endpoint(pageSize, latencyMs, conflict409EveryN)
    try f(ep, new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests"))
    finally ep.stop()
  }

  test("putIfAbsent: one winner over HTTP, loser sees 412, read round-trips bytes") {
    withEndpoint() { (_, st) =>
      val body = "manifest v1".getBytes(StandardCharsets.UTF_8)
      assert(st.putIfAbsent("manifest-1", body))
      assert(!st.putIfAbsent("manifest-1", "other".getBytes))
      assert(new String(st.read("manifest-1"), StandardCharsets.UTF_8)
        == "manifest v1")
      intercept[NoSuchFileException](st.read("manifest-2"))
      // empty-body claims (S3 zero-byte objects) work the same way
      assert(st.putIfAbsent("claim-2", Array.emptyByteArray))
      assert(!st.putIfAbsent("claim-2", Array.emptyByteArray))
      assert(st.read("claim-2").isEmpty)
    }
  }

  test("32 concurrent conditional PUTs: exactly one 200") {
    withEndpoint(latencyMs = 2) { (_, st) =>
      val wins = Await.result(Future.sequence((1 to 32).map(i => Future {
        st.putIfAbsent("claim-7", s"w$i".getBytes)
      })), 60.seconds).count(identity)
      assert(wins == 1, s"conditional put had $wins winners")
    }
  }

  test("list pages through continuation tokens and keeps only direct children") {
    withEndpoint(pageSize = 2) { (ep, st) =>
      (1 to 7).foreach(i => assert(st.putIfAbsent(s"manifest-$i", Array(i.toByte))))
      // namespace pollution: a nested key and a sibling prefix must not leak in
      val raw = new S3CommitStore(ep.endpoint, "bkt", "")
      assert(raw.putIfAbsent("tbl/_manifests/nested/deep", Array(1.toByte)))
      assert(raw.putIfAbsent("tbl/_manifests-other/claim-9", Array(1.toByte)))
      val names = st.list().map(_.name).sorted
      assert(names == (1 to 7).map(i => s"manifest-$i").sorted,
        s"listing leaked: $names")
      // mtimes are live epoch millis (the fake reports second-level ISO)
      val now = System.currentTimeMillis()
      st.list().foreach(e => assert(math.abs(e.mtimeMs - now) < 60000))
    }
  }

  test("delete is idempotent; touch refreshes mtime without unlisting; 404 touch is benign") {
    withEndpoint() { (ep, st) =>
      assert(st.putIfAbsent("claim-3", Array.emptyByteArray))
      ep.backdate("tbl/_manifests/claim-3", 90000L)
      val before = st.list().find(_.name == "claim-3").get.mtimeMs
      st.touch("claim-3")
      val after = st.list().find(_.name == "claim-3").get.mtimeMs
      assert(after > before, s"touch did not refresh: $before -> $after")
      st.delete("claim-3")
      st.delete("claim-3") // second delete: no-op, no throw
      assert(st.list().isEmpty)
      st.touch("claim-3") // vanished claim: benign
    }
  }

  test("transient 409 ConditionalRequestConflict is retried, precondition still decides") {
    withEndpoint(conflict409EveryN = 2) { (_, st) =>
      // every other conditional PUT bounces with 409 first; the retry
      // must converge AND never double-create
      assert(st.putIfAbsent("manifest-1", "a".getBytes))
      assert(!st.putIfAbsent("manifest-1", "b".getBytes))
      assert(st.putIfAbsent("manifest-2", "c".getBytes))
      assert(new String(st.read("manifest-1")) == "a")
    }
  }

  test("ListObjectsV2 parser: keys, mtimes, truncation, token") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>
        |<IsTruncated>true</IsTruncated>
        |<NextContinuationToken>tok&amp;1</NextContinuationToken>
        |<Contents><Key>p/claim-1</Key><LastModified>2026-08-16T12:00:01Z</LastModified></Contents>
        |<Contents><Key>p/manifest-1</Key><LastModified>2026-08-16T12:00:02.500Z</LastModified></Contents>
        |</ListBucketResult>""".stripMargin.getBytes(StandardCharsets.UTF_8)
    val l = S3CommitStore.parseListing(xml)
    assert(l.truncated && l.next.contains("tok&1"))
    assert(l.contents.map(_._1) == Seq("p/claim-1", "p/manifest-1"))
    assert(l.contents.map(_._2) == Seq(1786881601000L, 1786881602500L))
  }

  test("SnapshotTable round trip entirely through the HTTP store") {
    import spark.implicits._
    withEndpoint() { (_, st) =>
      val root = Files.createTempDirectory("snaphttp").toString + "/t"
      val store = Some(st: CommitStore)
      val v1 = SnapshotTable.write(Seq((1L, "a")).toDF("id", "v"), root,
        store = store)
      val v2 = SnapshotTable.write(Seq((2L, "b")).toDF("id", "v"), root,
        append = true, store = store)
      assert(Seq(v1, v2) == Seq(1L, 2L))
      assert(SnapshotTable.read(spark, root, store = store)
        .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
      assert(!Files.exists(java.nio.file.Paths.get(root, "_manifests")),
        "commit metadata leaked to the filesystem")
    }
  }

  test("4 appenders + merger + compactor + vacuum + chaos through the HTTP store: no row lost, history sound") {
    // paging (pageSize 3 vs dozens of manifests), latency, and
    // periodic 409s all on — the full client code path under the same
    // chaos invariants as the local conditional-put store
    val ep = new FakeS3Endpoint(pageSize = 3, latencyMs = 2,
      conflict409EveryN = 25)
    try {
      val st = new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests")
      val root = Files.createTempDirectory("snaphttpstress").toString + "/t"
      CondPutChaos.run(spark, root, st,
        (name, age) => ep.backdate(s"tbl/_manifests/$name", age), info(_))
    } finally ep.stop()
  }
}
