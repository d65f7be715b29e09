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

  private val testCreds = ("AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")

  private def withEndpoint[A](pageSize: Int = 3, latencyMs: Int = 0,
                              conflict409EveryN: Int = 0,
                              fail5xxEveryN: Int = 0,
                              signed: Boolean = false)
                             (f: (FakeS3Endpoint, S3CommitStore) => A): A = {
    val ep = new FakeS3Endpoint(pageSize, latencyMs, conflict409EveryN,
      fail5xxEveryN, auth = if (signed) Some(testCreds) else None)
    val auth = if (signed)
      new SigV4Signer(testCreds._1, testCreds._2, "us-east-1")
    else S3RequestAuth.anonymous
    try f(ep, new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests", auth))
    finally ep.stop()
  }

  test("a transiently-failed conditional PUT that actually landed reports WIN, not loss") {
    withEndpoint() { (ep, st) =>
      val body = "manifest A".getBytes(StandardCharsets.UTF_8)
      ep.applyThen5xxNextCondPut = true
      // 503 (but applied server-side) -> transient retry -> 412 -> the
      // ambiguity resolver GETs and matches our writer-unique body
      assert(st.putIfAbsent("manifest-amb", body))
      assert(java.util.Arrays.equals(st.read("manifest-amb"), body))
    }
  }

  test("412 after a transient retry against ANOTHER writer's object stays a loss") {
    withEndpoint() { (ep, st) =>
      assert(st.putIfAbsent("manifest-race",
        "writer B".getBytes(StandardCharsets.UTF_8)))
      ep.applyThen5xxNextCondPut = true
      // 503 (nothing applied: B holds the key) -> retry -> 412 -> GET
      // mismatches -> genuine loss
      assert(!st.putIfAbsent("manifest-race",
        "writer A".getBytes(StandardCharsets.UTF_8)))
    }
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

  test("SigV4 signed mode: every op verifies server-side against the raw exchange") {
    withEndpoint(pageSize = 2, signed = true) { (ep, st) =>
      // paths with encoded segments, query paging, conditional PUT,
      // copy-source touch, delete — each op's signature is recomputed
      // by the endpoint from the raw request and must match
      (1 to 5).foreach(i =>
        assert(st.putIfAbsent(s"manifest-$i", s"v$i".getBytes)))
      assert(!st.putIfAbsent("manifest-1", "other".getBytes))
      assert(new String(st.read("manifest-2")) == "v2")
      assert(st.list().map(_.name).sorted ==
        (1 to 5).map(i => s"manifest-$i"))
      st.touch("manifest-3")
      st.delete("manifest-4")
      assert(st.list().map(_.name).sorted ==
        Seq("manifest-1", "manifest-2", "manifest-3", "manifest-5"))
      // a signer with the WRONG secret is rejected with 403, loudly
      val bad = new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests",
        new SigV4Signer(testCreds._1, "not-the-secret", "us-east-1"))
      val e = intercept[java.io.IOException](bad.read("manifest-1"))
      assert(e.getMessage.contains("403") &&
        e.getMessage.contains("SignatureDoesNotMatch"), e.getMessage)
      // ...and so is an anonymous client against a verifying endpoint
      val anon = new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests")
      intercept[java.io.IOException](anon.list())
    }
  }

  test("transient 503 SlowDown is retried with backoff on every op") {
    withEndpoint(fail5xxEveryN = 3) { (_, st) =>
      // every 3rd request bounces 503 once; all five ops must converge
      (1 to 6).foreach(i =>
        assert(st.putIfAbsent(s"manifest-$i", Array(i.toByte))))
      assert(st.read("manifest-2")(0) == 2.toByte)
      assert(st.list().size == 6)
      st.touch("manifest-3")
      st.delete("manifest-5")
      assert(st.list().size == 5)
    }
  }

  test("a truncated listing page without a continuation token fails loudly") {
    // a silent partial listing would read as complete manifest history;
    // the client must refuse. Minimal endpoint returning the broken page:
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
      val b = ("""<?xml version="1.0"?><ListBucketResult>""" +
        "<IsTruncated>true</IsTruncated>" +
        "<Contents><Key>p/claim-1</Key>" +
        "<LastModified>2026-08-16T12:00:01Z</LastModified></Contents>" +
        "</ListBucketResult>").getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, b.length.toLong)
      x.getResponseBody.write(b)
      x.close()
    })
    server.start()
    try {
      val st = new S3CommitStore(
        s"http://127.0.0.1:${server.getAddress.getPort}", "bkt", "p")
      val e = intercept[java.io.IOException](st.list())
      assert(e.getMessage.contains("NextContinuationToken"), e.getMessage)
    } finally server.stop(0)
  }

  test("second-quantized LastModified: heartbeat-vs-backdate void race loses loudly on exactly one side") {
    withEndpoint() { (ep, st) =>
      val root = Files.createTempDirectory("snapquant").toString + "/t"
      CondPutChaos.quantizedVoidRace(spark, root, st,
        (name, age) => ep.backdate(s"tbl/_manifests/$name", age), info(_))
    }
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

  test("4 appenders + merger + compactor + vacuum + chaos through the SIGNED HTTP store: no row lost, history sound") {
    // paging (pageSize 3 vs dozens of manifests), latency, periodic
    // 409s, periodic 503s, AND SigV4 verification all on — the full
    // client code path, authenticated, under the same chaos invariants
    // as the local conditional-put store
    val ep = new FakeS3Endpoint(pageSize = 3, latencyMs = 2,
      conflict409EveryN = 25, fail5xxEveryN = 40, auth = Some(testCreds))
    try {
      val st = new S3CommitStore(ep.endpoint, "bkt", "tbl/_manifests",
        new SigV4Signer(testCreds._1, testCreds._2, "us-east-1"))
      val root = Files.createTempDirectory("snaphttpstress").toString + "/t"
      CondPutChaos.run(spark, root, st,
        (name, age) => ep.backdate(s"tbl/_manifests/$name", age), info(_))
    } finally ep.stop()
  }
}
