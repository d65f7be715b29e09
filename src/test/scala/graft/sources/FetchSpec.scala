package graft.sources

import graft.SparkSpec
import java.io.{FileOutputStream, IOException}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.types._

class FetchSpec extends SparkSpec {

  private def mkZip(dir: String, members: Map[String, String]): String = {
    val zipPath = Paths.get(dir, "bundle.zip")
    val zos = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    members.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    zipPath.toString
  }

  test("fetch -> unzip -> CsvBundle -> ColumnNormalizer end-to-end") {
    val fixture = Files.createTempDirectory("fetch-fixture").toString
    val staging = Files.createTempDirectory("fetch-staging").toString
    // two same-schema CSV members with messy headers (the code_point /
    // GTFS multi-member shape)
    val zip = mkZip(fixture, Map(
      "area_a.csv" -> "Post Code,Total Count\nA1,10\nA2,20\n",
      "area_b.csv" -> "Post Code,Total Count\nB1,30\n"))

    val members = Fetch.fetchZip(s"file://$zip", staging)
    assert(members.size === 2)
    assert(members.forall(p => Files.exists(Paths.get(p))))

    val schema = StructType(Seq(
      StructField("Post Code", StringType), StructField("Total Count", IntegerType)))
    val df = ColumnNormalizer.snakeCase(
      CsvBundle.read(spark, Paths.get(members.head).getParent.toString, schema,
        header = true))
    assert(df.columns.toSeq === Seq("post_code", "total_count"))
    assert(df.count() === 3)
    import spark.implicits._
    assert(df.selectExpr("sum(total_count)").as[Long].head() === 60L)
  }

  test("fetch -> unzip -> XmlSource: the NaPTAN/GTFS zip-of-XML shape") {
    val fixture = Files.createTempDirectory("fetch-xml").toString
    val staging = Files.createTempDirectory("fetch-xml-staging").toString
    val zip = mkZip(fixture, Map(
      "stops.xml" ->
        """<StopPoints>
          |  <StopPoint><AtcoCode>490001</AtcoCode><CommonName>Angel</CommonName></StopPoint>
          |  <StopPoint><AtcoCode>490002</AtcoCode><CommonName>Bank</CommonName></StopPoint>
          |</StopPoints>""".stripMargin))
    val members = Fetch.fetchZip(s"file://$zip", staging)
    val df = XmlSource.read(spark, members.head, rowTag = "StopPoint")
    import spark.implicits._
    assert(df.count() === 2)
    assert(df.select("CommonName").as[String].collect().sorted.toSeq
      === Seq("Angel", "Bank"))
  }

  test("redirect hub: same-host 301 chain is resolved before download") {
    // the ArcGIS-hub shape (national_stat_postcode_lookup.py:46): the
    // published URL 301s (twice) to the actual artifact on the same host
    val body = "k,v\n1,2\n".getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hub", (x: com.sun.net.httpserver.HttpExchange) => {
      x.getResponseHeaders.add("Location", "/hop2") // relative Location
      x.sendResponseHeaders(301, -1); x.close()
    })
    server.createContext("/hop2", (x: com.sun.net.httpserver.HttpExchange) => {
      val p = x.getHttpContext.getServer.getAddress.getPort
      x.getResponseHeaders.add("Location", s"http://127.0.0.1:$p/real.csv")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.createContext("/real.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(200, body.length.toLong)
      x.getResponseBody.write(body); x.close()
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-redir").toString
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchToStaging(s"http://127.0.0.1:$port/hub", staging,
        maxRetries = 2, baseDelayMs = 1)
      assert(f.attempts === 1)
      // destination stays keyed to the REQUESTED url, not the target
      assert(Paths.get(f.path).getFileName.toString === "hub")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
    } finally server.stop(0)
  }

  test("redirect policy: cross-host refused unless allow-listed; hop bound enforced") {
    val body = "ok".getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // 'localhost' and '127.0.0.1' are the same loopback but DIFFERENT
    // hosts to the policy — a cross-host hop testable without egress
    server.createContext("/cross", (x: com.sun.net.httpserver.HttpExchange) => {
      val p = x.getHttpContext.getServer.getAddress.getPort
      x.getResponseHeaders.add("Location", s"http://localhost:$p/ok.csv")
      x.sendResponseHeaders(301, -1); x.close()
    })
    server.createContext("/loop", (x: com.sun.net.httpserver.HttpExchange) => {
      x.getResponseHeaders.add("Location", "/loop")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.createContext("/ok.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(200, body.length.toLong)
      x.getResponseBody.write(body); x.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val crossErr = intercept[IOException] {
        Fetch.resolveRedirects(s"http://127.0.0.1:$port/cross")
      }
      assert(crossErr.getMessage.contains("off-policy"))
      // the explicit allow-list follows the same hop
      val resolved = Fetch.resolveRedirects(s"http://127.0.0.1:$port/cross",
        allowHosts = Set("localhost"))
      assert(resolved === s"http://localhost:$port/ok.csv")
      val loopErr = intercept[IOException] {
        Fetch.resolveRedirects(s"http://127.0.0.1:$port/loop", maxHops = 3)
      }
      assert(loopErr.getMessage.contains("exceeded 3 hops"))
    } finally server.stop(0)
  }

  test("fetchResumable resumes THROUGH a redirect hub (Range hits the target)") {
    val body = (1 to 3000).map(i => s"row-$i").mkString("\n").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sawRange: String = null
    server.createContext("/hub", (x: com.sun.net.httpserver.HttpExchange) => {
      x.getResponseHeaders.add("Location", "/artifact.csv")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.createContext("/artifact.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      val range = x.getRequestHeaders.getFirst("Range")
      if (n == 1) { // first body attempt: cut the connection mid-body
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body, 0, 1000); x.close()
      } else {
        sawRange = range
        val from = range.stripPrefix("bytes=").stripSuffix("-").toInt
        x.getResponseHeaders.add("Content-Range",
          s"bytes $from-${body.length - 1}/${body.length}")
        x.sendResponseHeaders(206, (body.length - from).toLong)
        x.getResponseBody.write(body, from, body.length - from); x.close()
      }
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-redir-resume").toString
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/hub", staging,
        maxRetries = 3, baseDelayMs = 1)
      assert(f.attempts === 2)
      assert(sawRange === "bytes=1000-",
        "the resume Range request did not reach the resolved artifact")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
    } finally server.stop(0)
  }

  test("fetchToStaging retries then fails with attempt count in the error") {
    val staging = Files.createTempDirectory("fetch-retry").toString
    val err = intercept[IOException] {
      Fetch.fetchToStaging("file:///nonexistent/no-such-file.zip", staging,
        maxRetries = 3, baseDelayMs = 1)
    }
    assert(err.getMessage.contains("3 attempts"))
    // no truncated partial files left behind
    val leftovers = Files.list(Paths.get(staging)).count()
    assert(leftovers === 0)
  }

  test("fetchMany fetches concurrently, preserving input order") {
    val fixture = Files.createTempDirectory("fetch-many").toString
    val staging = Files.createTempDirectory("fetch-many-staging").toString
    val urls = (1 to 3).map { i =>
      val p = Paths.get(fixture, s"src$i.csv")
      Files.writeString(p, s"id\n$i\n")
      s"file://$p"
    }
    val fetched = Fetch.fetchMany(urls, staging, parallelism = 3)
    assert(fetched.map(_.url) === urls)
    assert(fetched.forall(f => Files.exists(Paths.get(f.path))))
    assert(Files.readString(Paths.get(fetched(2).path)) === "id\n3\n")
  }

  test("unzip refuses zip-slip entries") {
    val fixture = Files.createTempDirectory("fetch-slip").toString
    val zip = mkZip(fixture, Map("../escape.txt" -> "nope"))
    val err = intercept[IOException] {
      Fetch.unzip(zip, Paths.get(fixture, "out").toString)
    }
    assert(err.getMessage.contains("escapes"))
  }

  test("fetched file lands atomically with full content") {
    val fixture = Files.createTempDirectory("fetch-file").toString
    val staging = Files.createTempDirectory("fetch-file-staging").toString
    val src = Paths.get(fixture, "data.csv")
    Files.writeString(src, "a,b\n1,2\n")
    val f = Fetch.fetchToStaging(s"file://$src", staging)
    assert(f.nBytes === Files.size(src))
    assert(f.attempts === 1)
    assert(Files.readString(Paths.get(f.path)) === "a,b\n1,2\n")
  }

  test("truncated first download: retry succeeds, no partial file ever visible") {
    // loopback HTTP server (JDK built-in) that declares the full length
    // but cuts the connection mid-body on the FIRST request only — the
    // flaky-CDN case the reference's retry loop exists for
    val body = ("k,v\n" + (1 to 500).map(i => s"$i,${i * 2}").mkString("\n")).getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var partialVisibleDuringRetry = false
    val staging = Files.createTempDirectory("fetch-trunc-staging").toString
    val dest = Paths.get(staging, "data.csv")
    server.createContext("/data.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      if (n == 1) {
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body, 0, 40) // truncate mid-body
        x.close()                            // client sees EOF before length
      } else {
        // attempt 1 failed by now: a correct fetch left NOTHING at dest
        partialVisibleDuringRetry = Files.exists(dest)
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body)
        x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchToStaging(s"http://127.0.0.1:$port/data.csv", staging,
        maxRetries = 3, baseDelayMs = 1)
      assert(f.attempts === 2)
      assert(!partialVisibleDuringRetry,
        "a truncated attempt left a partial file at the destination")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
      // and no temp-file litter either
      import scala.jdk.CollectionConverters._
      val leftovers = Files.list(Paths.get(staging)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith(".part-")).toSeq
      assert(leftovers.isEmpty, s"temp files left behind: $leftovers")
    } finally server.stop(0)
  }

  test("fetchResumable: a 206 with unknown total uses the sidecar total — a truncated resume is never promoted") {
    val body = (1 to 3000).map(i => s"r$i").mkString("\n").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/u.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      requests.incrementAndGet() match {
        case 1 => // full 200 declaring the length, cut at 500 bytes
          x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body, 0, 500); x.close()
        case 2 =>
          // resume answered with an RFC-valid UNKNOWN total
          // ("bytes 500-/*") and cut again after 700 bytes, closing
          // CLEANLY — without the sidecar fallback this truncation
          // passes the completion check and promotes a short file
          x.getResponseHeaders.add("Content-Range", s"bytes 500-/*")
          x.sendResponseHeaders(206, 0) // chunked: EOF looks clean
          x.getResponseBody.write(body, 500, 700); x.close()
        case _ => // proper resume to the end
          val have = 1200
          x.getResponseHeaders.add("Content-Range",
            s"bytes $have-${body.length - 1}/${body.length}")
          x.sendResponseHeaders(206, (body.length - have).toLong)
          x.getResponseBody.write(body, have, body.length - have); x.close()
      }
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-unknown-total").toString
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/u.csv", staging,
        maxRetries = 4, baseDelayMs = 1)
      assert(f.attempts === 3)
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
    } finally server.stop(0)
  }

  test("fetchResumable: a FLAPPING server (seeded 500s / short bodies / resets) still yields exact bytes, no litter") {
    // the stress twin of the single-fault cases above: every request the
    // server either 500s, serves a random fragment of what was asked and
    // slams the connection, or (from request 9) behaves — the client must
    // ratchet forward through the flaps and finish byte-exact
    val body = (1 to 5000).map(i => s"row$i,payload$i").mkString("\n").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val rnd = new java.util.Random(0xF1AB16L)
    server.createContext("/flap.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      val from = Option(x.getRequestHeaders.getFirst("Range"))
        .map(_.stripPrefix("bytes=").stripSuffix("-").toLong).getOrElse(0L)
      val rest = body.length - from.toInt
      val mode = if (n >= 9) 2 else rnd.nextInt(2)
      mode match {
        case 0 => // transient server error
          x.sendResponseHeaders(500, -1); x.close()
        case 1 => // declare the full remainder, deliver a fragment, slam
          val frag = 1 + rnd.nextInt(math.max(1, rest / 3))
          if (from > 0) {
            x.getResponseHeaders.add("Content-Range",
              s"bytes $from-${body.length - 1}/${body.length}")
            x.sendResponseHeaders(206, rest.toLong)
          } else x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body, from.toInt, frag); x.close()
        case _ => // honest full remainder
          if (from > 0) {
            x.getResponseHeaders.add("Content-Range",
              s"bytes $from-${body.length - 1}/${body.length}")
            x.sendResponseHeaders(206, rest.toLong)
          } else x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body, from.toInt, rest); x.close()
      }
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-flap").toString
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/flap.csv", staging,
        maxRetries = 20, baseDelayMs = 1)
      assert(f.attempts > 1, "the flap plan never flapped")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
      import scala.jdk.CollectionConverters._
      val litter = Files.list(Paths.get(staging)).iterator().asScala
        .map(_.getFileName.toString).filter(_.contains(".part")).toSeq
      assert(litter.isEmpty, s"part litter: $litter")
    } finally server.stop(0)
  }

  test("fetchResumable: a misaligned 206 discards the stale part and restarts from zero") {
    val body = (1 to 2000).map(i => s"m$i").mkString("\n").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var thirdHadRange: String = "unset"
    server.createContext("/m.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      requests.incrementAndGet() match {
        case 1 =>
          x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body, 0, 500); x.close()
        case 2 =>
          // broken proxy: client asked bytes=500-, response restarts at 0
          // — appending it would interleave the file's own prefix at
          // offset 500
          x.getResponseHeaders.add("Content-Range",
            s"bytes 0-699/${body.length}")
          x.sendResponseHeaders(206, 700L)
          x.getResponseBody.write(body, 0, 700); x.close()
        case _ =>
          // after the discard the client restarts WITHOUT a Range header
          thirdHadRange = x.getRequestHeaders.getFirst("Range")
          x.sendResponseHeaders(200, body.length.toLong)
          x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-misaligned").toString
    try {
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/m.csv", staging,
        maxRetries = 4, baseDelayMs = 1)
      assert(f.attempts === 3)
      assert(thirdHadRange === null, "stale part survived the misalignment")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
      import scala.jdk.CollectionConverters._
      val litter = Files.list(Paths.get(staging)).iterator().asScala
        .map(_.getFileName.toString).filter(_.contains(".part")).toSeq
      assert(litter.isEmpty, s"part litter: $litter")
    } finally server.stop(0)
  }

  test("a redirect to a non-http scheme is refused outright") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hub", (x: com.sun.net.httpserver.HttpExchange) => {
      x.getResponseHeaders.add("Location", "ftp://127.0.0.1/evil.zip")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.start()
    val staging = Files.createTempDirectory("fetch-ftp").toString
    try {
      val port = server.getAddress.getPort
      val e = intercept[IOException] {
        Fetch.fetchToStaging(s"http://127.0.0.1:$port/hub", staging,
          maxRetries = 1, baseDelayMs = 1)
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
      assert(msgs.contains("off-policy"), msgs)
    } finally server.stop(0)
  }

  test("discoverJsonResources surfaces a non-2xx status instead of 'not JSON'") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(500, -1); x.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val e = intercept[IOException](
        Fetch.discoverJsonResources(s"http://127.0.0.1:$port/api"))
      assert(e.getMessage.contains("HTTP 500"), e.getMessage)
    } finally server.stop(0)
  }

  test("fetchMany threads the redirect allow-list through to each fetch") {
    val body = "x,y\n1,2\n".getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/real.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      x.sendResponseHeaders(200, body.length.toLong)
      x.getResponseBody.write(body); x.close()
    })
    server.createContext("/r", (x: com.sun.net.httpserver.HttpExchange) => {
      val p = x.getHttpContext.getServer.getAddress.getPort
      // 'localhost' is a DIFFERENT host than '127.0.0.1' for the policy
      x.getResponseHeaders.add("Location", s"http://localhost:$p/real.csv")
      x.sendResponseHeaders(302, -1); x.close()
    })
    server.start()
    val staging = Files.createTempDirectory("fetchmany-allow").toString
    try {
      val port = server.getAddress.getPort
      val got = Fetch.fetchMany(Seq(s"http://127.0.0.1:$port/r"), staging,
        maxRetries = 1, baseDelayMs = 1,
        allowRedirectHosts = Set("localhost"))
      assert(got.size === 1)
      assert(Files.readAllBytes(Paths.get(got.head.path)).toSeq === body.toSeq)
    } finally server.stop(0)
  }

  test("fetchResumable continues an interrupted download with a Range request") {
    val body = (1 to 4000).map(i => s"row-$i").mkString("\n").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sawRange: String = null
    @volatile var sawIfRange: String = null
    server.createContext("/big.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      val range = x.getRequestHeaders.getFirst("Range")
      if (n == 1) {
        // full 200 response, but the connection dies after 1000 bytes
        x.getResponseHeaders.set("ETag", "\"v7\"")
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body, 0, 1000)
        x.close()
      } else {
        sawRange = range
        sawIfRange = x.getRequestHeaders.getFirst("If-Range")
        val from = range.stripPrefix("bytes=").stripSuffix("-").toInt
        x.getResponseHeaders.set("Content-Range",
          s"bytes $from-${body.length - 1}/${body.length}")
        x.sendResponseHeaders(206, (body.length - from).toLong)
        x.getResponseBody.write(body, from, body.length - from)
        x.close()
      }
    })
    server.start()
    try {
      val staging = Files.createTempDirectory("fetch-resume").toString
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/big.csv", staging,
        maxRetries = 3, baseDelayMs = 1)
      assert(f.attempts === 2)
      assert(sawRange === "bytes=1000-",
        "second attempt must resume exactly where the bytes stopped")
      assert(sawIfRange === "\"v7\"",
        "the resume must carry the first response's validator as If-Range")
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq)
      assert(!Files.exists(Paths.get(f.path + ".part")))
      assert(!Files.exists(Paths.get(f.path + ".part.meta")))
    } finally server.stop(0)
  }

  test("fetchResumable treats 416 on an already-complete part as success") {
    val body = (1 to 300).map(i => s"x$i").mkString("|").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/done.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      if (n == 1) {
        // all bytes arrive, but the declared length is a lie (+1), so
        // the client records an incomplete attempt and retries with
        // bytes=<size>- ... which is past the end: 416
        x.getResponseHeaders.set("ETag", "\"same\"")
        x.sendResponseHeaders(200, body.length.toLong + 1)
        x.getResponseBody.write(body)
        x.close()
      } else {
        x.getResponseHeaders.set("Content-Range", s"bytes */${body.length}")
        x.sendResponseHeaders(416, -1)
        x.close()
      }
    })
    server.start()
    try {
      val staging = Files.createTempDirectory("fetch-416").toString
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/done.csv", staging,
        maxRetries = 3, baseDelayMs = 1)
      assert(f.attempts === 2)
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq,
        "416 with a complete .part must finish the fetch, not error")
    } finally server.stop(0)
  }

  test("fetchResumable restarts cleanly when the server ignores Range") {
    val body = (1 to 2000).map(i => s"r$i").mkString(",").getBytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/noresume.csv", (x: com.sun.net.httpserver.HttpExchange) => {
      val n = requests.incrementAndGet()
      if (n == 1) {
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body, 0, 500)
        x.close()
      } else {
        // plain 200 ignoring the Range header: client must restart, not append
        x.sendResponseHeaders(200, body.length.toLong)
        x.getResponseBody.write(body)
        x.close()
      }
    })
    server.start()
    try {
      val staging = Files.createTempDirectory("fetch-noresume").toString
      val port = server.getAddress.getPort
      val f = Fetch.fetchResumable(s"http://127.0.0.1:$port/noresume.csv",
        staging, maxRetries = 3, baseDelayMs = 1)
      assert(f.attempts === 2)
      assert(Files.readAllBytes(Paths.get(f.path)).toSeq === body.toSeq,
        "appending a full restart onto stale part bytes would corrupt the file")
    } finally server.stop(0)
  }

  test("discoverLinks: attachment hrefs on a hub page, allow-listed and bounded") {
    // the gov.uk BDUK publication shape (bduk_premises_sept_2025.py:58-99):
    // gem-c-attachment sections with .zip asset hrefs — some relative, some
    // absolute on an asset CDN host, plus decoys the scan must skip
    val hub =
      """<html><body>
        |<section class="gem-c-attachment">
        |  <h3 class="gem-c-attachment__title">Region West</h3>
        |  <a href="/assets/bduk_west.zip">Download</a></section>
        |<section class="gem-c-attachment">
        |  <a href="HTTP_CDN/releases/bduk_east.zip?v=1&amp;x=2">East</a></section>
        |<a href="/guide.pdf">not a zip</a>
        |<a href="http://evil.invalid/bduk_fake.zip">off-host zip</a>
        |<a href="/assets/bduk_west.zip">duplicate</a>
        |</body></html>""".stripMargin
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/pub", (x: com.sun.net.httpserver.HttpExchange) => {
      val p = x.getHttpContext.getServer.getAddress.getPort
      // 'localhost' = the allow-listed CDN host (distinct host, same loopback)
      val body = hub.replace("HTTP_CDN", s"http://localhost:$p").getBytes("UTF-8")
      x.sendResponseHeaders(200, body.length.toLong)
      x.getResponseBody.write(body); x.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val links = Fetch.discoverLinks(s"http://127.0.0.1:$port/pub", "\\.zip".r,
        allowHosts = Set("localhost"))
      assert(links === Seq(
        s"http://127.0.0.1:$port/assets/bduk_west.zip",
        s"http://localhost:$port/releases/bduk_east.zip?v=1&x=2"),
        "relative resolved + allow-listed CDN kept, in page order, deduped; " +
          "off-host and non-matching hrefs dropped")
      // without the allow-list the CDN link is off-policy
      assert(Fetch.discoverLinks(s"http://127.0.0.1:$port/pub", "\\.zip".r)
        === Seq(s"http://127.0.0.1:$port/assets/bduk_west.zip"))
      // the size bound refuses a page that is actually an artifact
      val e = intercept[IOException] {
        Fetch.discoverLinks(s"http://127.0.0.1:$port/pub", "\\.zip".r,
          maxBytes = 16)
      }
      assert(e.getMessage.contains("exceeds"))
    } finally server.stop(0)
  }

  test("discoverLinks resolves file:// hubs (fixture-driven pipelines)") {
    val dir = Files.createTempDirectory("hub-fixture")
    Files.write(dir.resolve("region_a.zip"), Array[Byte](0x50, 0x4B))
    Files.write(dir.resolve("hub.html"),
      """<a href="region_a.zip">A</a><a href="other.txt">no</a>"""
        .getBytes("UTF-8"))
    val links = Fetch.discoverLinks(s"file://$dir/hub.html", "\\.zip$".r)
    // URI.resolve renders the single-slash authority-less form; both are
    // equivalent and the JDK opens either
    assert(links === Seq(s"file:$dir/region_a.zip"))
    assert(Files.readAllBytes(Paths.get(new java.net.URI(links.head))).length === 2)
  }
}
