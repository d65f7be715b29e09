package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.time.format.DateTimeFormatter

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import scala.collection.immutable.TreeMap
import scala.util.Random

/** In-process loopback object store speaking the S3 REST subset
  * [[S3CommitStore]] drives (the FetchSpec loopback discipline applied
  * to the commit seam): conditional PUT (`If-None-Match: *` → 200/412,
  * linearized server-side like S3's), GET, idempotent DELETE,
  * ListObjectsV2 with a deliberately TINY page size (forces the
  * client's continuation-token paging on every multi-object listing),
  * and CopyObject-onto-itself with `x-amz-metadata-directive: REPLACE`
  * as the mtime refresh. LastModified is reported at SECOND granularity
  * — exactly what real S3 does — so every suite that runs over this
  * endpoint also exercises the protocol under quantized mtimes.
  *
  * Chaos knobs: `conflict409EveryN > 0` makes every Nth conditional PUT
  * return 409 ConditionalRequestConflict first — the transient S3
  * answer under mid-flight races — exercising the client's
  * retry-same-precondition loop. `fail5xxEveryN > 0` makes every Nth
  * request (any op) fail once with 503 SlowDown — the routine S3
  * throttle — exercising the client's bounded transient retry.
  * `latencyMs` injects uniform random sleep before each op's atomic
  * section.
  *
  * `auth = Some((accessKey, secretKey))` turns on SERVER-SIDE SigV4
  * verification: the endpoint re-derives the canonical request from the
  * RAW exchange (method, raw path, raw query, the actual header values
  * for the names listed in `SignedHeaders`, the SHA-256 of the actual
  * received body) and recomputes the signature with the shared secret —
  * any wiring bug in the client (signing the wrong payload, a header
  * that never got attached, host/port drift, query-encoding drift)
  * surfaces as a 403 SignatureDoesNotMatch, like on real S3. */
final class FakeS3Endpoint(pageSize: Int = 3, latencyMs: Int = 0,
                           conflict409EveryN: Int = 0,
                           fail5xxEveryN: Int = 0,
                           auth: Option[(String, String)] = None) {
  private val lock = new Object
  private var objects = TreeMap.empty[String, (Array[Byte], Long)]
  private val rnd = new Random(7)
  private var condPuts = 0
  private var requests = 0

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // a real endpoint serves concurrent writers concurrently — the races
  // the chaos suite creates must reach the linearization point together
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/", (x: HttpExchange) => handle(x))
  server.start()

  val port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  /** Test hook: the next conditional PUT is APPLIED (if the key is
    * absent) but answered 503 — the AWS-documented ambiguous outcome of
    * a transient failure on a conditional write, where the client's
    * retry then sees 412 for its OWN object. */
  @volatile var applyThen5xxNextCondPut: Boolean = false

  /** Test hook: age an object as if written `ageMs` ago. */
  def backdate(key: String, ageMs: Long): Unit = lock.synchronized {
    objects.get(key).foreach { case (b, _) =>
      objects += key -> (b, System.currentTimeMillis() - ageMs)
    }
  }

  private def lag(): Unit = if (latencyMs > 0) {
    val d = rnd.synchronized(rnd.nextInt(latencyMs))
    if (d > 0) Thread.sleep(d)
  }

  private def respond(x: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    if (body.isEmpty) x.sendResponseHeaders(code, -1)
    else {
      x.sendResponseHeaders(code, body.length.toLong)
      x.getResponseBody.write(body)
    }
    x.close()
  }

  private def err(code: String, msg: String): Array[Byte] =
    s"""<?xml version="1.0"?><Error><Code>$code</Code><Message>${
      xmlEsc(msg)}</Message></Error>"""
      .getBytes(StandardCharsets.UTF_8)

  private def readBody(x: HttpExchange): Array[Byte] = {
    val in = x.getRequestBody
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** SigV4 verification against the RAW exchange; Some(reason) = reject. */
  private def verifySig(x: HttpExchange, body: Array[Byte]): Option[String] =
    auth match {
      case None => None
      case Some((ak, sk)) =>
        val h = x.getRequestHeaders
        Option(h.getFirst("Authorization")).map(SigV4.parseAuthorization) match {
          case None => Some("missing Authorization header")
          case Some(None) => Some("malformed AWS4-HMAC-SHA256 Authorization")
          case Some(Some(a)) =>
            val required = Seq("host", "x-amz-date", "x-amz-content-sha256")
              .filterNot(a.signedHeaders.contains)
            val contentSha =
              Option(h.getFirst("x-amz-content-sha256")).getOrElse("")
            val actualSha = SigV4.sha256Hex(body)
            if (a.accessKey != ak) Some(s"unknown access key ${a.accessKey}")
            else if (a.service != "s3") Some(s"wrong service ${a.service}")
            else if (required.nonEmpty)
              Some(s"unsigned required headers: ${required.mkString(",")}")
            else if (contentSha != actualSha)
              Some(s"x-amz-content-sha256 $contentSha != body $actualSha")
            else {
              val amzDate = Option(h.getFirst("x-amz-date")).getOrElse("")
              if (!amzDate.startsWith(a.dateStamp))
                Some(s"x-amz-date $amzDate outside credential scope date " +
                  a.dateStamp)
              else {
                // canonical request from the raw exchange, not from
                // anything the client precomputed
                val canonHdrs = a.signedHeaders.map { n =>
                  n -> Option(h.getFirst(n)).getOrElse("")
                    .trim.replaceAll(" +", " ")
                }
                val path = Option(x.getRequestURI.getRawPath)
                  .filter(_.nonEmpty).getOrElse("/")
                val cr = x.getRequestMethod + "\n" + path + "\n" +
                  SigV4.canonicalQuery(x.getRequestURI.getRawQuery) + "\n" +
                  canonHdrs.map { case (k, v) => s"$k:$v\n" }.mkString +
                  "\n" + a.signedHeaders.mkString(";") + "\n" + contentSha
                val scope =
                  s"${a.dateStamp}/${a.region}/${a.service}/aws4_request"
                val expect = SigV4.hex(SigV4.hmac(
                  SigV4.signingKey(sk, a.dateStamp, a.region, a.service),
                  SigV4.stringToSign(amzDate, scope, cr)))
                if (expect != a.signature)
                  Some(s"signature mismatch; canonical request was:\n$cr")
                else None
              }
            }
        }
    }

  private def handle(x: HttpExchange): Unit = try {
    lag()
    // the request body must be consumed before verification (the
    // signature covers its hash) and before any injected failure (a
    // client mid-upload on a reset connection reads an IOException,
    // not the injected status)
    val body =
      if (x.getRequestMethod == "PUT") readBody(x) else Array.emptyByteArray
    verifySig(x, body) match {
      case Some(reason) =>
        respond(x, 403, err("SignatureDoesNotMatch", reason)); return
      case None => ()
    }
    if (fail5xxEveryN > 0) {
      val fire = lock.synchronized {
        requests += 1; requests % fail5xxEveryN == 0
      }
      if (fire) {
        respond(x, 503, err("SlowDown", "Please reduce your request rate."))
        return
      }
    }
    val path = x.getRequestURI.getPath.stripPrefix("/") // bucket/key...
    val slash = path.indexOf('/')
    val key = if (slash < 0) "" else path.drop(slash + 1)
    val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
    x.getRequestMethod match {
      case "GET" if q.contains("list-type=2") =>
        val params = q.split("&").iterator.map { kv =>
          val i = kv.indexOf('=')
          if (i < 0) kv -> ""
          else kv.take(i) -> java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
        }.toMap
        val prefix = params.getOrElse("prefix", "")
        val after = params.get("continuation-token")
        val all = lock.synchronized {
          objects.iterator.filter(_._1.startsWith(prefix)).toVector
        }
        val fromTok = after match {
          case Some(t) => all.dropWhile(_._1 <= t)
          case None => all
        }
        val page = fromTok.take(pageSize)
        val truncated = fromTok.size > pageSize
        val fmt = DateTimeFormatter.ISO_INSTANT
        val items = page.map { case (k, (_, m)) =>
          // SECOND granularity, like real S3's LastModified
          s"<Contents><Key>${xmlEsc(k)}</Key><LastModified>${
            fmt.format(Instant.ofEpochSecond(m / 1000))}</LastModified></Contents>"
        }.mkString
        val nxt = if (truncated)
          s"<NextContinuationToken>${xmlEsc(page.last._1)}</NextContinuationToken>"
          else ""
        respond(x, 200,
          (s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>""" +
            s"<IsTruncated>$truncated</IsTruncated>$nxt$items" +
            "</ListBucketResult>").getBytes(StandardCharsets.UTF_8))
      case "GET" =>
        lock.synchronized(objects.get(key)) match {
          case Some((b, _)) => respond(x, 200, b)
          case None => respond(x, 404, err("NoSuchKey", key))
        }
      case "DELETE" =>
        lock.synchronized { objects -= key }
        respond(x, 204, Array.emptyByteArray)
      case "PUT" if x.getRequestHeaders.containsKey("x-amz-copy-source") =>
        // CopyObject; REPLACE directive onto itself = mtime refresh
        val src = x.getRequestHeaders.getFirst("x-amz-copy-source")
          .stripPrefix("/").dropWhile(_ != '/').stripPrefix("/")
        val srcKey = java.net.URLDecoder.decode(src, "UTF-8")
        lock.synchronized(objects.get(srcKey)) match {
          case Some((b, _)) =>
            lock.synchronized {
              objects += key -> (b, System.currentTimeMillis())
            }
            respond(x, 200,
              ("""<?xml version="1.0"?><CopyObjectResult><LastModified>""" +
                DateTimeFormatter.ISO_INSTANT.format(Instant.now()) +
                "</LastModified></CopyObjectResult>")
                .getBytes(StandardCharsets.UTF_8))
          case None => respond(x, 404, err("NoSuchKey", srcKey))
        }
      case "PUT" =>
        val conditional =
          Option(x.getRequestHeaders.getFirst("If-None-Match")).contains("*")
        if (conditional && applyThen5xxNextCondPut) {
          applyThen5xxNextCondPut = false
          lock.synchronized {
            if (!objects.contains(key))
              objects += key -> (body, System.currentTimeMillis())
          }
          respond(x, 503, err("SlowDown", "applied, then 5xx")); return
        }
        if (conditional && conflict409EveryN > 0) {
          val fire = lock.synchronized { condPuts += 1; condPuts % conflict409EveryN == 0 }
          if (fire) {
            respond(x, 409, err("ConditionalRequestConflict",
              "simultaneous conditional writes")); return
          }
        }
        val ok = lock.synchronized {
          if (conditional && objects.contains(key)) false
          else { objects += key -> (body, System.currentTimeMillis()); true }
        }
        if (ok) respond(x, 200, Array.emptyByteArray)
        else respond(x, 412, err("PreconditionFailed", "At least one of the pre-conditions you specified did not hold"))
      case other =>
        respond(x, 405, err("MethodNotAllowed", other))
    }
  } catch {
    case e: Throwable =>
      try respond(x, 500, err("InternalError", e.toString))
      catch { case _: Throwable => () }
  }

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
