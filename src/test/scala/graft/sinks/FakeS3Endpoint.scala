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
  * as the mtime refresh. `conflict409EveryN > 0` makes every Nth
  * conditional PUT return 409 ConditionalRequestConflict first — the
  * transient S3 answer under mid-flight races — exercising the
  * client's retry-same-precondition loop. `latencyMs` injects uniform
  * random sleep before each op's atomic section. */
final class FakeS3Endpoint(pageSize: Int = 3, latencyMs: Int = 0,
                           conflict409EveryN: Int = 0) {
  private val lock = new Object
  private var objects = TreeMap.empty[String, (Array[Byte], Long)]
  private val rnd = new Random(7)
  private var condPuts = 0

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // a real endpoint serves concurrent writers concurrently — the races
  // the chaos suite creates must reach the linearization point together
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/", (x: HttpExchange) => handle(x))
  server.start()

  val port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

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
    s"""<?xml version="1.0"?><Error><Code>$code</Code><Message>$msg</Message></Error>"""
      .getBytes(StandardCharsets.UTF_8)

  private def handle(x: HttpExchange): Unit = try {
    lag()
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
          s"<Contents><Key>${xmlEsc(k)}</Key><LastModified>${
            fmt.format(Instant.ofEpochMilli(m))}</LastModified></Contents>"
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
        val body = {
          val in = x.getRequestBody
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        }
        val conditional =
          Option(x.getRequestHeaders.getFirst("If-None-Match")).contains("*")
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
