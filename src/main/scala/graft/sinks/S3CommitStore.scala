package graft.sinks

import java.io.{ByteArrayOutputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.nio.file.NoSuchFileException
import java.time.Instant

/** [[CommitStore]] over the S3 REST API's conditional-put subset — the
  * client half of the commit seam whose protocol half is exercised by
  * SnapshotCondPutStressSpec. Five HTTP shapes cover the five
  * primitives (reference: data_processor_utils.py:60 delegates the
  * transactional publish to its warehouse; this store IS that
  * transaction, done with S3's own primitives):
  *
  *  - [[putIfAbsent]]  → `PUT /bucket/key` with `If-None-Match: *`.
  *    S3 evaluates the precondition atomically server-side: exactly one
  *    of N concurrent creators receives 200, the rest 412
  *    (PreconditionFailed). A transient 409
  *    (ConditionalRequestConflict) means racers are mid-flight — the
  *    client retries the SAME conditional PUT; the precondition still
  *    decides the winner, so the retry loop cannot double-win.
  *  - [[read]]   → `GET /bucket/key` (404 → NoSuchFileException).
  *  - [[list]]   → `GET /bucket?list-type=2&prefix=...` (ListObjectsV2),
  *    paged via continuation tokens; `LastModified` supplies the
  *    store-side mtime. NOTE: S3 reports LastModified at SECOND
  *    granularity — coarser than a filesystem, but the claim-grace
  *    windows that read it (SnapshotTable.claimGraceMs) are tens of
  *    seconds, so the contract holds.
  *  - [[delete]] → `DELETE /bucket/key` (S3 deletes are idempotent:
  *    204 whether or not the key existed).
  *  - [[touch]]  → `PUT /bucket/key` with `x-amz-copy-source` pointing
  *    at ITSELF and `x-amz-metadata-directive: REPLACE` — CopyObject
  *    onto itself, the documented way to refresh an object's
  *    LastModified without a window in which the key is unlisted.
  *    CopyObject can return 200 WITH an error document in the body
  *    (the S3 API's long-documented quirk), so the body is checked.
  *
  * Addressing is path-style (`endpoint/bucket/key`) — the portable form
  * for custom endpoints (MinIO, localstack, a loopback fake);
  * virtual-hosted style is a DNS concern, not a protocol one.
  *
  * `headers` is the AUTHENTICATION SEAM: it is invoked per request and
  * its pairs are attached verbatim, so a deployment passes a SigV4
  * signer or a bearer-token provider there (credentials and real
  * network access are outside this build's sandbox by construction; the
  * loopback suite drives the client unauthenticated, which is also
  * exactly how MinIO's anonymous mode accepts it).
  */
final class S3CommitStore(
    endpoint: String,
    bucket: String,
    prefix: String,
    headers: () => Map[String, String] = () => Map.empty,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    condPutRetries: Int = 16) extends CommitStore {

  require(!bucket.contains("/"), s"bucket must be bare: $bucket")
  private val base = endpoint.stripSuffix("/")
  private val keyPrefix =
    if (prefix.isEmpty) "" else prefix.stripSuffix("/") + "/"

  // S3 keys tolerate most characters, but they travel in a URL path:
  // encode each path segment, keeping the separators
  private def encKey(key: String): String =
    key.split("/", -1).map(URLEncoder.encode(_, "UTF-8")
      .replace("+", "%20")).mkString("/")

  private def open(url: String, method: String,
                   extra: Seq[(String, String)]): HttpURLConnection = {
    val c = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(connectTimeoutMs)
    c.setReadTimeout(readTimeoutMs)
    c.setRequestMethod(method)
    headers().foreach { case (k, v) => c.setRequestProperty(k, v) }
    extra.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  private def drain(in: InputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  private def body(c: HttpURLConnection): Array[Byte] = {
    val s = Option(if (c.getResponseCode >= 400) c.getErrorStream
                   else c.getInputStream)
    s.map(drain).getOrElse(Array.emptyByteArray)
  }

  private def objUrl(name: String): String =
    s"$base/$bucket/${encKey(keyPrefix + name)}"

  override def putIfAbsent(name: String, bodyBytes: Array[Byte]): Boolean = {
    var attempt = 0
    while (true) {
      val c = open(objUrl(name), "PUT", Seq(
        "If-None-Match" -> "*",
        "Content-Type" -> "application/octet-stream"))
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(bodyBytes.length)
      val out = c.getOutputStream
      try out.write(bodyBytes) finally out.close()
      val code = c.getResponseCode
      val b = body(c)
      code match {
        case 200 => return true
        case 412 => return false // precondition failed: name exists
        case 409 => // racers mid-flight; the precondition re-decides
          attempt += 1
          if (attempt > condPutRetries)
            throw new IOException(
              s"putIfAbsent($name): still 409 after $condPutRetries " +
                "retries — conditional writes contended beyond reason")
          Thread.sleep(math.min(50L * attempt, 500L))
        case other =>
          throw new IOException(
            s"putIfAbsent($name): HTTP $other ${snippet(b)}")
      }
    }
    false // unreachable
  }

  override def read(name: String): Array[Byte] = {
    val c = open(objUrl(name), "GET", Nil)
    c.getResponseCode match {
      case 200 => body(c)
      case 404 => body(c); throw new NoSuchFileException(keyPrefix + name)
      case other =>
        throw new IOException(s"read($name): HTTP $other ${snippet(body(c))}")
    }
  }

  override def list(): Seq[CommitStore.Entry] = {
    val acc = Vector.newBuilder[CommitStore.Entry]
    var token: Option[String] = None
    var more = true
    while (more) {
      val qs = new StringBuilder(s"$base/$bucket?list-type=2")
      if (keyPrefix.nonEmpty)
        qs ++= s"&prefix=${URLEncoder.encode(keyPrefix, "UTF-8")}"
      token.foreach(t =>
        qs ++= s"&continuation-token=${URLEncoder.encode(t, "UTF-8")}")
      val c = open(qs.toString, "GET", Nil)
      c.getResponseCode match {
        case 200 =>
          val page = S3CommitStore.parseListing(body(c))
          page.contents.foreach { case (key, mtime) =>
            // defensive: a prefix match is a STRING match server-side,
            // so "p/x" also matches prefix "p" — keep only direct
            // children of the namespace
            if (key.startsWith(keyPrefix)) {
              val rel = key.drop(keyPrefix.length)
              if (rel.nonEmpty && !rel.contains("/"))
                acc += CommitStore.Entry(rel, mtime)
            }
          }
          more = page.truncated && page.next.nonEmpty
          token = page.next
        case 404 => more = false // bucket/namespace not there yet
        case other =>
          throw new IOException(s"list(): HTTP $other ${snippet(body(c))}")
      }
    }
    acc.result()
  }

  override def delete(name: String): Unit = {
    val c = open(objUrl(name), "DELETE", Nil)
    c.getResponseCode match {
      case 204 | 200 | 404 => body(c); ()
      case other =>
        throw new IOException(
          s"delete($name): HTTP $other ${snippet(body(c))}")
    }
  }

  override def touch(name: String): Unit = {
    val c = open(objUrl(name), "PUT", Seq(
      "x-amz-copy-source" -> s"/$bucket/${encKey(keyPrefix + name)}",
      "x-amz-metadata-directive" -> "REPLACE"))
    val code = c.getResponseCode
    val b = body(c)
    code match {
      case 200 =>
        // the 200-with-error-body CopyObject quirk
        val s = new String(b, StandardCharsets.UTF_8)
        if (s.contains("<Error>"))
          throw new IOException(s"touch($name): 200 with ${snippet(b)}")
      case 404 => () // touch of a vanished claim is a benign race
      case other =>
        throw new IOException(s"touch($name): HTTP $other ${snippet(b)}")
    }
  }

  private def snippet(b: Array[Byte]): String =
    new String(b.take(300), StandardCharsets.UTF_8)
}

object S3CommitStore {
  private[sinks] final case class Listing(
      contents: Seq[(String, Long)], truncated: Boolean,
      next: Option[String])

  /** ListObjectsV2 XML → (key, LastModified epoch-ms) pairs + paging
    * state, via the JDK's StAX parser (no dependencies, no regex over
    * XML). Only the four elements the protocol reads are interpreted. */
  private[sinks] def parseListing(xml: Array[Byte]): Listing = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
    val contents = Vector.newBuilder[(String, Long)]
    var truncated = false
    var next: Option[String] = None
    var inContents = false
    var key: String = null
    var mtime: Long = 0L
    var field: String = null
    val text = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "Contents" => inContents = true; key = null; mtime = 0L
              case n @ ("Key" | "LastModified" | "IsTruncated" |
                        "NextContinuationToken") =>
                field = n; text.clear()
              case _ => field = null
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS |
               javax.xml.stream.XMLStreamConstants.CDATA =>
            if (field != null) text ++= r.getText
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "Key" if inContents => key = text.toString
              case "LastModified" if inContents =>
                mtime = Instant.parse(text.toString.trim).toEpochMilli
              case "IsTruncated" =>
                truncated = text.toString.trim.equalsIgnoreCase("true")
              case "NextContinuationToken" =>
                next = Some(text.toString)
              case "Contents" =>
                inContents = false
                if (key != null) contents += ((key, mtime))
              case _ => ()
            }
            field = null
          case _ => ()
        }
      }
    } finally r.close()
    Listing(contents.result(), truncated, next)
  }
}
