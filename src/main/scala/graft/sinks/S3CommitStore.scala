package graft.sinks

import java.io.{ByteArrayOutputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI}
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
  *    seconds, so the contract holds (and the protocol's safety never
  *    rests on the mtime: a mis-aged claim makes the void/land race
  *    fire, and exactly one side wins the conditional put — the
  *    quantization chaos case in S3CommitStoreSpec pins this).
  *  - [[delete]] → `DELETE /bucket/key` (S3 deletes are idempotent:
  *    204 whether or not the key existed).
  *  - [[touch]]  → `PUT /bucket/key` with `x-amz-copy-source` pointing
  *    at ITSELF and `x-amz-metadata-directive: REPLACE` — CopyObject
  *    onto itself, the documented way to refresh an object's
  *    LastModified without a window in which the key is unlisted.
  *    CopyObject can return 200 WITH an error document in the body
  *    (the S3 API's long-documented quirk), so the body is checked.
  *
  * Transient server errors (500 InternalError / 502 / 503 SlowDown /
  * 504 — routine under load on real S3) are retried with bounded
  * backoff on EVERY op: GET/DELETE/LIST are idempotent, and the
  * conditional PUT's server-side precondition makes its retry safe by
  * the same argument as the 409 loop (the precondition re-decides; a
  * retry cannot double-win).
  *
  * Addressing is path-style (`endpoint/bucket/key`) — the portable form
  * for custom endpoints (MinIO, localstack, a loopback fake);
  * virtual-hosted style is a DNS concern, not a protocol one. Keys and
  * query values are strict-RFC-3986 encoded ([[SigV4.uriEncode]]), so
  * the bytes on the wire are exactly SigV4's canonical bytes.
  *
  * `auth` is the AUTHENTICATION SEAM: invoked per request with the
  * method, URL, headers and payload exactly as sent, returning headers
  * to attach — pass a [[SigV4Signer]] for a real bucket (verified
  * against AWS's published test vectors in SigV4Spec, and server-side
  * by FakeS3Endpoint's signed mode), a bearer-token shim for
  * S3-compatible stores, or leave anonymous for loopback/MinIO
  * anonymous mode. */
final class S3CommitStore(
    endpoint: String,
    bucket: String,
    prefix: String,
    auth: S3RequestAuth = S3RequestAuth.anonymous,
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 60000,
    condPutRetries: Int = 16,
    transientRetries: Int = 5) extends CommitStore {

  require(!bucket.contains("/"), s"bucket must be bare: $bucket")
  private val base = endpoint.stripSuffix("/")
  private val keyPrefix =
    if (prefix.isEmpty) "" else prefix.stripSuffix("/") + "/"

  // S3 keys tolerate most characters, but they travel in a URL path:
  // strict-encode each segment, keeping the separators — the encoded
  // form is also byte-for-byte the SigV4 canonical URI
  private def encKey(key: String): String =
    key.split("/", -1).map(SigV4.uriEncode(_)).mkString("/")

  private def open(url: String, method: String,
                   extra: Seq[(String, String)],
                   payload: Array[Byte]): HttpURLConnection = {
    val uri = URI.create(url)
    val c = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(connectTimeoutMs)
    c.setReadTimeout(readTimeoutMs)
    c.setRequestMethod(method)
    val signed = extra ++ auth.sign(method, uri, extra, payload)
    signed.foreach { case (k, v) => c.setRequestProperty(k, v) }
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

  private def isTransient(code: Int): Boolean =
    code == 500 || code == 502 || code == 503 || code == 504

  /** The documented CopyObject quirk: a 200 whose body carries an
    * <Error> that is itself transient (InternalError/SlowDown) — the
    * same retryable condition as a real 500/503, just delivered after
    * the 200 status line. */
  private[sinks] def isTransient200Body(code: Int, b: Array[Byte]): Boolean =
    code == 200 && {
      val s = new String(b, StandardCharsets.UTF_8)
      s.contains("<Error>") &&
        (s.contains("InternalError") || s.contains("SlowDown"))
    }

  /** One request, transient 5xx (and transient-in-200 error bodies left
    * unhandled by `handle`) retried with bounded backoff; `handle` maps
    * the terminal (code, body) — codes it leaves unhandled throw.
    * `onTransientRetry` fires once per retry so callers whose outcome
    * becomes AMBIGUOUS after a transient failure (a 500 on a
    * conditional PUT may have been applied server-side) can tell —
    * see [[putIfAbsent]]. */
  private def http[A](what: String)(send: () => HttpURLConnection)
                     (handle: PartialFunction[(Int, Array[Byte]), A],
                      onTransientRetry: () => Unit = () => ()): A = {
    var attempt = 0
    while (true) {
      val c = send()
      val code = c.getResponseCode
      val b = body(c)
      if (handle.isDefinedAt((code, b))) return handle((code, b))
      val transient = isTransient(code) || isTransient200Body(code, b)
      if (transient && attempt < transientRetries) {
        attempt += 1
        onTransientRetry()
        Thread.sleep(math.min(50L * attempt, 500L))
      } else
        throw new IOException(s"$what: HTTP $code ${snippet(b)}" +
          (if (transient) s" (after $attempt transient retries)"
           else ""))
    }
    throw new IllegalStateException("unreachable")
  }

  override def putIfAbsent(name: String, bodyBytes: Array[Byte]): Boolean = {
    val send = () => {
      val c = open(objUrl(name), "PUT", Seq(
        "If-None-Match" -> "*",
        "Content-Type" -> "application/octet-stream"), bodyBytes)
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(bodyBytes.length)
      val out = c.getOutputStream
      try out.write(bodyBytes) finally out.close()
      c
    }
    var attempt409 = 0
    // AWS documents that a transient 500 on a conditional write may have
    // been APPLIED server-side: if this request ever retried through a
    // transient failure, a subsequent 412 is ambiguous — it may be OUR
    // earlier attempt's object. A GET-and-compare resolves it EXACTLY
    // when the body is writer-unique (manifests/voids are; returning
    // false there would tell the writer to retry and double-append —
    // ADVICE r20). It is UNSOUND for shared bodies used as mutual-
    // exclusion markers: the empty claim-N bodies compare equal across
    // writers, and a matched-but-not-ours claim would let two writers
    // both "hold" a version (measured: the chaos suite's void race).
    // Empty bodies therefore keep the conservative false — for the
    // claim protocol a false loss only burns a slot, which vacuum
    // reclaims by design.
    var retriedTransient = false
    while (true) {
      val done = http(s"putIfAbsent($name)")(send)({
        case (200, _) => Some(true)
        case (412, _) if !retriedTransient || bodyBytes.isEmpty =>
          Some(false) // precondition failed: name exists
        case (412, _) =>
          val current =
            try Some(read(name))
            catch { case _: NoSuchFileException => None }
          Some(current.exists(java.util.Arrays.equals(_, bodyBytes)))
        case (409, _) => None // racers mid-flight; precondition re-decides
      }, onTransientRetry = () => retriedTransient = true)
      done match {
        case Some(r) => return r
        case None =>
          attempt409 += 1
          if (attempt409 > condPutRetries)
            throw new IOException(
              s"putIfAbsent($name): still 409 after $condPutRetries " +
                "retries — conditional writes contended beyond reason")
          Thread.sleep(math.min(50L * attempt409, 500L))
      }
    }
    false // unreachable
  }

  override def read(name: String): Array[Byte] =
    http(s"read($name)")(() =>
        open(objUrl(name), "GET", Nil, Array.emptyByteArray)) {
      case (200, b) => b
      case (404, _) => throw new NoSuchFileException(keyPrefix + name)
    }

  override def list(): Seq[CommitStore.Entry] = {
    val acc = Vector.newBuilder[CommitStore.Entry]
    var token: Option[String] = None
    var more = true
    while (more) {
      val qs = new StringBuilder(s"$base/$bucket?list-type=2")
      if (keyPrefix.nonEmpty)
        qs ++= s"&prefix=${SigV4.uriEncode(keyPrefix)}"
      token.foreach(t => qs ++= s"&continuation-token=${SigV4.uriEncode(t)}")
      val done = http("list()")(() =>
          open(qs.toString, "GET", Nil, Array.emptyByteArray)) {
        case (200, b) =>
          val page = S3CommitStore.parseListing(b)
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
          if (page.truncated && page.next.isEmpty)
            // a silent partial listing here would read as COMPLETE
            // manifest history to SnapshotTable — refuse loudly instead
            throw new IOException(
              "list(): truncated page carried no NextContinuationToken " +
                "— refusing to return a partial manifest listing")
          (page.truncated, page.next)
        case (404, _) => (false, None) // bucket/namespace not there yet
      }
      more = done._1
      token = done._2
    }
    acc.result()
  }

  override def delete(name: String): Unit =
    http(s"delete($name)")(() =>
        open(objUrl(name), "DELETE", Nil, Array.emptyByteArray)) {
      case (204, _) | (200, _) | (404, _) => ()
    }

  override def touch(name: String): Unit =
    http(s"touch($name)")(() =>
        open(objUrl(name), "PUT", Seq(
          "x-amz-copy-source" -> s"/$bucket/${encKey(keyPrefix + name)}",
          "x-amz-metadata-directive" -> "REPLACE"),
          Array.emptyByteArray)) {
      // the 200-with-error-body CopyObject quirk: a TRANSIENT error body
      // (InternalError/SlowDown in a 200) is left UNhandled here so
      // http()'s backoff retries it like a real 500/503 (ADVICE r20);
      // other embedded error codes still throw immediately below
      case (200, b) if !isTransient200Body(200, b) =>
        val s = new String(b, StandardCharsets.UTF_8)
        if (s.contains("<Error>"))
          throw new IOException(s"touch($name): 200 with ${snippet(b)}")
      case (404, _) => () // touch of a vanished claim is a benign race
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
