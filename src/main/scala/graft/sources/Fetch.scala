package graft.sources

import java.io.IOException
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.zip.ZipInputStream

/** HTTP/file fetch + archive staging — the reference's ingestion front door
  * re-expressed. Every reference pipeline starts by streaming a URL to local
  * bytes (reference: src/data_processors/nhs_english_prescriptions.py:99
  * `stream_csv_from_url`; src/data_sources/street_manager.py download +
  * unzip; src/data_sources/bods_timetables.py GTFS zip-of-CSVs), then parses.
  *
  * Split of labor at scale: the FETCH is single-stream IO into a staging
  * directory (on a cluster: shared storage — HDFS/object store — so every
  * executor can read the staged files); the PARSE is distributed
  * (spark.read / CsvBundle / XmlSource over the staged members). Fetching
  * N sources concurrently is driver-thread parallelism over `fetchToStaging`
  * calls — the bytes of one URL arrive on one socket either way.
  *
  * Both streaming paths are bounded-memory: the download streams chunks to
  * disk (never buffers the body), and the unzip streams each entry out
  * (never loads a member byte[] — the reference's stream-unzip mechanic).
  */
object Fetch {

  case class Fetched(url: String, path: String, nBytes: Long, attempts: Int)

  private def retrying[T](maxRetries: Int, baseDelayMs: Long)(f: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return (f, attempt)
      catch {
        // cancellation and malformed input are not transient: retrying a
        // thread interrupt (fetchMany's cancel) or a bad URL just burns
        // backoff re-reporting the same condition
        case e: InterruptedException => throw e
        case e: IllegalArgumentException => throw e
        case e: Exception =>
          if (attempt >= maxRetries) throw new IOException(
            s"fetch failed after $attempt attempts", e)
          Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
      }
    }
    sys.error("unreachable")
  }

  private def fileNameOf(url: String): String = {
    val base = url.split('/').lastOption.filter(_.nonEmpty).getOrElse("download")
    base.replaceAll("[^A-Za-z0-9._-]", "_")
  }

  /** Resolve a redirect hub to its final URL BEFORE downloading — the
    * reference resolves ArcGIS-hub style indirection the same way
    * (national_stat_postcode_lookup.py:46 fetch_redirect_url). The JDK
    * never crosses protocols on its own (an http→https 301 surfaces as
    * the 301 itself), so hops are followed here, bounded and
    * policy-checked per hop:
    *
    *  - same host: followed, INCLUDING the http→https upgrade the JDK
    *    refuses (https→http downgrades are refused — a hijacked hop
    *    must not silently strip transport security);
    *  - a host in `allowHosts`: followed (the explicit CDN allow-list —
    *    the downgrade refusal applies to these hops too: an allow-listed
    *    host never opts out of transport security);
    *  - anything else, a hop past `maxHops`, or a 3xx without
    *    Location: refused with a clear error, never silently fetched.
    *
    * Relative `Location` headers resolve against the current URL
    * (RFC 9110 §10.2.2). Non-HTTP URLs pass through untouched. */
  def resolveRedirects(url: String, maxHops: Int = 3,
                       allowHosts: Set[String] = Set.empty): String = {
    val (conn, resolved) = openResolved(url, maxHops, allowHosts)
    conn match { case h: java.net.HttpURLConnection => h.disconnect(); case _ => () }
    resolved
  }

  /** Open `url`, following redirects per the [[resolveRedirects]] policy
    * ON the request itself (no pre-flight probe — a probe would double
    * every fetch and skew retry semantics). Returns the LIVE connection
    * positioned at the first non-3xx response plus the resolved URL.
    * `prepare` runs on every hop's request before it is sent (Range /
    * If-Range headers must reach the final artifact, and are harmless
    * on intermediate redirect responses). */
  private def openResolved(url: String, maxHops: Int,
                           allowHosts: Set[String],
                           prepare: java.net.HttpURLConnection => Unit = _ => ())
      : (java.net.URLConnection, String) = {
    var cur = url
    for (_ <- 0 to maxHops) {
      val conn = new java.net.URI(cur).toURL.openConnection()
      conn match {
        case h: java.net.HttpURLConnection =>
          h.setInstanceFollowRedirects(false)
          prepare(h)
          val code = h.getResponseCode
          if (code < 300 || code >= 400 || code == 304) return (h, cur)
          val locOpt = Option(h.getHeaderField("Location"))
          h.disconnect()
          val loc = locOpt.getOrElse(
            throw new IOException(s"HTTP $code without Location from $cur"))
          val next = new java.net.URI(cur).resolve(loc)
          val curU = new java.net.URI(cur)
          val sameHost = Option(next.getHost) == Option(curU.getHost)
          // only http(s) targets are followable (an ftp:// or file://
          // hop would leave HTTP semantics entirely — and silently strip
          // transport security just like the http downgrade this guard
          // exists for); an https source never steps down to ANY
          // non-https scheme
          val nextScheme = Option(next.getScheme).getOrElse("")
          val schemeOk = nextScheme == "https" ||
            (nextScheme == "http" && curU.getScheme != "https")
          val allowed = schemeOk &&
            (sameHost || Option(next.getHost).exists(allowHosts.contains))
          if (!allowed) throw new IOException(
            s"refusing redirect off-policy: $cur -> $next " +
              "(follow requires an http(s) target, no https downgrade, " +
              "and same host or an allowHosts entry)")
          cur = next.toString
        case c => return (c, cur)
      }
    }
    throw new IOException(s"redirect chain exceeded $maxHops hops from $url")
  }

  /** Stream a `http(s)://` or `file://` URL into `stagingDir` with
    * retry/backoff (the reference's requests retry loop,
    * data_processor_utils.py:22). Writes via a temp file + atomic move so a
    * failed attempt never leaves a truncated file for the readers — and
    * VERIFIES the received byte count against the declared Content-Length:
    * a fixed-length HTTP body cut short arrives as a silent EOF (the JDK
    * stream does not throw), which would otherwise promote a truncated
    * download to the destination. */
  def fetchToStaging(url: String, stagingDir: String,
                     maxRetries: Int = 3, baseDelayMs: Long = 100,
                     destName: Option[String] = None,
                     redirectHops: Int = 3,
                     allowRedirectHosts: Set[String] = Set.empty): Fetched = {
    val dir = Files.createDirectories(Paths.get(stagingDir))
    // destination name stays keyed to the REQUESTED url (stable across a
    // hub whose resolved target rotates), unless destName overrides
    val dest = dir.resolve(destName.getOrElse(fileNameOf(url)))
    val (_, attempts) = retrying(maxRetries, baseDelayMs) {
      val tmp = Files.createTempFile(dir, ".part-", ".tmp")
      try {
        // redirects resolve on the download request itself (no probe)
        val (conn, target) =
          openResolved(url, redirectHops, allowRedirectHosts)
        conn match {
          // an unresolved error page has its own consistent
          // Content-Length: without a status check its body would be
          // silently promoted as the dataset
          case h: java.net.HttpURLConnection =>
            val code = h.getResponseCode
            if (code < 200 || code >= 300) {
              h.disconnect() // release the socket before the retry loop
              throw new IOException(s"HTTP $code from $target")
            }
          case _ => ()
        }
        val declared = conn.getContentLengthLong // -1 when unknown/chunked
        val in = conn.getInputStream
        val copied =
          try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        if (declared >= 0 && copied != declared)
          throw new IOException(
            s"truncated download: got $copied of $declared bytes from $url")
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      } finally Files.deleteIfExists(tmp)
    }
    Fetched(url, dest.toString, Files.size(dest), attempts)
  }

  /** Resumable variant of [[fetchToStaging]] for large artifacts: an
    * interrupted attempt leaves its bytes in a persistent `<name>.part`,
    * and the next attempt CONTINUES it with an HTTP Range request
    * (`Range: bytes=<have>-`, RFC 9110) instead of starting over — at
    * multi-GB reference drops (the BODS timetable archives), re-paying
    * the first 95% on every flake is the difference between a retry
    * loop that converges and one that never does.
    *
    * Servers that answer 206 Partial Content append; anything else
    * (Range unsupported/ignored, or a changed resource) restarts the
    * part from zero. Completion is verified against the total length
    * (Content-Range total on 206, Content-Length otherwise) before the
    * atomic move — the same no-partial-file-ever-visible contract as
    * [[fetchToStaging]]. */
  def fetchResumable(url: String, stagingDir: String,
                     maxRetries: Int = 3, baseDelayMs: Long = 100,
                     redirectHops: Int = 3,
                     allowRedirectHosts: Set[String] = Set.empty): Fetched = {
    val dir = Files.createDirectories(Paths.get(stagingDir))
    val dest = dir.resolve(fileNameOf(url))
    val part = dir.resolve(fileNameOf(url) + ".part")
    // sidecar: line 1 = validator (ETag else Last-Modified, may be
    // empty), line 2 = declared total. The validator rides an If-Range
    // header (RFC 9110 §13.1.5) on every resume, so a resource that
    // changed between attempts answers 200-full (restart) instead of
    // 206-appending mismatched bytes. Servers that publish no validator
    // still get the plain Range resume (their 200-vs-206 choice is the
    // only signal available).
    val metaF = dir.resolve(fileNameOf(url) + ".part.meta")
    def readMeta(): (String, Long) =
      if (!Files.exists(metaF)) ("", -1L)
      else Files.readString(metaF).split("\n", -1) match {
        case Array(v, t, _*) => (v, t.toLongOption.getOrElse(-1L))
        case _ => ("", -1L)
      }
    val (_, attempts) = retrying(maxRetries, baseDelayMs) {
      val (validator, knownTotal) = readMeta()
      val have = if (Files.exists(part)) Files.size(part) else 0L
      // redirects resolve on the request itself; the Range/If-Range
      // headers ride EVERY hop so they reach the resolved artifact
      // (harmless on the intermediate 3xx responses)
      val (conn, target) = openResolved(url, redirectHops,
        allowRedirectHosts, h => if (have > 0) {
          h.setRequestProperty("Range", s"bytes=$have-")
          if (validator.nonEmpty) h.setRequestProperty("If-Range", validator)
        })
      var total = -1L
      var resumed = false
      var alreadyComplete = false
      conn match {
        case h: java.net.HttpURLConnection =>
          h.getResponseCode match {
            case 206 =>
              resumed = true
              // Content-Range: bytes <from>-<to>/<total>
              val cr = Option(h.getHeaderField("Content-Range"))
              val crTotal = cr.flatMap(_.split('/').lastOption)
                .flatMap(t => t.toLongOption).getOrElse(-1L)
              // an unknown total ("bytes x-y/*", RFC-valid) falls back to
              // the sidecar's declared total — without it a connection
              // dropped mid-resume would promote a TRUNCATED file (the
              // completion check below never fires on total = -1)
              total = if (crTotal >= 0) crTotal else knownTotal
              // the response must start exactly where the .part ends: a
              // misaligned 206 (broken proxy) would append shuffled bytes
              val start = cr.map(_.trim.stripPrefix("bytes").trim)
                .flatMap(_.split('-').headOption).flatMap(_.toLongOption)
                .getOrElse(-1L)
              if (start != have) {
                h.disconnect()
                Files.deleteIfExists(part)
                Files.deleteIfExists(metaF)
                throw new IOException(
                  s"misaligned 206 (stale .part discarded): asked " +
                    s"bytes=$have-, response starts at $start from $url")
              }
            case 416 =>
              // Range Not Satisfiable: when the .part already holds the
              // whole resource (bytes=<size>- is past the end), that IS
              // completion — finish the move instead of erroring.
              val t416 = Option(h.getHeaderField("Content-Range")) // bytes */<total>
                .flatMap(_.split('/').lastOption)
                .flatMap(t => t.toLongOption).getOrElse(knownTotal)
              if (t416 >= 0 && have == t416) { alreadyComplete = true; h.disconnect() }
              else {
                // the resource shrank/changed: the stale .part can never
                // complete — discard it so the RETRY restarts from zero
                // instead of wedging on the identical 416 forever
                h.disconnect()
                Files.deleteIfExists(part)
                Files.deleteIfExists(metaF)
                throw new IOException(
                  s"range not satisfiable (stale .part discarded): " +
                    s"have $have of $t416 bytes from $url")
              }
            case code if code >= 200 && code < 300 =>
              total = h.getContentLengthLong
              // fresh (or restarted) body: record this response's
              // validator for the next attempt's If-Range
              val v = Option(h.getHeaderField("ETag"))
                .orElse(Option(h.getHeaderField("Last-Modified"))).getOrElse("")
              Files.writeString(metaF, s"$v\n$total")
            case code =>
              h.disconnect()
              throw new IOException(s"HTTP $code from $target")
          }
        case c => total = c.getContentLengthLong
      }
      if (!alreadyComplete) {
        val in = conn.getInputStream
        try {
          val out = Files.newOutputStream(part,
            (if (resumed)
              Seq(StandardOpenOption.CREATE, StandardOpenOption.APPEND)
            else
              Seq(StandardOpenOption.CREATE, StandardOpenOption.WRITE,
                StandardOpenOption.TRUNCATE_EXISTING)): _*)
          try { in.transferTo(out); () } finally out.close()
        } finally in.close()
        val got = Files.size(part)
        if (total >= 0 && got != total)
          throw new IOException(
            s"incomplete download: have $got of $total bytes from $url")
      }
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      Files.deleteIfExists(metaF)
    }
    Fetched(url, dest.toString, Files.size(dest), attempts)
  }

  /** Run `f` with a fresh scratch directory, deleting it (recursively)
    * afterwards — staged payloads are multi-GB for real archives and must
    * not outlive the run, or scheduled loads accrete /tmp forever. Shared
    * by every pipeline runner (Catalog.run, Section58.run). */
  def withScratchDir[A](prefix: String)(f: String => A): A = {
    val scratch = java.nio.file.Files.createTempDirectory(prefix)
    try f(scratch.toString)
    finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(scratch)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Stream-unzip an archive into `destDir`; returns the extracted member
    * paths (files only, in archive order). Entries stream straight to disk
    * — memory is one copy buffer regardless of member size. Entry names are
    * resolved inside `destDir` (zip-slip guarded). */
  def unzip(zipPath: String, destDir: String): Seq[String] = {
    val dest = Files.createDirectories(Paths.get(destDir)).toAbsolutePath.normalize
    val out = Seq.newBuilder[String]
    val zin = new ZipInputStream(Files.newInputStream(Paths.get(zipPath)))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val target: Path = dest.resolve(e.getName).normalize
        if (!target.startsWith(dest))
          throw new IOException(s"zip entry escapes staging dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(zin, target, StandardCopyOption.REPLACE_EXISTING)
          out += target.toString
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** Fetch several URLs concurrently (a fixed driver-side thread pool —
    * each URL is one socket stream regardless, so threads are the right
    * parallelism unit; the reference walks its 17 sources serially).
    * Results return in input order; the first failure propagates after
    * its own retries are exhausted. */
  def fetchMany(urls: Seq[String], stagingDir: String, parallelism: Int = 4,
                maxRetries: Int = 3, baseDelayMs: Long = 100,
                redirectHops: Int = 3,
                allowRedirectHosts: Set[String] = Set.empty): Seq[Fetched] = {
    // distinct URLs sharing a basename (hostA/data.zip vs hostB/data.zip,
    // or ?page=1 vs ?page=2) would clobber each other in the staging dir:
    // collisions get a short URL-hash suffix, unique names stay pretty
    val names = urls.map(fileNameOf)
    val dup = names.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }.toSet
    val dests = urls.zip(names).map { case (u, n) =>
      if (!dup(n)) n
      else {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(u.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val dot = n.lastIndexOf('.')
        if (dot > 0) s"${n.substring(0, dot)}-$h${n.substring(dot)}" else s"$n-$h"
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      val futures = urls.zip(dests).map { case (u, d) =>
        pool.submit(new java.util.concurrent.Callable[Fetched] {
          def call(): Fetched =
            fetchToStaging(u, stagingDir, maxRetries, baseDelayMs, Some(d),
              redirectHops, allowRedirectHosts)
        })
      }
      try futures.map(f =>
        try f.get()
        catch {
          // surface the documented IOException, not the executor wrapper
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        })
      catch {
        case e: Throwable =>
          // a failed download must not leave the rest of the pool
          // consuming bandwidth in the background — and the caller may
          // delete stagingDir the moment this throws (withScratchDir),
          // so WAIT for the workers to actually stop writing. Socket IO
          // ignores the interrupt flag, so the bound is the in-flight
          // chunk + retrying's refusal to retry interrupts.
          futures.foreach(_.cancel(true))
          pool.shutdownNow()
          pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
          throw e
      }
    } finally pool.shutdown()
  }

  /** fetch → unzip in one call: the street_manager / bods_timetables shape.
    * Members land in `<stagingDir>/<archive-name>.d/`, ready for
    * CsvBundle.read / spark.read over the directory. */
  def fetchZip(url: String, stagingDir: String,
               maxRetries: Int = 3, baseDelayMs: Long = 100): Seq[String] = {
    val fetched = fetchToStaging(url, stagingDir, maxRetries, baseDelayMs)
    unzip(fetched.path, fetched.path + ".d")
  }

  private val hrefRe = """(?is)href\s*=\s*["']([^"'<>]+)["']""".r

  /** Discover attachment links on a publication hub page (reference:
    * src/data_sources/bduk_premises_sept_2025.py:58-99 scans the gov.uk
    * page's attachment sections for `.zip` hrefs and resolves them to
    * absolute asset URLs). Bounded and allow-listed by construction:
    *
    *  - the page body is read through a HARD `maxBytes` cap — a hub page
    *    is tens of KB, and a link that turns out to be a multi-GB
    *    artifact must fail loudly instead of buffering into the driver;
    *  - `href` attributes are extracted with a streaming regex (no HTML
    *    parser dependency), HTML-entity-unescaped (&amp;), resolved
    *    against the page URL per RFC 3986, then filtered to those whose
    *    RESOLVED form matches `pattern`;
    *  - only links on the page's own host or a host in `allowHosts` are
    *    returned (the reference's assets.publishing.service.gov.uk
    *    special case, generalized to an explicit allow-list) — a
    *    compromised page cannot point the fetcher off-policy.
    *
    * Returns resolved URLs in page order, deduped. Feed the result into
    * [[fetchResumable]] / [[fetchMany]]. */
  def discoverLinks(pageUrl: String, pattern: scala.util.matching.Regex,
                    allowHosts: Set[String] = Set.empty,
                    maxBytes: Int = 4 << 20,
                    redirectHops: Int = 3): Seq[String] = {
    val (html, resolved) = fetchBounded(pageUrl, redirectHops, allowHosts, maxBytes)
    val base = new java.net.URI(resolved)
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    hrefRe.findAllMatchIn(html).foreach { m =>
      // ampersand entities decode LAST: decoding them first would
      // double-decode sequences like "&amp;lt;" (the escaped literal
      // text "&lt;") into "<" instead of "&lt;". Within the pair,
      // "&#38;" goes BEFORE "&amp;" — the other order turns the escaped
      // literal "&amp;#38;" (one level: "&#38;") all the way into "&"
      val raw = m.group(1).trim
        .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#38;", "&").replace("&amp;", "&")
      try {
        val abs = base.resolve(raw)
        val sameHost = Option(abs.getHost) == Option(base.getHost)
        val hostOk = sameHost || Option(abs.getHost).exists(allowHosts.contains)
        // same scheme policy as the redirect follower, plus same-scheme
        // (a file:// fixture hub links file:// members)
        val absScheme = Option(abs.getScheme).getOrElse("")
        val schemeOk = absScheme == base.getScheme || absScheme == "https" ||
          (absScheme == "http" && base.getScheme != "https")
        if (hostOk && schemeOk && pattern.findFirstIn(abs.toString).isDefined)
          seen += abs.toString
      } catch { case _: IllegalArgumentException => () /* malformed href */ }
    }
    seen.toSeq
  }

  /** Read a SMALL control-plane document (hub page, API listing) fully
    * into memory through the redirect policy, with a hard byte cap —
    * these documents are tens of KB; a URL that turns out to be a
    * multi-GB artifact must fail loudly instead of buffering into the
    * driver. Returns (utf8 body, resolved URL). */
  private def fetchBounded(url: String, redirectHops: Int,
                           allowHosts: Set[String],
                           maxBytes: Int): (String, String) = {
    val (conn, resolved) = openResolved(url, redirectHops, allowHosts)
    val body =
      try {
        conn match {
          // explicit status check like the sibling fetchers: a terminal
          // 304 would otherwise read as an EMPTY body and surface as a
          // misleading "no links" / "not JSON" downstream
          case h: java.net.HttpURLConnection =>
            val code = h.getResponseCode
            if (code < 200 || code >= 300) throw new IOException(
              s"HTTP $code from $resolved")
          case _ => ()
        }
        val in = conn.getInputStream
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var n = in.read(chunk)
          while (n >= 0) {
            if (buf.size() + n > maxBytes) throw new IOException(
              s"document exceeds $maxBytes bytes: $url — not a listing?")
            buf.write(chunk, 0, n)
            n = in.read(chunk)
          }
          new String(buf.toByteArray, "UTF-8")
        } finally in.close()
      } finally conn match {
        case h: java.net.HttpURLConnection => h.disconnect(); case _ => ()
      }
    (body, resolved)
  }

  /** One dataset file advertised by a CKAN-style JSON listing API. `url`
    * is optional because the API may list a resource whose download link
    * is not yet published — callers that fetch must require it. */
  case class JsonResource(name: String, format: String, url: Option[String])

  /** Discover dataset resources from a CKAN `package_show`-style JSON
    * API (reference: src/data_sources/nhs_english_prescriptions.py:67-105
    * `_fetch_api_resources` — GET the API URL, require `success: true`,
    * walk `result.resources[]`). Returns resources in listing order with
    * name/format defaulted to "" when absent, exactly the shape the
    * reference's filter then consumes; selection policy (format/name
    * filters, sort, month windows) belongs to the caller so this front
    * door stays source-agnostic.
    *
    * Same bounded-read + redirect policy as [[discoverLinks]]: the
    * listing is a control-plane document read on the driver; the DATA
    * fetch that follows streams to staging per resource. */
  def discoverJsonResources(apiUrl: String,
                            allowHosts: Set[String] = Set.empty,
                            maxBytes: Int = 16 << 20,
                            redirectHops: Int = 3): Seq[JsonResource] = {
    val (body, _) = fetchBounded(apiUrl, redirectHops, allowHosts, maxBytes)
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JsonProcessingException =>
          throw new IOException(s"API response is not JSON: $apiUrl", e)
      }
    if (!root.path("success").asBoolean(false)) throw new IOException(
      s"API returned success=false (or no success field): $apiUrl")
    val resources = root.path("result").path("resources")
    if (!resources.isArray) throw new IOException(
      s"API response has no result.resources array: $apiUrl")
    val out = Seq.newBuilder[JsonResource]
    resources.forEach { r =>
      val url = Option(r.get("url")).filter(_.isTextual).map(_.asText)
      out += JsonResource(r.path("name").asText(""),
        r.path("format").asText(""), url)
    }
    out.result()
  }
}
