package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The five primitives [[SnapshotTable]]'s commit protocol performs on
  * its `_manifests` namespace, abstracted so the protocol can run
  * against stores whose ATOMICITY comes from a conditional-put API
  * instead of filesystem semantics.
  *
  * The load-bearing operation is [[putIfAbsent]]: claims, manifests and
  * voids all reduce to "create this full object iff the name is free,
  * atomically, exactly one concurrent caller winning". On HDFS/posix
  * that is O_EXCL create (+ tmp-and-rename for bodies); on S3-class
  * stores it is `PutObject` with `If-None-Match: *` (a single full-body
  * PUT is already atomic there — no rename needed, which is exactly why
  * the Hadoop FS facade over S3 cannot host the protocol but the native
  * conditional-put API can). Implementations MUST guarantee:
  *
  *  - `putIfAbsent` is linearizable: of N concurrent callers for one
  *    name, exactly one returns true, and a reader never observes a
  *    partial body (full-object visibility);
  *  - `list` returns every live name with a store-side modification
  *    time (claim-grace reasoning compares those mtimes against the
  *    voider's local clock — same ±skew contract as the filesystem
  *    path, see SnapshotTable.claimGraceMs);
  *  - `touch` refreshes a name's modification time without a window in
  *    which the name is unlisted (S3: CopyObject onto itself with
  *    REPLACE metadata — atomic replace, never absent);
  *  - `delete` is idempotent (deleting a missing name is a no-op).
  *
  * Only the manifest namespace routes through this seam. Data files
  * keep their ordinary filesystem/connector path: the protocol never
  * relies on data-write atomicity (data dirs are UUID-unique and
  * invisible until a manifest references them).
  *
  * Names are flat, relative to the table's manifest namespace
  * (`claim-<N>`, `manifest-<N>`, `.tmp-*` litter on filesystem-backed
  * implementations). */
trait CommitStore {
  /** Atomically create `name` with exactly `body` iff absent; false
    * when the name already exists (never partial, never overwrite). */
  def putIfAbsent(name: String, body: Array[Byte]): Boolean

  /** Full body of an existing `name` (throws if absent — the protocol
    * only reads names it has listed or landed). */
  def read(name: String): Array[Byte]

  /** Every live name with its store-side modification time; empty when
    * the namespace does not exist yet. */
  def list(): Seq[CommitStore.Entry]

  /** Remove `name`; silently succeeds when already absent. */
  def delete(name: String): Unit

  /** Refresh `name`'s modification time (claim heartbeat) without the
    * name ever going unlisted. */
  def touch(name: String): Unit

  /** One-time namespace setup (mkdirs on filesystems; no-op on flat
    * stores). Called before the first commit touches the namespace. */
  def init(): Unit = ()
}

object CommitStore {
  /** A listed name and its store-side modification time (epoch ms). */
  final case class Entry(name: String, mtimeMs: Long)
}

/** [[CommitStore]] over a Hadoop FileSystem `_manifests` directory —
  * the default store behind [[SnapshotTable]]'s public API, preserving
  * the exact claim/land primitives the protocol shipped with: O_EXCL
  * exclusive create for empty claims (NIO CREATE_NEW on file://, where
  * Hadoop's LocalFileSystem create-no-overwrite is a TOCTOU), and
  * tmp-then-atomic-no-overwrite-publish for manifest bodies (hard link
  * on file://, namenode no-overwrite rename elsewhere), so a visible
  * manifest is always complete. Only valid on stores with atomic
  * exclusive create + rename (SnapshotTable's scheme guard enforces
  * that before constructing one). */
private[sinks] final class HadoopCommitStore(
    f: FileSystem, rootP: Path,
    fileContext: () => FileContext) extends CommitStore {

  private val dir = new Path(rootP, "_manifests")

  override def init(): Unit = { f.mkdirs(dir); () }

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
    val dest = new Path(dir, name)
    if (body.isEmpty) createExclusive(dest, body)
    else {
      // full-body atomic publish: tmp (uniquely named — racers must
      // never share one) then one atomic no-overwrite rename/link
      if (f.exists(dest)) return false
      val tmpM = new Path(dir, s".tmp-$name-${
        java.util.UUID.randomUUID().toString.take(8)}")
      val outM = f.create(tmpM, true)
      try outM.write(body) finally outM.close()
      try {
        if (f.getScheme == "file")
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmpM.toUri.getPath))
        else fileContext().rename(tmpM, dest, Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally {
        // all outcomes: drop the tmp (a successful rename already moved
        // it — delete no-ops; the link path and a lost race leave it)
        try { f.delete(tmpM, false); () }
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Atomic exclusive create. HDFS `create(overwrite=false)` is atomic
    * (namenode-side), but Hadoop's LocalFileSystem implements it as
    * exists() THEN create — a TOCTOU window two local writers can both
    * win. On file:// go through NIO CREATE_NEW (O_CREAT|O_EXCL,
    * kernel-atomic). False when the path exists; other IO failures
    * propagate. */
  private def createExclusive(p: Path, body: Array[Byte]): Boolean =
    try {
      if (f.getScheme == "file")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath), body,
          java.nio.file.StandardOpenOption.CREATE_NEW)
      else {
        val o = f.create(p, false)
        try { if (body.nonEmpty) o.write(body) } finally o.close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }

  override def read(name: String): Array[Byte] = {
    val in = f.open(new Path(dir, name))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  override def list(): Seq[CommitStore.Entry] =
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq.map(st =>
      CommitStore.Entry(st.getPath.getName, st.getModificationTime))

  override def delete(name: String): Unit = {
    f.delete(new Path(dir, name), false); ()
  }

  override def touch(name: String): Unit = {
    val p = new Path(dir, name)
    // mtime-only refresh: setTimes is one atomic metadata op on every
    // FileSystem. create(overwrite=true) is NOT — delete-then-create
    // implementations expose a window where a concurrent lister sees
    // neither claim nor manifest, stops waiting on a live writer, and
    // lands a higher manifest that excludes its files. Fall back to
    // create only where setTimes is unsupported.
    try f.setTimes(p, System.currentTimeMillis(), -1)
    catch { case _: UnsupportedOperationException =>
      val o = f.create(p, true); o.close()
    }
  }
}

private[sinks] object HadoopCommitStore {
  def apply(spark: org.apache.spark.sql.SparkSession,
            rootP: Path): HadoopCommitStore = {
    val conf = spark.sessionState.newHadoopConf()
    new HadoopCommitStore(rootP.getFileSystem(conf), rootP,
      () => FileContext.getFileContext(rootP.toUri, conf))
  }
}

private[sinks] object CommitStoreText {
  def utf8(body: Array[Byte]): String = new String(body, StandardCharsets.UTF_8)
  def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
