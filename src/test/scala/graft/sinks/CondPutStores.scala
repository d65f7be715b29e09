package graft.sinks

import java.nio.file.{Files, Path => JPath, StandardCopyOption}
import java.nio.file.attribute.FileTime

import scala.util.Random

/** Spec-level fake of an S3-class conditional-put store: a local
  * directory whose FIVE CommitStore operations provide EXACTLY the
  * guarantees the trait contracts — [[putIfAbsent]] is linearized by a
  * per-store lock (standing in for the server-side atomicity of
  * `PutObject If-None-Match: *`), and NOTHING ELSE is assumed: no
  * O_EXCL exposed, no rename, list/read/delete/touch are plain
  * operations like GET/LIST/DELETE/CopyObject. If the commit protocol
  * survives the multi-writer chaos suite against this store, the only
  * property a real S3 deployment still has to supply is the
  * conditional-put itself (which S3 provides natively).
  *
  * `latencyMs > 0` injects a uniform random sleep BEFORE each
  * operation's atomic section (network latency widens every protocol
  * race window without weakening the op's own atomicity — the honest
  * S3 simulation). */
final class LocalCondPutStore(dirPath: String, latencyMs: Int = 0)
    extends CommitStore {
  private val dir: JPath = java.nio.file.Paths.get(dirPath)
  private val lock = new Object
  private val rnd = new Random(42)

  private def lag(): Unit = if (latencyMs > 0) {
    val d = rnd.synchronized(rnd.nextInt(latencyMs))
    if (d > 0) Thread.sleep(d)
  }

  override def init(): Unit = { Files.createDirectories(dir); () }

  override def putIfAbsent(name: String, body: Array[Byte]): Boolean = {
    lag()
    lock.synchronized {
      val p = dir.resolve(name)
      if (Files.exists(p)) false
      else {
        Files.createDirectories(dir)
        // full-object visibility: write to a dot-tmp and MOVE inside the
        // lock, so even a non-locking reader (there are none — reads
        // also lock — but the fake shouldn't be weaker than S3) never
        // sees a partial body
        val tmp = dir.resolve(s".put-${java.util.UUID.randomUUID()}")
        Files.write(tmp, body)
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }
  }

  override def read(name: String): Array[Byte] = {
    lag()
    lock.synchronized(Files.readAllBytes(dir.resolve(name)))
  }

  override def list(): Seq[CommitStore.Entry] = {
    lag()
    lock.synchronized {
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filterNot(_.getFileName.toString.startsWith(".put-"))
            .map(p => CommitStore.Entry(p.getFileName.toString,
              Files.getLastModifiedTime(p).toMillis))
            .toVector
        } finally s.close()
      }
    }
  }

  override def delete(name: String): Unit = {
    lag()
    lock.synchronized { Files.deleteIfExists(dir.resolve(name)); () }
  }

  override def touch(name: String): Unit = {
    lag()
    lock.synchronized {
      val p = dir.resolve(name)
      // CopyObject-onto-itself semantics: refresh mtime in place, the
      // name never goes unlisted
      if (Files.exists(p))
        Files.setLastModifiedTime(p,
          FileTime.fromMillis(System.currentTimeMillis()))
      ()
    }
  }

  /** Test hook: backdate a name's mtime (simulates a claim whose writer
    * crashed `ageMs` ago). */
  def backdate(name: String, ageMs: Long): Unit = lock.synchronized {
    val p = dir.resolve(name)
    if (Files.exists(p))
      Files.setLastModifiedTime(p,
        FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    ()
  }
}
