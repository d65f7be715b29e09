package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-file publish for parquet tables — the "readers never see
  * a partial write" guarantee the reference's pipelines get from their
  * warehouse transactions (reference: data_processor_utils.py:60 deletes
  * then inserts INSIDE Postgres; MotherDuck loads are single-statement
  * transactions). A bare parquet directory has no such boundary: a
  * failed or concurrent overwrite leaves readers a torn mix of old and
  * new files. This sink adds the minimal snapshot layer (the core idea
  * of Iceberg/Delta commit protocols, expressed with nothing but Hadoop
  * filesystem primitives):
  *
  * {{{
  *   <root>/data/v<N>/part-*.parquet     immutable per-commit file set
  *   <root>/_manifests/manifest-<N>      JSON: exact file list of commit N
  *   <root>/_current                     pointer to the live manifest
  * }}}
  *
  * Commit protocol: write the data directory, CLAIM the version by
  * creating `manifest-<N>` with overwrite=false (atomic create — a
  * concurrent writer loses and retries at N+1), then swap `_current`
  * via rename with OVERWRITE (atomic on HDFS and posix). Readers resolve
  * `_current` -> manifest -> exact file list, so they see the old table
  * or the new one, never a mix; a crashed writer leaves only an
  * unreferenced data directory that `vacuum` reclaims. Old manifests
  * stay until vacuumed -> free time travel by version. */
object SnapshotTable {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Publish `df` as the table's next version; returns the version id.
    * `append = true` makes the new snapshot the previous file list PLUS
    * this commit's files (incremental loads keep every older commit's
    * immutable files); `false` (default) replaces the table. Retries the
    * version claim on concurrent commits (each N is claimed exactly once
    * — `create(overwrite = false)` is atomic). */
  def write(df: DataFrame, root: String, append: Boolean = false,
            maxClaimRetries: Int = 20): Long = {
    val spark = df.sparkSession
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    f.mkdirs(new Path(rootP, "_manifests"))

    var version = latestVersion(spark, root).getOrElse(0L) + 1
    var claimed = false
    var tries = 0
    while (!claimed) {
      tries += 1
      require(tries <= maxClaimRetries,
        s"snapshot-table: lost the version claim $maxClaimRetries times at $root")
      // the dir is unique per ATTEMPT (not per version): two writers
      // racing for the same version number must never share a parquet
      // commit directory
      val dirName = s"v$version-${java.util.UUID.randomUUID().toString.take(8)}"
      val dataDir = new Path(rootP, s"data/$dirName")
      df.write.mode("overwrite").parquet(dataDir.toString)
      val fresh = f.listStatus(dataDir)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(s => s"data/$dirName/${s.getPath.getName}").sorted.toVector
      // append reads the PREVIOUS manifest inside the claim loop: losing
      // a race re-reads it, so the carried list is the winner's
      val carried =
        if (!append) Vector.empty
        else latestVersion(spark, root).map(manifestFiles(spark, root, _))
          .getOrElse(Vector.empty)
      val manifest = new Path(rootP, s"_manifests/manifest-$version")
      val body = s"""{"version": $version, "files": [${
        (carried ++ fresh).map(jsonStr).mkString(", ")}]}"""
      // claim = atomic no-overwrite RENAME of a fully-written temp file:
      // a manifest is never visible half-written, so a racing loser that
      // re-reads the winner's manifest always sees complete content
      val tmpM = new Path(rootP, s"_manifests/.tmp-$version-${java.util.UUID.randomUUID()}")
      val out = f.create(tmpM, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      try {
        FileContext.getFileContext(rootP.toUri, spark.sessionState.newHadoopConf())
          .rename(tmpM, manifest) // NO overwrite option: fails if claimed
        claimed = true
      } catch {
        case _: java.io.IOException => // lost the race: leave the orphan
          f.delete(tmpM, false)        // dir for vacuum, take the next slot
          version += 1
      }
    }
    // swap the pointer last: readers see old-or-new, never in-between
    val tmp = new Path(rootP, s"_current.tmp-$version")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(rootP.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, new Path(rootP, "_current"), Options.Rename.OVERWRITE)
    version
  }

  /** Versions with a manifest, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, "_manifests")
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-") =>
        n.stripPrefix("manifest-").toLong }
      .sorted.toSeq
  }

  private def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** Root-relative file paths of manifest `v` (no JSON lib dep: minimal
    * field pull from our own format). */
  private def manifestFiles(spark: SparkSession, root: String, v: Long): Vector[String] = {
    val rootP = new Path(root)
    val manifest = readSmall(fs(spark, rootP), new Path(rootP, s"_manifests/manifest-$v"))
    "\"files\": \\[([^\\]]*)\\]".r.findFirstMatchIn(manifest).get.group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toVector
  }

  private def liveVersion(spark: SparkSession, root: String): Long = {
    val cur = new Path(root, "_current")
    require(fs(spark, cur).exists(cur), s"snapshot-table: no published version at $root")
    readSmall(fs(spark, cur), cur).trim.toLong
  }

  /** Read the live snapshot (or a pinned `version` — time travel). Only
    * the manifest's exact file list is scanned: concurrent publishes and
    * crashed writers cannot tear the read. */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse(liveVersion(spark, root))
    val files = manifestFiles(spark, root, v)
    require(files.nonEmpty, s"snapshot-table: empty manifest $v at $root")
    spark.read.parquet(files.map(n => new Path(root, n).toString): _*)
  }

  /** Incremental consumption: only the files ADDED after `sinceVersion`
    * (up to `untilVersion`/live) — a downstream pipeline that processed
    * version N reads exactly the new data of N+1..M, never rescanning
    * the table. Files are immutable once published, so the manifest set
    * difference IS the change set (append-mode commits; a replace commit
    * shows up as its full file list, which is also correct). */
  def readChanges(spark: SparkSession, root: String, sinceVersion: Long,
                  untilVersion: Option[Long] = None): DataFrame = {
    val until = untilVersion.getOrElse(liveVersion(spark, root))
    val old = manifestFiles(spark, root, sinceVersion).toSet
    val added = manifestFiles(spark, root, until).filterNot(old)
    if (added.isEmpty) read(spark, root, Some(until)).limit(0)
    else spark.read.parquet(added.map(n => new Path(root, n).toString): _*)
  }

  /** Drop all but the newest `keep` manifests and every data directory no
    * kept manifest references (including crashed writers' orphans). The
    * live pointer is never touched; `keep >= 1`. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "snapshot-table: keep >= 1")
    val rootP = new Path(root)
    val f = fs(spark, rootP)
    val all = versions(spark, root)
    val kept = all.takeRight(keep)
    // append-mode manifests reference older versions' dirs: keep every
    // dir a KEPT manifest mentions, not just the kept version numbers
    val referenced = kept.flatMap(v => manifestFiles(spark, root, v))
      .map(p => new Path(p).getParent.getName).toSet
    all.dropRight(keep).foreach { v =>
      f.delete(new Path(rootP, s"_manifests/manifest-$v"), false)
    }
    val dataRoot = new Path(rootP, "data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { s =>
      if (!referenced.contains(s.getPath.getName)) f.delete(s.getPath, true)
    }
  }
}
