package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse-load layer re-expressed for Spark: the reference batch-inserts
  * into MotherDuck/Postgres with retries and a delete-then-insert refresh
  * (reference: src/data_processors/utils/data_processor_utils.py:9
  * insert_into_motherduck, :60 insert_table_to_postgresql which DELETEs the
  * table first).
  *
  * On a cluster the equivalent durable, idempotent primitive is a
  * partitioned parquet write with DYNAMIC partition overwrite: re-running a
  * pipeline for one month replaces exactly that month's partitions, never
  * the whole table — the "delete then insert" pattern without a global
  * delete, safe to retry.
  */
object ParquetSink {

  /** Full-refresh write (the reference's replace-table path). */
  def writeReplace(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Idempotent partition-scoped refresh: only partitions present in `df`
    * are replaced. Partition columns become directory keys, enabling
    * partition pruning for downstream readers. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Write with parquet BLOOM FILTERS on `bloomCols`: point-lookup
    * file/row-group skipping for high-cardinality keys, where min/max
    * statistics are useless (uniformly distributed ids span the whole
    * domain in every file, so no range ever prunes). The complement of
    * [[ZOrder]]: z-order serves range boxes, blooms serve `key = x` /
    * `key IN (...)` probes — at 100 TB a single-document lookup touches
    * one row group instead of the table. */
  def writeWithBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                     expectedDistinct: Long = 1000000L): Unit =
    bloomCols.foldLeft(df.write.mode(SaveMode.Overwrite)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedDistinct.toString)
    }.parquet(path)

  /** Compact a table's small files in place: incremental month-by-month
    * appends (the reference's scheduled loads) accumulate one-file-per-run
    * partitions whose open/seek overhead eventually dominates scans at
    * 100 TB. Rewrites each partition into ~`targetFileMB` files via
    * per-partition-dir dynamic overwrite — a metadata-safe, idempotent
    * maintenance pass (re-running compacts nothing further). */
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                         partitionCols: Seq[String],
                         targetFileMB: Int = 512,
                         scopePredicate: Option[String] = None): Unit = {
    // an unpartitioned table has no dynamic-overwrite scope: writing the
    // scoped subset would replace the WHOLE path with it (silent data loss)
    require(partitionCols.nonEmpty || scopePredicate.isEmpty,
      "scopePredicate requires partitionCols: compacting an unpartitioned " +
        "table is all-or-nothing (the write replaces the entire path)")
    val all = spark.read.parquet(path)
    // at 100 TB you compact one partition scope (a month) per pass — that
    // also bounds the materialization below
    val scoped = scopePredicate.fold(all)(all.where(_))
    val sizeBytes = scoped.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1, (sizeBytes / (targetFileMB.toLong << 20)).toInt)
    // materialize away from the source files: Spark refuses to overwrite a
    // path that is also being read, and a lazy read would race the delete
    val df = scoped.localCheckpoint()
    val compacted =
      if (partitionCols.nonEmpty)
        // cluster rows of the same partition into the same task so each
        // partition dir lands as few files as possible
        df.repartition(nFiles, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nFiles)
    if (partitionCols.nonEmpty) writePartitioned(compacted, path, partitionCols)
    else writeReplace(compacted, path)
  }
}
