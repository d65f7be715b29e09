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
}
