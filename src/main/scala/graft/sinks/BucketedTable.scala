package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffled storage so repeated joins/aggregations on
  * the bucket key run WITHOUT an exchange.
  *
  * The reference re-joins permits to USRN/UPRN lookup tables in every dbt
  * model run (uprn_usrn_count join in in_progress_list_london.sql:39 and
  * friends); at 100 TB those repeated shuffles dominate. Bucketing both
  * sides by the join key at write time makes every subsequent join
  * shuffle-free (SortMergeJoin over co-located buckets).
  */
object BucketedTable {

  def write(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    // pre-shuffle on the bucket column so each bucket is written by
    // exactly ONE task: bucketBy alone writes one file per (task,
    // bucket) pair — thousands of upstream tasks x hundreds of buckets
    // recreates the small-files problem this sink exists to solve
    df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
