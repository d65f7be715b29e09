package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Monthly-vintage table handling — the reference materializes one raw
  * table PER MONTH and unions them through generated dbt macros
  * (reference: dbt macros get_tables_24.sql: `SELECT *, '01_2024' AS
  * source_table FROM raw_data_2024."01_2024" UNION ALL ...` for 20+
  * months).
  *
  * Spark-first re-expression: months are HIVE PARTITIONS of ONE dataset
  * (`.../month=2024-01/...`, written by ParquetSink.writePartitioned), so
  * "union the months" is a single scan whose partition filter prunes
  * unrequested months at planning time — no N-way union operator, no
  * per-month table registry, and adding a month is a directory append.
  * [[unionTagged]] remains for the genuinely heterogeneous case (schema
  * drift between vintages), mirroring the macro's source-table tag.
  */
object MonthlyTables {

  /** Read a month range from a `month=`-partitioned layout. The BETWEEN on
    * the partition column becomes a PartitionFilters entry — unrequested
    * months are never listed or read (this is what replaces the macro's
    * generated UNION ALL at 100 TB). */
  def readMonths(spark: SparkSession, root: String,
                 fromMonth: String, toMonth: String): DataFrame =
    spark.read.parquet(root)
      .where(col("month").between(fromMonth, toMonth))

  /** dbt-macro analogue for separate per-vintage frames: harmonized
    * unionByName (missing columns null-padded, like the reference's padded
    * CSV vintages) with the macro's `source_table` tag. */
  def unionTagged(frames: Seq[(String, DataFrame)]): DataFrame = {
    require(frames.nonEmpty, "unionTagged needs at least one frame")
    frames.map { case (tag, df) => df.withColumn("source_table", lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
