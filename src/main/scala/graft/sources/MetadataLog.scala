package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline run metadata — the reference tracks per-processor run metadata
  * (rows processed, timing, status) via a decorator
  * (reference: src/data_processors/utils/metadata_logger.py metadata_tracker)
  * into a warehouse table. Same contract here, as a Spark-native log with
  * an appendable parquet sink.
  */
object MetadataLog {

  case class RunRecord(pipeline: String, stage: String, status: String,
                       n_rows: Long, elapsed_ms: Long, logged_at_ms: Long)

  /** Run `f`, record outcome + row count of its result. */
  def tracked(pipeline: String, stage: String)(f: => DataFrame): (DataFrame, RunRecord) = {
    val t0 = System.currentTimeMillis()
    try {
      val df = f
      val n = df.count()
      (df, RunRecord(pipeline, stage, "success", n,
        System.currentTimeMillis() - t0, System.currentTimeMillis()))
    } catch {
      case e: Throwable =>
        throw new RuntimeException(
          s"[$pipeline/$stage] failed after ${System.currentTimeMillis() - t0} ms", e)
    }
  }

  def append(spark: SparkSession, records: Seq[RunRecord], path: String): Unit = {
    import spark.implicits._
    records.toDF().write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
