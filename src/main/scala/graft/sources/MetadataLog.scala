package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Pipeline run metadata — the reference tracks per-processor run metadata
  * (rows processed, timing, status) via a decorator
  * (reference: src/data_processors/utils/metadata_logger.py metadata_tracker)
  * into a warehouse table. Same contract here, as a Spark-native log with
  * an appendable parquet sink.
  *
  * Two ways to get per-stage row counts:
  *  - [[observed]]: attaches an `observe()` metric to the stage's plan; the
  *    count is collected as a side effect of the pipeline's ONE terminal
  *    action. This is the scale path — an N-stage pipeline does O(N) total
  *    work. Use via [[Pipeline.runObserved]].
  *  - [[tracked]]: eager `count()` per stage. Each count executes the full
  *    upstream plan, so an N-stage chain does O(N^2) work — debugging only,
  *    never in a 100 TB pipeline.
  */
object MetadataLog {

  case class RunRecord(pipeline: String, stage: String, status: String,
                       n_rows: Long, elapsed_ms: Long, logged_at_ms: Long)

  /** Attach a row-count observation to a stage's output. Free at execution
    * time (a per-partition counter folded into the stage's own pass); the
    * returned Observation yields the count after the terminal action. */
  def observed(pipeline: String, stage: String)(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation(s"$pipeline/$stage/${System.nanoTime()}")
    (df.observe(obs, count(lit(1)).as("n_rows")), obs)
  }

  /** Resolve an observation into a RunRecord (call AFTER the action). */
  def resolve(pipeline: String, stage: String, obs: Observation,
              elapsedMs: Long): RunRecord =
    RunRecord(pipeline, stage, "success",
      obs.get("n_rows").asInstanceOf[Long], elapsedMs, System.currentTimeMillis())

  /** Run `f`, record outcome + row count of its result EAGERLY (extra job
    * per stage — see class doc; prefer observed/runObserved). */
  def tracked(pipeline: String, stage: String)(f: => DataFrame): (DataFrame, RunRecord) = {
    val t0 = System.currentTimeMillis()
    try {
      val df = f
      val n = df.count()
      (df, RunRecord(pipeline, stage, "success", n,
        System.currentTimeMillis() - t0, System.currentTimeMillis()))
    } catch {
      case scala.util.control.NonFatal(e) =>
        throw new StageFailure(pipeline, stage,
          RunRecord(pipeline, stage, "failure", -1L,
            System.currentTimeMillis() - t0, System.currentTimeMillis()), e)
    }
  }

  /** Stage failure carrying the status='failure' RunRecord, so callers
    * (Pipeline.run) can LOG the failure before rethrowing — without it
    * the metadata parquet could not distinguish 'failed' from 'never
    * ran', defeating the run log's monitoring purpose. */
  final class StageFailure(val pipeline: String, val stage: String,
                           val record: RunRecord, cause: Throwable)
      extends RuntimeException(
        s"[$pipeline/$stage] failed after ${record.elapsed_ms} ms", cause)

  def append(spark: SparkSession, records: Seq[RunRecord], path: String): Unit = {
    import spark.implicits._
    records.toDF().write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
