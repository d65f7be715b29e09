package graft.sources

import org.apache.spark.sql.DataFrame
import graft.sources.MetadataLog.RunRecord

/** Minimal pipeline orchestration mirroring the reference's per-source
  * pipeline scripts (reference: src/pipelines/street_manager.py and
  * siblings: fetch -> process -> load with retry + metadata logging).
  * A pipeline is a named sequence of DataFrame stages; each stage is
  * retried with backoff (the reference's insert_into_motherduck retry,
  * data_processor_utils.py:22) and its row count/timing recorded.
  */
object Pipeline {

  case class Stage(name: String, run: DataFrame => DataFrame,
                   maxRetries: Int = 3, baseDelayMs: Long = 100)

  def run(pipeline: String, input: DataFrame, stages: Seq[Stage])
      : (DataFrame, Seq[RunRecord]) = {
    val records = Seq.newBuilder[RunRecord]
    val out = stages.foldLeft(input) { (df, stage) =>
      var attempt = 0
      var result: Option[DataFrame] = None
      var lastErr: Throwable = null
      while (result.isEmpty && attempt < stage.maxRetries) {
        try {
          val (res, rec) = MetadataLog.tracked(pipeline, stage.name)(stage.run(df))
          records += rec
          result = Some(res)
        } catch {
          case e: Throwable =>
            lastErr = e
            attempt += 1
            if (attempt < stage.maxRetries)
              Thread.sleep(stage.baseDelayMs * (1L << (attempt - 1)))
        }
      }
      result.getOrElse(throw new RuntimeException(
        s"[$pipeline/${stage.name}] failed after ${stage.maxRetries} attempts", lastErr))
    }
    (out, records.result())
  }
}
