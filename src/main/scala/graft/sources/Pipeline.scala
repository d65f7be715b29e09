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

  /** Single-action pipeline: every stage's plan is built lazily with an
    * `observe()` row counter, then ONE terminal `action` executes the whole
    * chain — each stage runs exactly once (O(N) total work vs the O(N^2) of
    * per-stage counting). Retry wraps the terminal action: Spark already
    * retries lost tasks internally, so this catches whole-job transients —
    * the level the reference's insert retry operates at. Observations are
    * rebuilt per attempt (an Observation binds to one action). */
  def runObserved(pipeline: String, input: DataFrame, stages: Seq[Stage],
                  action: DataFrame => Unit,
                  maxRetries: Int = 3, baseDelayMs: Long = 100)
      : Seq[RunRecord] = {
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        val t0 = System.currentTimeMillis()
        val (out, observations) =
          stages.foldLeft((input, Seq.empty[(String, org.apache.spark.sql.Observation)])) {
            case ((df, acc), stage) =>
              val (observedDf, obs) = MetadataLog.observed(pipeline, stage.name)(stage.run(df))
              (observedDf, acc :+ (stage.name -> obs))
          }
        action(out)
        val elapsed = System.currentTimeMillis() - t0
        return observations.map { case (name, obs) =>
          MetadataLog.resolve(pipeline, name, obs, elapsed)
        }
      } catch {
        case e: Throwable =>
          if (attempt >= maxRetries)
            throw new RuntimeException(
              s"[$pipeline] failed after $attempt attempts", e)
          Thread.sleep(baseDelayMs * (1L << (attempt - 1)))
      }
    }
    sys.error("unreachable")
  }

  /** Eager per-stage variant (extra count job per stage — debugging only;
    * see MetadataLog.tracked). */
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
