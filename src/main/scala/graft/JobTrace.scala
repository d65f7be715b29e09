package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: runs ONE SparkEntry query and prints the sequential
  * job timeline (job id, wall window, duration, description) plus the
  * total. Answers "where do the seconds go" for DAG-depth work — the
  * per-job scheduler/codegen constant only shows up here, not in
  * `.explain`. Not part of the driver contract; local tooling only.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.JobTrace q_name
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobTrace <query> [runs]")
    val q = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = j.stageInfos.map(s =>
          s"${s.stageId}:${s.name.takeWhile(_ != '\n').take(40)}(${s.numTasks})")
          .mkString(" | ")
        jobs.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, desc) =>
          done.add((j.jobId, t0, j.time, desc))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val m = si.taskMetrics
        def mb(b: Long) = f"${b / 1048576.0}%.1f"
        println(f"  stage=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"in=${mb(m.inputMetrics.bytesRead)}MB/${m.inputMetrics.recordsRead} " +
          f"sw=${mb(m.shuffleWriteMetrics.bytesWritten)}MB/${m.shuffleWriteMetrics.recordsWritten} " +
          f"sr=${mb(m.shuffleReadMetrics.totalBytesRead)}MB/${m.shuffleReadMetrics.recordsRead} " +
          f"cpu=${m.executorCpuTime / 1e9}%.1fs run=${m.executorRunTime / 1e3}%.1fs")
      }
    })

    (1 to runs).foreach { r =>
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._2)
      val base = rows.headOption.map(_._2).getOrElse(0L)
      println(f"== run $r: $q total=$total%.3f s, ${rows.size} jobs")
      var prevEnd = base // first row's gap prints 0, not start-since-epoch
      rows.foreach { case (id, s, e, desc) =>
        val gap = s - prevEnd; prevEnd = math.max(prevEnd, e)
        println(f"  job=$id%3d  t=${(s - base) / 1000.0}%7.2f→${(e - base) / 1000.0}%7.2f  dur=${(e - s) / 1000.0}%6.2f  gap=${gap / 1000.0}%5.2f  ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
