package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan (and timing)
  * for named SparkEntry queries. Usage:
  *   runMain graft.Explain <sfDir> <query> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq
    // fail fast on a typo'd LAST name instead of after earlier queries ran
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n========== $name ==========")
      df.explain("formatted")
      // noop-sink like Bench: count() would let Catalyst prune the very
      // expressions/Windows the printed plan shows, so the time would
      // not correspond to the plan above it
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      // release operator-persisted intermediates between queries (the
      // full default run would otherwise accumulate ~99 queries' caches)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
