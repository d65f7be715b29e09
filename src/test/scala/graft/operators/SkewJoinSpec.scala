package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for SURVEY §4: AQE splits skewed join partitions at runtime,
  * so the grid/band/key joins here survive hot keys without manual
  * salting (salting remains available via Stats.saltedAgg for
  * aggregations, where AQE does not help). */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE skew-join splits a pathologically hot key") {
    // 200k rows on ONE key joined against a small per-key table, with
    // thresholds forced low enough that the optimization must trigger
    // payload is incompressible (sha2 of the row id) so the hot key's
    // shuffle partition stays big after compression
    val left = spark.range(200000)
      .select(when(col("id") < 190000, 0L).otherwise(col("id")).as("k"),
        sha2(col("id").cast("string"), 256).as("payload"))
    val right = spark.range(10000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val conf = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = left.join(right, "k")
        .select(count(col("payload")).as("n"))
      // 190k rows hit the hot key 0; ids >= 190000 have no right match.
      // collect() executes THIS QueryExecution, so the AQE final plan
      // (isFinalPlan=true) is inspectable afterwards.
      assert(joined.collect().head.getLong(0) === 190000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
