package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

class MetadataLogSpec extends SparkSpec {
  import spark.implicits._

  test("runObserved records per-stage counts while executing each stage once") {
    // row-counting side effect INSIDE the executed plan: if any stage's
    // plan ran more than once, the accumulator over-counts
    val acc: LongAccumulator = spark.sparkContext.longAccumulator("stage1_rows")
    val tick = udf((x: Int) => { acc.add(1L); x })
    val stages = Seq(
      Pipeline.Stage("widen", df => df.withColumn("x2", tick(col("x")) * 2)),
      Pipeline.Stage("filter", df => df.where(col("x2") >= 4)))
    val records = Pipeline.runObserved("obs_pipe", (1 to 5).toDF("x"), stages,
      action = _.write.format("noop").mode("overwrite").save())
    assert(records.map(r => r.stage -> r.n_rows) === Seq("widen" -> 5L, "filter" -> 4L))
    assert(records.forall(_.status === "success"))
    // 5 input rows seen exactly once each — the O(N^2) per-stage count()
    // pattern would have pushed this to 10+
    assert(acc.value === 5L)
  }

  test("tracked records row counts and status; append/read round-trips") {
    val (df, rec) = MetadataLog.tracked("test_pipe", "load") {
      Seq(1, 2, 3).toDF("x")
    }
    assert(df.count() === 3)
    assert(rec.n_rows === 3 && rec.status === "success")
    val dir = java.nio.file.Files.createTempDirectory("mlog").toString
    MetadataLog.append(spark, Seq(rec), dir)
    MetadataLog.append(spark, Seq(rec.copy(stage = "transform")), dir)
    val back = MetadataLog.read(spark, dir)
    assert(back.count() === 2)
    assert(back.select("pipeline").distinct().as[String].head() === "test_pipe")
  }
}
