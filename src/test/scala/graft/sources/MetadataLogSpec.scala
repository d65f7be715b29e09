package graft.sources

import graft.SparkSpec

class MetadataLogSpec extends SparkSpec {
  import spark.implicits._

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
