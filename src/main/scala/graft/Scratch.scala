package graft

// Temporary profiling scratchpad for r21 — NOT part of the library;
// deleted before the round ends.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = emb0.repartition(32).persist()
    emb.count()
    val vd = transform(col("embedding"), x => x.cast("double"))
    val base = emb.select(col("vec_id"), vd.as("v"))
    val f = base.select((col("vec_id") % 8).as("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cid", "dim").agg(sum(col("x")).as("m"))
    f.write.format("noop").mode("overwrite").save() // warm codegen
    println("LOOP_START pid=" + ProcessHandle.current().pid())
    val t0 = System.nanoTime
    var n = 0
    while ((System.nanoTime - t0) < 30e9) { // ~30s of warm repeats
      f.write.format("noop").mode("overwrite").save()
      n += 1
    }
    println(s"WARM_RUNS_IN_30S=$n avg=${30.0 / n}")
    spark.stop()
  }
}
