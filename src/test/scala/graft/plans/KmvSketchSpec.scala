package graft.plans

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    (0 until 200).map(i => s"w$i") ++ (0 until 50).map(i => s"w$i") // repeats

  test("kmv returns exactly the k smallest distinct hashes, any partitioning") {
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "w")
      .select(col("id"), Text.md5Long(col("w")).as("hv"))
    val expected = df.select(col("hv")).distinct()
      .orderBy("hv").limit(16).as[Long].collect().toSeq

    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .agg(KmvSketch.kmv(col("hv"), 16).as("kmv"))
        .head().getSeq[Long](0)
      assert(got === expected, s"parts=$parts diverged") // merge-path exact
    }
  }

  test("fewer distinct values than k yields the exact sorted distinct set") {
    val df = Seq(5L, 3L, 5L, 9L, 3L).toDF("hv")
    val got = df.agg(KmvSketch.kmv(col("hv"), 16)).head().getSeq[Long](0)
    assert(got === Seq(3L, 5L, 9L))
  }

  test("nulls are skipped; empty input yields an empty sketch") {
    val df = Seq[Option[Long]](Some(4L), None, Some(2L)).toDF("hv")
    assert(df.agg(KmvSketch.kmv(col("hv"), 8)).head().getSeq[Long](0)
      === Seq(2L, 4L))
    val empty = df.where(col("hv").isNull)
      .agg(KmvSketch.kmv(col("hv"), 8)).head().getSeq[Long](0)
    assert(empty === Seq())
  }

  test("graft_kmv is callable from SQL via GraftExtensions") {
    Seq(10L, 30L, 20L, 10L).toDF("hv").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT graft_kmv(hv, 2) FROM kmv_in")
      .head().getSeq[Long](0)
    assert(got === Seq(10L, 20L))
  }

  test("KMV estimate lands near the true distinct count") {
    // 5000 distinct strings, k=64: KMV standard error ~ 1/sqrt(k-1) ~ 12.6%
    val df = (0 until 5000).map(i => s"tok$i").toDF("w")
      .select(shiftright(Text.md5Long(col("w")), 5).as("hv"))
    val kmv = df.agg(KmvSketch.kmv(col("hv"), 64)).head().getSeq[Long](0)
    val est = (63L * (1L << 55)) / kmv.last
    assert(est > 3500 && est < 6500, s"estimate $est too far from 5000")
  }
}
