package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (0 until 500).map(i => s"k${(i * i) % 37}").toDF("k")

  test("cms: every row of the grid conserves the total count") {
    val grid = keys.agg(CmsSketch.cms($"k", 4, 64)).as[Seq[Long]].head()
    assert(grid.size == 4 * 64)
    grid.grouped(64).foreach(row => assert(row.sum == 500L))
  }

  test("cms: estimate >= exact for every present key (one-sided error)") {
    val sketch = keys.agg(CmsSketch.cms($"k", 4, 64).as("sk"))
    val got = keys.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sketch))
      .select($"k", CmsSketch.estimate($"sk", $"k", 4, 64).as("est"), $"exact")
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) >= r.getLong(2), r.toString))
    // with 37 keys in 4x64 buckets, most estimates should be exact
    assert(got.count(r => r.getLong(1) == r.getLong(2)) >= got.length / 2)
  }

  test("cms: deterministic under repartitioning (exercises serialize + merge)") {
    val a = keys.repartition(1).agg(CmsSketch.cms($"k", 4, 64)).as[Seq[Long]].head()
    val b = keys.repartition(13).agg(CmsSketch.cms($"k", 4, 64)).as[Seq[Long]].head()
    assert(a == b)
  }

  test("cms: grouped sketches stay per-group") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("g", "k")
    val grids = df.groupBy("g").agg(CmsSketch.cms($"k", 2, 16).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sum).toMap
    assert(grids == Map("a" -> 6L, "b" -> 2L)) // 3 rows x 2 grid rows, 1 x 2
  }

  test("cms: nulls are ignored") {
    val df = Seq(Some("x"), None, Some("x")).toDF("k")
    val grid = df.agg(CmsSketch.cms($"k", 2, 16)).as[Seq[Long]].head()
    assert(grid.sum == 4L) // 2 non-null rows x 2 grid rows
  }

  test("cms: SQL surface graft_cms(key, d, w)") {
    keys.createOrReplaceTempView("cms_in")
    val grid = spark.sql("SELECT graft_cms(k, 2, 32) FROM cms_in")
      .as[Seq[Long]].head()
    assert(grid.size == 64 && grid.grouped(32).forall(_.sum == 500L))
  }

  test("cms: bucket function matches the oracle's md5 arithmetic") {
    // ('0x' || substr(md5('1:k9'), 1, 15))::BIGINT % 64, computed by hand
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex("1:k9")
    val expect = (java.lang.Long.parseLong(hex.take(15), 16) % 64).toInt
    assert(CmsSketch.bucket(1, "k9", 64) == expect)
  }
}
