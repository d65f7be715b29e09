package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", 10, 100L), (1L, "b", 30, 200L), (1L, "c", 30, 150L),
    (2L, "d", 5, 50L), (3L, "e", 7, 70L), (3L, "f", 7, 70L)
  ).toDF("k", "tag", "v", "ts")

  test("distinctOn keeps exactly one row per key, by order + tie-break") {
    val out = Relational.distinctOn(df, Seq("k"), Seq(col("v").desc, col("tag")))
      .select("k", "tag").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "b", 2L -> "d", 3L -> "e"))
  }

  test("topKPerGroup returns k rows with ranks") {
    val out = Relational.topKPerGroup(df, Seq("k"), Seq(col("v").desc, col("tag")), 2)
    assert(out.where(col("k") === 1).count() === 2)
    assert(out.where(col("k") === 2).count() === 1)
    assert(out.columns.contains("rank_in_group"))
  }

  test("antiJoinOnKey excludes keys present in the exclusion set") {
    val excl = Seq(1L).toDF("k")
    val out = Relational.antiJoinOnKey(df, excl, "k").select("k").distinct()
      .as[Long].collect().toSet
    assert(out === Set(2L, 3L))
  }

  test("unionDedup unions slices then dedups per key") {
    val out = Relational.unionDedup(
      Seq(df.where(col("v") > 5), df.where(col("v") <= 5)),
      Seq("k"), Seq(col("ts").desc, col("tag")))
    assert(out.count() === 3)
  }

  test("scd2Apply: no-op updates dropped, changes close versions, new keys open") {
    val open = Seq((1L, "gold", 100L), (2L, "basic", 50L))
      .toDF("cust", "tier", "ts")
    val changes = Seq(
      (1L, "gold", 150L),   // no-op: same tier as the open row
      (1L, "plat", 200L),   // real change
      (1L, "plat", 250L),   // no-op after the change
      (2L, "silver", 120L), // real change
      (3L, "new", 60L))     // brand-new key
      .toDF("cust", "tier", "ts")
    val out = Relational.scd2Apply(open, changes, Seq("cust"), Seq("tier"), "ts")
      .select("cust", "tier", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out === Set(
      (1L, "gold", 100L, Some(200L)),
      (1L, "plat", 200L, None),
      (2L, "basic", 50L, Some(120L)),
      (2L, "silver", 120L, None),
      (3L, "new", 60L, None)))
  }

  test("topKPerGroup refuses an input that already carries rank_in_group") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, 9L)).toDF("k", "v", "rank_in_group")
    val e = intercept[IllegalArgumentException] {
      Relational.topKPerGroup(df, Seq("k"), Seq(col("v")), 1)
    }
    assert(e.getMessage.contains("rank_in_group"))
  }
}
