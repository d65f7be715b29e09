package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile emits one row per column in a single pass") {
    val df = Tables.customer(spark, sfDir)
    val p = Profile.profile(df).collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet === df.columns.toSet)
    val ck = p("c_custkey")
    assert(ck.getAs[Long]("n_rows") === 150L)
    assert(ck.getAs[Long]("n_nulls") === 0L)
    // HLL estimate of 150 distinct keys should be close
    val ad = ck.getAs[Long]("approx_distinct")
    assert(ad > 140 && ad < 160)
    assert(ck.getAs[Double]("min_or_minlen") === 0.0)
    // string column: min/max are LENGTHS
    assert(p("c_name").getAs[Double]("min_or_minlen") > 0)
  }

  test("null counting") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (2, None), (3, None)).toDF("id", "v")
    val p = Profile.profile(df).collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p("v").getAs[Long]("n_nulls") === 2L)
    assert(p("id").getAs[Long]("n_nulls") === 0L)
  }
}
