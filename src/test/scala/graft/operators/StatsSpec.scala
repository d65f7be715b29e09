package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantileDisc picks the exact rank-ceil(q*n) value per group") {
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("g", "v")
    val row = Stats.quantileDisc(df, Seq("g"), "v", Seq(0.5, 0.9)).head()
    assert(row.getAs[Double]("p50") === 5.0)
    // 0.9*10 rounds to exactly 9.0 in IEEE doubles -> ceil 9; any engine
    // computing the same double product agrees, which is the portability
    // contract of quantileDisc
    assert(row.getAs[Double]("p90") === 9.0)
    assert(row.getAs[Long]("n") === 10L)
    assert(row.getAs[Double]("min_v") === 1.0)
    assert(row.getAs[Double]("max_v") === 10.0)
  }

  test("saltedAgg matches direct groupBy exactly") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else "k" + (i % 7), i.toLong))
      .toDF("k", "v")
    val salted = Stats.saltedAgg(df, "k", pmod(col("v"), lit(8)), 8,
        Seq("sum_v" -> col("v")))
      .as[(String, Long, Long)].collect().toSet
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === direct)
  }
}
