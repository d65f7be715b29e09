package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches most recent right value at or before each left row") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "tsu", "tag")
    val right = Seq((1L, 90L, 9.0), (1L, 150L, 15.0), (2L, 60L, 6.0))
      .toDF("k", "tsu", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "tsu", "v")
      .select("tag", "asof_v", "asof_ts").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("p1") === (Some(9.0), Some(90L)))    // 90 <= 100
    assert(out("p2") === (Some(15.0), Some(150L)))  // latest of 90,150
    assert(out("p3") === (None, None))              // 60 > 50: nothing before
  }

  test("equal timestamps: right row at the same instant IS matched") {
    val left = Seq((1L, 100L, "p")).toDF("k", "tsu", "tag")
    val right = Seq((1L, 100L, 5.0)).toDF("k", "tsu", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "tsu", "v")
      .select("asof_v").as[Option[Double]].head()
    assert(out === Some(5.0))
  }
}
