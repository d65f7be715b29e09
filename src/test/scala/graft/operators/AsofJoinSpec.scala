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

  test("asofJoinDir: directions, tolerance NULL-out, deterministic ties") {
    val left = Seq((1L, 5L, "a"), (1L, 15L, "b"), (1L, 25L, "c"))
      .toDF("k", "tsu", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "tsu", "v")
    def run(dir: String, tol: Option[Long]) =
      AsofJoin.asofJoinDir(left, right, "k", "tsu", "v", dir, tol)
        .select("tag", "asof_v", "asof_ts").collect()
        .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val back = run("backward", None)
    assert(back("a") === ((None, None)))
    assert(back("b") === ((Some(1.0), Some(10L))))
    assert(back("c") === ((Some(2.0), Some(20L))))
    val fwd = run("forward", None)
    assert(fwd("a") === ((Some(1.0), Some(10L))))
    assert(fwd("b") === ((Some(2.0), Some(20L))))
    assert(fwd("c") === ((None, None)))
    val fwdTol = run("forward", Some(4L))
    assert(fwdTol("a") === ((None, None)))  // 10 - 5 = 5 > 4 -> nulled, row kept
    assert(fwdTol("b") === ((None, None)))  // 20 - 15 = 5 > 4
    val backTol = run("backward", Some(5L))
    assert(backTol("b") === ((Some(1.0), Some(10L)))) // 15 - 10 = 5 <= 5
    // ties on (key, ts): backward takes max value, forward min value
    val tied = Seq((1L, 10L, 3.0), (1L, 10L, 7.0)).toDF("k", "tsu", "v")
    val lt = Seq((1L, 10L, "x")).toDF("k", "tsu", "tag")
    assert(AsofJoin.asofJoinDir(lt, tied, "k", "tsu", "v", "backward", None)
      .select("asof_v").as[Option[Double]].head() === Some(7.0))
    assert(AsofJoin.asofJoinDir(lt, tied, "k", "tsu", "v", "forward", None)
      .select("asof_v").as[Option[Double]].head() === Some(3.0))
  }

  test("equal timestamps: right row at the same instant IS matched") {
    val left = Seq((1L, 100L, "p")).toDF("k", "tsu", "tag")
    val right = Seq((1L, 100L, 5.0)).toDF("k", "tsu", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "tsu", "v")
      .select("asof_v").as[Option[Double]].head()
    assert(out === Some(5.0))
  }
}
