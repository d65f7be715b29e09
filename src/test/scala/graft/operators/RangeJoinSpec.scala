package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("grid radius join == brute-force cartesian radius join") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    val a = pts.toDF("a_id", "ax", "ay")
    val b = pts.toDF("b_id", "bx", "by")
    val r = 3.0

    val grid = RangeJoin.radiusJoin(a, b, "ax", "ay", "bx", "by", r)
      .where(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val brute = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts
      if i != j && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= r * r
    } yield (i, j)).toSet

    assert(grid === brute)
  }

  test("neighbor-cell explosion never duplicates a pair") {
    val a = Seq((1L, 2.5, 2.5)).toDF("a_id", "ax", "ay")
    val b = Seq((2L, 2.6, 2.6)).toDF("b_id", "bx", "by")
    assert(RangeJoin.radiusJoin(a, b, "ax", "ay", "bx", "by", 5.0).count() === 1)
  }
}
